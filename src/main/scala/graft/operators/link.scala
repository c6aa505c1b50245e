package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.text

/**
 * Fuzzy surface linking: surfaces that the exact-match trie could not
 * resolve (typos, morphological variants, re-orderings) are linked to
 * catalog entities through the same machinery as cross-catalog alignment —
 * sub-word inverted index → summed-IDF candidates → lexical scorer →
 * n-best + threshold.
 *
 * Scale shape (10^12 turns): the raw mention stream is first collapsed to
 * DISTINCT surfaces (hot surface forms — the north_star's skew source —
 * reduce to one query row each, so their fan-out moves from the join to a
 * pre-aggregation that AQE handles), then the token join runs with the
 * optional salt for hot *tokens* shared by many surfaces.
 */
object link {

  /**
   * @param surfaces (surface: string) — typically
   *                 mentionsStream.select("surface").distinct()
   * @param labels   (id, label) normalized catalog labels
   * @return (surface, id, score) — best link per surface at `threshold`
   */
  def surfaceLink(spark: SparkSession, surfaces: DataFrame, labels: DataFrame,
                  candidateLimit: Int = 10, nbest: Int = 1,
                  threshold: Double = 0.5, maxDfFrac: Double = 1.0,
                  saltBuckets: Int = 1,
                  params: score.ScorerParams = score.ScorerParams()): DataFrame = {
    val distinctSurfaces = surfaces
      .select(text.normalizeCol(col("surface")).as("surface")).distinct()

    val posting = labels
      .select(col("id").as("class_id"), explode(text.wordTokensCol(col("label"))).as("token"))
      .distinct()
    val d = labels.select("id").distinct().count()
    val qTokens = distinctSurfaces
      .select(col("surface").as("query_id"), explode(text.wordTokensCol(col("surface"))).as("token"))
      .distinct()

    val cands = index.idfCandidates(qTokens, posting, d, candidateLimit,
        maxDfFrac, saltBuckets)
      .select(col("query_id").as("from_id"), col("class_id").as("to_id"))

    val pairs = cands
      .withColumn("l1", col("from_id")) // the surface IS its own label
      .join(labels.select(col("id").as("to_id"), col("label").as("l2")), "to_id")
      .select("from_id", "to_id", "l1", "l2")

    val pooled = score.pool(score.scoreLabelPairsTyped(spark, pairs, params), "max")
    align.nBest(pooled, nbest)
      .filter(col("score") >= threshold)
      .select(col("from_id").as("surface"), col("to_id").as("id"), col("score"))
  }
}
