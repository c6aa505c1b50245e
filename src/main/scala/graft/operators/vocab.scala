package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.text

/**
 * WordPiece/BPE vocabulary induction over a document corpus — the
 * tokenizer-TRAINING side of a training-data pipeline (the reference
 * consumes a pretrained BERT vocab, onto_index.py:38-47; inducing one
 * from the corpus closes the loop with `text.wordpieceTokensCol`).
 *
 * Classic BPE (Sennrich et al. 2016) in WordPiece symbol notation
 * ("##"-prefixed continuations): start from characters, repeatedly merge
 * the most frequent adjacent symbol pair. The Spark shape exploits the
 * one fact that makes this scale: merges operate on the WORD HISTOGRAM,
 * not the corpus — one transcript-proportional aggregation builds
 * (word, count), and every merge round is then a small job over the
 * catalog-sized histogram (pair counting = explode + sum keyed by the
 * pair; merge application = a per-word kernel). 10^12 turns cost one
 * scan; the loop's cost depends only on vocabulary diversity.
 *
 * Deterministic by construction: integer weighted counts (associative),
 * explicit (count desc, left asc, right asc) tie-break on every argmax,
 * and the per-round histogram is stage.materialize'd so the loop's plan
 * stays flat (the q39/extension contract).
 */
object vocab {

  /** A word as its initial WordPiece symbol sequence: first char plain,
    * continuations "##"-prefixed. */
  def initSymbols(w: String): Seq[String] =
    if (w.isEmpty) Seq.empty
    else w.substring(0, 1) +: w.drop(1).map(c => "##" + c)

  /** Merge every non-overlapping adjacent (a, b) occurrence left-to-right
    * — the standard BPE application order. The merged symbol keeps a's
    * continuation status: "l"+"##o" → "lo", "##e"+"##s" → "##es". */
  def mergeAdjacent(sym: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += sym(i) + sym(i + 1).stripPrefix("##")
        i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toSeq
  }

  /** Weighted word histogram of a text column: (word, cnt). The ONLY
    * transcript-proportional job in vocab induction. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(text.wordTokensCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /**
   * Learn `nMerges` BPE merges from a word histogram. Returns
   * (merge_ord, left, right, merged, pair_count) — the merge table IS the
   * tokenizer model; `vocabFrom` turns it into the piece set
   * `text.wordpieceTokensCol` consumes. Stops early when no adjacent pair
   * occurs at least `minCount` times.
   */
  def learnMerges(spark: SparkSession, hist: DataFrame, nMerges: Int,
                  minCount: Long = 2L): DataFrame = {
    import spark.implicits._
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val toSym = udf((w: String) => initSymbols(w))
    var sym = graft.plans.stage.materialize(
      hist.select(toSym(col("word")).as("sym"), col("cnt"))
        .filter(size(col("sym")) > 0))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // weighted adjacent-pair counts over the histogram (pairs per word
      // via zip of the array with its own tail — codegen'd, no kernel)
      val best = sym
        .filter(size(col("sym")) > 1)
        .select(col("cnt"), explode(
          zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case None => exhausted = true
        case Some((a, b, n)) =>
          val merged = a + b.stripPrefix("##")
          merges += ((round + 1, a, b, merged, n))
          val applyMerge = udf((s: Seq[String]) => mergeAdjacent(s, a, b))
          sym = graft.plans.stage.materialize(
            sym.select(applyMerge(col("sym")).as("sym"), col("cnt")))
          round += 1
      }
    }
    merges.toSeq.toDF("merge_ord", "left", "right", "merged", "pair_count")
  }

  /** The piece set implied by a merge table plus the base characters of
    * the histogram — directly consumable by `text.wordpieceTokensCol`
    * (greedy longest-match over this set reproduces BPE segmentation for
    * every in-histogram word when merges were learned to convergence;
    * for partial vocabularies greedy is the standard WordPiece
    * approximation). */
  def vocabFrom(spark: SparkSession, hist: DataFrame,
                merges: DataFrame): Set[String] = {
    import spark.implicits._
    val base = hist.select(explode(
        udf((w: String) => initSymbols(w)).apply(col("word"))).as("s"))
      .distinct().as[String].collect().toSet
    val learned = merges.select(col("merged")).as[String].collect().toSet
    base ++ learned
  }
}
