package graft.plans

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model._
import graft.functions.text
import graft.operators._
import graft.sources.fixtures

/**
 * End-to-end KG-construction pipeline (the flagship lifecycle, SURVEY.md
 * §3.1 re-expressed Spark-first):
 *
 *   transcripts ──mention-detect──▶ mentions
 *   catalogs ──normalize──▶ classtexts ──explode──▶ postings ──▶ IDF cands
 *   candidates ──string-match split──▶ (1.0 pairs) ∪ (scored pairs)
 *   pooled ──n-best per side──▶ union ──▶ raw mappings
 *   raw ──greedy 1-hop extension──▶ extended ──repair──▶ final mappings
 *   final + mentions + hierarchy ──▶ (subj, pred, obj, score) triples
 *
 * Every stage is a deterministic function of the ordered input: turn order
 * is pinned by windows over (conv_id, turn_idx) wherever order matters, and
 * all tie-breaks/seeds are explicit, so output is identical at any
 * parallelism — asserted by the determinism suite.
 */
object Pipeline {

  final case class Params(
      candidateLimit: Int = 25,     // config.json:41-47 uses {25..200}
      nbest: Int = 1,               // config.json:49
      pooling: String = "max",      // mean|max (config.json uses mean; max
                                    // suits the lexical stand-in scorer,
                                    // whose off-pairs drag the mean down)
      threshold: Double = 0.5,      // mapping acceptance threshold
      kappa: Double = 0.9,          // extension threshold (extend_bertmap.py:108)
      maxExtendIter: Int = 5,       // 50 in reference; fixture DAGs are shallow
      tokenCut: Int = 0,            // onto_index cut (config.json:11)
      maxDfFrac: Double = 1.0,
      saltBuckets: Int = 1,
      scorer: score.ScorerParams = score.ScorerParams())

  /** Normalized (id, label) long form of one catalog side. */
  def sideLabels(classes: Dataset[ClassText], onto: String): DataFrame =
    classes.toDF()
      .filter(col("onto") === onto)
      .select(col("class_iri").as("id"),
        explode(text.normalizeLabelsCol(col("labels"))).as("label"))
      .distinct()

  /** One alignment direction: fix `from` side, search `to` side
    * (bert_classifier_map.py:54-88). Returns (from_id, to_id, score). */
  def alignOneSide(spark: SparkSession, fromLabels: DataFrame, toLabels: DataFrame,
                   p: Params): DataFrame = {
    val toIds = toLabels.select("id").distinct()
    val d = toIds.count()

    val posting = toLabels
      .select(col("id").as("class_id"), explode(text.wordTokensCol(col("label"))).as("token"))
      .filter(length(col("token")) > p.tokenCut).distinct()
    val qTokens = fromLabels
      .select(col("id").as("query_id"), explode(text.wordTokensCol(col("label"))).as("token"))
      .filter(length(col("token")) > p.tokenCut).distinct()

    val cands = index.idfCandidates(qTokens, posting, d, p.candidateLimit,
        p.maxDfFrac, p.saltBuckets)
      .select(col("query_id").as("from_id"), col("class_id").as("to_id"))

    val (matched, remaining) = score.stringMatchSplit(cands,
      fromLabels.select(col("id").as("from_id"), col("label")),
      toLabels.select(col("id").as("to_id"), col("label")))

    val pairs = remaining
      .join(fromLabels.select(col("id").as("from_id"), col("label").as("l1")), "from_id")
      .join(toLabels.select(col("id").as("to_id"), col("label").as("l2")), "to_id")
      .select("from_id", "to_id", "l1", "l2")
    val pooled = score.pool(score.scoreLabelPairs(spark, pairs, p.scorer), p.pooling)

    val all = matched.select("from_id", "to_id", "score")
      .unionByName(pooled.select("from_id", "to_id", "score"))
    align.nBest(score.clamp(all), p.nbest)
  }

  /** Both directions + union (onto_map.py:146). */
  def rawMappings(spark: SparkSession, srcLabels: DataFrame, tgtLabels: DataFrame,
                  p: Params): DataFrame = {
    val s2t = align.orient(alignOneSide(spark, srcLabels, tgtLabels, p), fromIsSrc = true)
    val t2s = align.orient(alignOneSide(spark, tgtLabels, srcLabels, p), fromIsSrc = false)
    align.combine(s2t, t2s)
  }

  /** Full run over in-memory inputs; returns (mappings, triples). */
  def run(spark: SparkSession, turns: Dataset[Turn], classes: Dataset[ClassText],
          edges: Dataset[Edge], p: Params = Params()): (DataFrame, DataFrame) = {
    val srcLabels = sideLabels(classes, "src")
    val tgtLabels = sideLabels(classes, "tgt")

    val raw = align.atThreshold(rawMappings(spark, srcLabels, tgtLabels, p), p.threshold)
      .localCheckpoint(true)

    val srcEdges = edges.toDF().filter(col("onto") === "src").select("child_iri", "parent_iri")
    val tgtEdges = edges.toDF().filter(col("onto") === "tgt").select("child_iri", "parent_iri")

    val expansion = extend.extendMappings(spark, raw, srcEdges, tgtEdges,
      srcLabels, tgtLabels, p.kappa, p.maxExtendIter, p.scorer)
    val extended = raw.unionByName(expansion)
      .groupBy("entity1", "entity2").agg(max(col("value")).as("value"))

    val repaired = repair.repairMappings(extended, srcEdges, tgtEdges)

    val mens = mentions.detect(spark, turns,
      classes.filter(col("onto") === "src").collect().toSeq)

    val comps = canonical.connectedComponents(spark, repaired)
    val canon = canonical.canonicalize(repaired, comps)
      .groupBy("entity1", "entity2").agg(max(col("value")).as("value"))

    val trip = canonical.triples(canon, mens.toDF(),
      srcEdges.unionByName(tgtEdges))
    (repaired, trip)
  }

  /** Tiny flagship for the driver smoke-check (rows>0 at sf0.001-ish scale). */
  def flagship(spark: SparkSession): DataFrame = {
    val cfg = fixtures.tiny
    val (_, trip) = run(spark,
      fixtures.transcripts(spark, cfg),
      fixtures.classes(spark, cfg),
      fixtures.edges(spark, cfg))
    trip
  }
}
