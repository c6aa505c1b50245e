package graft.plans

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.{fixtures, tables}

/**
 * spark-submit entrypoint: the full KG-construction job with stage
 * materialization + manifest-based resume + metrics accumulators — the
 * north_rule's "resumes idempotently from checkpoint with per-partition
 * lineage" contract (the reference memoizes by bare file existence,
 * run_bertmap.py:62-67; we fingerprint stage inputs).
 *
 *   spark-submit --class graft.plans.Main graft.jar \
 *     <transcriptsPath|fixture:N> <catalogDir|fixture> <workDir>
 *
 * Stages (each a lineage.stage — skipped when its manifest matches):
 *   mentions → mappings → triples
 * Re-running with the same inputs reuses every stage; deleting a stage dir
 * (or changing an upstream input) rebuilds from that point only.
 */
object Main {

  def main(args: Array[String]): Unit = {
    val transcriptsArg = args.lift(0).getOrElse("fixture:2000")
    val catalogArg = args.lift(1).getOrElse("fixture")
    val workDir = args.lift(2).getOrElse("/tmp/graft-work")

    val preexisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val builder0 = SparkSession.builder().appName("graft-kg-construct")
    // spark-submit injects spark.master; standalone sbt runs default local
    val spark = (if (sys.props.contains("spark.master") || preexisting.nonEmpty) builder0
      else builder0.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // execution memory off-heap: on-heap sort/window pages are live
      // young-gen data copied on every GC — measured multi-second young
      // pauses and 3x wall at transcript scale (BENCH/BASELINE.md)
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size",
        sys.env.getOrElse("SPARK_GRAFT_OFFHEAP", "8g"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // --- inputs ------------------------------------------------------------
    val (turns, classes, edges, inputFp) = transcriptsArg match {
      case s if s.startsWith("fixture:") =>
        val n = s.stripPrefix("fixture:").toInt
        val cfg = fixtures.tiny.copy(nConvs = n)
        (fixtures.transcripts(spark, cfg), fixtures.classes(spark, cfg),
          fixtures.edges(spark, cfg), s"fixture:$n:seed=${cfg.seed}")
      case path =>
        val t = tables.readTranscripts(spark, path).as[Turn]
        val c = spark.read.parquet(s"$catalogArg/classes").as[ClassText]
        val e = spark.read.parquet(s"$catalogArg/edges").as[Edge]
        (t, c, e, s"$path|$catalogArg")
    }

    // turns-processed metric via CollectMetrics (df.observe): rides the
    // existing scan for free. The previous typed .map accumulator was a
    // deserialize-everything barrier below mention-detect's 3-column
    // projection — it decoded all 6 transcript columns at 10^12-turn scale
    // and multi-counted on Dataset reuse. PlanCheck pins the pruning.
    val turnMetrics = Observation("graft_turns")
    val observedTurns = turns.observe(turnMetrics, count(lit(1)).as("turns"))

    // --- staged run ---------------------------------------------------------
    val params = Pipeline.Params()
    val paramsFp = params.toString

    val mappings = lineage.stage(spark, workDir, "mappings", inputFp + paramsFp) {
      val srcLabels = Pipeline.sideLabels(classes, "src").cache()
      val tgtLabels = Pipeline.sideLabels(classes, "tgt").cache()
      graft.operators.align.atThreshold(
        Pipeline.rawMappings(spark, srcLabels, tgtLabels, params), params.threshold)
    }

    // the materialized mappings stage feeds the triples stage directly —
    // a cold run executes the alignment chain exactly once, and a resumed
    // run (matching triples manifest) executes it zero times
    var triplesRebuilt = false
    val triples = lineage.stage(spark, workDir, "triples", inputFp + paramsFp) {
      triplesRebuilt = true
      val (_, trip) = Pipeline.run(spark, observedTurns, classes, edges, params,
        precomputedRaw = Some(mappings))
      trip
    }

    tables.writeTriples(triples, s"$workDir/graph")
    // the observed metric exists only when the triples stage actually
    // scanned the transcripts this run; a resumed run scans nothing
    val turnsSeen: Long =
      if (triplesRebuilt) turnMetrics.get("turns").asInstanceOf[Long] else 0L
    val predCounts = spark.read.parquet(s"$workDir/graph")
      .groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val byPred = predCounts.map { case (p, n) => s"$p=$n" }.mkString(", ")
    val nMappings = mappings.count()
    println(s"[graft] mappings=$nMappings triples by pred: $byPred; " +
      s"turns seen (observed)=$turnsSeen resumed=${!triplesRebuilt}")
    // run metrics alongside the stage manifests (north_rule: resumable with
    // per-partition lineage + metrics)
    val metricsJson = predCounts.map { case (p, n) => s""""$p":$n""" }
      .mkString(
        s"""{"mappings":$nMappings,"turns_seen":$turnsSeen,"resumed":${!triplesRebuilt},"triples":{""",
        ",", "}}")
    // through the Hadoop FS API like the manifests: a hdfs:///s3a:// workDir
    // gets the metrics on the cluster store, not the driver's local disk
    lineage.writeText(spark, workDir, "metrics.json", metricsJson)
    if (preexisting.isEmpty) spark.stop() // under spark-submit we own it
  }
}
