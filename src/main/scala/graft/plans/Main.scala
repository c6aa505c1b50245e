package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
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
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // metrics accumulators (replaces the reference's log_print side channel,
    // general_utils.py:82-88)
    val turnsSeen: LongAccumulator = spark.sparkContext.longAccumulator("graft.turns")

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

    val counted = turns.map { t => turnsSeen.add(1); t }

    // --- staged run ---------------------------------------------------------
    val params = Pipeline.Params()
    val paramsFp = params.toString

    val mappings = lineage.stage(spark, workDir, "mappings", inputFp + paramsFp) {
      val srcLabels = Pipeline.sideLabels(classes, "src").cache()
      val tgtLabels = Pipeline.sideLabels(classes, "tgt").cache()
      graft.operators.align.atThreshold(
        Pipeline.rawMappings(spark, srcLabels, tgtLabels, params), params.threshold)
    }

    val triples = lineage.stage(spark, workDir, "triples", inputFp + paramsFp) {
      val (_, trip) = Pipeline.run(spark, counted, classes, edges, params)
      trip
    }

    tables.writeTriples(triples, s"$workDir/graph")
    val predCounts = spark.read.parquet(s"$workDir/graph")
      .groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val byPred = predCounts.map { case (p, n) => s"$p=$n" }.mkString(", ")
    println(s"[graft] mappings=${mappings.count()} triples by pred: $byPred; " +
      s"turns seen (accumulator)=${turnsSeen.value}")
    // run metrics alongside the stage manifests (north_rule: resumable with
    // per-partition lineage + metrics)
    val metricsJson = predCounts.map { case (p, n) => s""""$p":$n""" }
      .mkString(
        s"""{"mappings":${mappings.count()},"turns_seen":${turnsSeen.value},"triples":{""",
        ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$workDir/metrics.json"),
      metricsJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (preexisting.isEmpty) spark.stop() // under spark-submit we own it
  }
}
