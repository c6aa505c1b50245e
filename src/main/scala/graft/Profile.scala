package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.operators._
import graft.plans.Pipeline

/** Dev profiling: serial per-phase wall clock (no overlap, so attribution
  * is unambiguous). Run at two core counts to find anti-scaling phases. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val dir = args.lift(1).getOrElse("/tmp/graft-bench-800000")
    val spark = Bench.session(cpus)
    import spark.implicits._
    Bench.runPipeline(spark, "/tmp/graft-bench-warm") // warmup

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile:$cpus] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val turns = spark.read.parquet(s"$dir/transcripts").as[Turn]
    val classes = spark.read.parquet(s"$dir/classes").as[ClassText]
    val edges = spark.read.parquet(s"$dir/edges").as[Edge]
    val p = Pipeline.Params()

    val dict = time("collect dict")(classes.filter(col("onto") === "src").collect().toSeq)
    val mens = time("detect+cache+count") {
      val m = mentions.detect(spark, turns, dict).toDF().cache(); m.count(); m
    }
    val srcLabels = Pipeline.sideLabels(classes, "src").cache()
    val tgtLabels = Pipeline.sideLabels(classes, "tgt").cache()
    val raw = time("rawMappings+threshold") {
      align.atThreshold(Pipeline.rawMappings(spark, srcLabels, tgtLabels, p), p.threshold)
        .localCheckpoint(true)
    }
    val srcEdges = edges.toDF().filter(col("onto") === "src").select("child_iri", "parent_iri").cache()
    val tgtEdges = edges.toDF().filter(col("onto") === "tgt").select("child_iri", "parent_iri").cache()
    val expansion = time("extend")(
      extend.extendMappings(spark, raw, srcEdges, tgtEdges, srcLabels, tgtLabels,
        p.kappa, p.maxExtendIter, p.scorer))
    val extended = time("extended ckpt")(
      raw.unionByName(expansion).groupBy("entity1", "entity2")
        .agg(max(col("value")).as("value")).localCheckpoint(true))
    val repaired = time("repair ckpt")(
      repair.repairMappings(extended, srcEdges, tgtEdges).localCheckpoint(true))
    val comps = canonical.matchingComponents(repaired)
    val mensCanon = mens
      .join(broadcast(comps.select(col("id").as("class_iri"), col("canonical"))),
        Seq("class_iri"), "left")
      .select(col("conv_id"), col("turn_idx"), col("onto"),
        coalesce(col("canonical"), col("class_iri")).as("class_iri"), col("surface"))
    val broaderCanon = srcEdges.unionByName(tgtEdges)
      .join(broadcast(comps.select(col("id").as("child_iri"), col("canonical").as("cc"))), Seq("child_iri"), "left")
      .join(broadcast(comps.select(col("id").as("parent_iri"), col("canonical").as("cp"))), Seq("parent_iri"), "left")
      .select(coalesce(col("cc"), col("child_iri")).as("child_iri"),
        coalesce(col("cp"), col("parent_iri")).as("parent_iri"))
      .filter(col("child_iri") =!= col("parent_iri")).distinct()
    time("triples count") {
      println("triples=" + canonical.triples(repaired, mensCanon, broaderCanon).count())
    }
    spark.stop()
  }
}
