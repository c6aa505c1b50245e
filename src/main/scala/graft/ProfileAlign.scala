package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.plans.Pipeline

/** Dev profiling: the catalog-side alignment chain alone, repeated.
  * Usage: runMain graft.ProfileAlign <cpus> <dir> <reps> */
object ProfileAlign {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val dir = args.lift(1).getOrElse("/tmp/graft-bench-1200000")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Bench.session(cpus)
    import spark.implicits._
    val classes = spark.read.parquet(s"$dir/classes").as[ClassText]
    val p = Pipeline.Params()
    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val srcLabels = Pipeline.sideLabels(classes, "src").cache()
      val tgtLabels = Pipeline.sideLabels(classes, "tgt").cache()
      val raw = graft.operators.align.atThreshold(
        Pipeline.rawMappings(spark, srcLabels, tgtLabels, p), p.threshold)
        .localCheckpoint(true)
      val n = raw.count()
      println(f"[align:$cpus] rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      srcLabels.unpersist(); tgtLabels.unpersist()
    }
    spark.stop()
  }
}
