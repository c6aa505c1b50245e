package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.mentions

/** Dev profiling: detect vs stabilize cost split.
  * Usage: runMain graft.ProfileDetect <cpus> <dir> */
object ProfileDetect {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val dir = args.lift(1).getOrElse("/tmp/graft-bench-1200000")
    val spark = Bench.session(cpus)
    import spark.implicits._
    val turns = spark.read.parquet(s"$dir/transcripts").as[Turn]
    val classes = spark.read.parquet(s"$dir/classes").as[ClassText]
    val dict = classes.filter(col("onto") === "src").collect().toSeq
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pd:$cpus] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warmup
    mentions.detect(spark, turns.limit(50000), dict).count()
    val det = time("detect+cache+count") {
      val d = mentions.detect(spark, turns, dict).toDF().cache(); d.count(); d
    }
    time("stabilize from cached") {
      mentions.stabilize(det).count()
    }
    time("detect+stabilize fused") {
      mentions.stabilize(mentions.detect(spark, turns, dict).toDF()).count()
    }
    time("fused+cache+count (pipeline shape)") {
      val m = mentions.stabilize(mentions.detect(spark, turns, dict).toDF()).cache()
      m.count()
      m.unpersist()
    }
    time("fused+localCheckpoint") {
      mentions.stabilize(mentions.detect(spark, turns, dict).toDF())
        .localCheckpoint(true)
    }
    spark.stop()
  }
}
