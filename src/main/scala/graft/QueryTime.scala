package graft

/** Dev tool: time one named SparkEntry query N times in this JVM.
  *   runMain graft.QueryTime <queryName> [sfDir] [reps]
  * Uses Bench.session (same config as the battery) so numbers are
  * comparable with BENCH_r*.json entries; adjacent reps give a noise
  * bracket (see BENCH/BASELINE.md: only adjacent samples are comparable).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = Bench.session(cpus)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[qtime] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
