package graft

/** Dev microbenchmark: per-task and per-job scheduling overhead. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val spark = Bench.session(cpus)
    val sc = spark.sparkContext
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[micro:$cpus] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warm
    sc.parallelize(1 to 1000, 10).count()
    time("100 jobs x 1 empty task") {
      (1 to 100).foreach(_ => sc.parallelize(1 to 1, 1).count())
    }
    time("10 jobs x 32 empty tasks") {
      (1 to 10).foreach(_ => sc.parallelize(1 to 32, 32).count())
    }
    time("10 jobs x 256 empty tasks") {
      (1 to 10).foreach(_ => sc.parallelize(1 to 256, 256).count())
    }
    time("1 job, 3200 empty tasks") {
      sc.parallelize(1 to 3200, 3200).count()
    }
    val df = spark.range(100000).toDF("id")
    time("10 tiny SQL shuffles (groupBy)") {
      (1 to 10).foreach(_ => df.groupBy(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(97))).count().count())
    }
    time("10 localCheckpoints of tiny df") {
      (1 to 10).foreach(_ => df.limit(1000).localCheckpoint(true))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("10 tiny SQL shuffles, AQE off") {
      (1 to 10).foreach(_ => df.groupBy(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(97))).count().count())
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("10 tiny SQL shuffles, 4 parts") {
      (1 to 10).foreach(_ => df.groupBy(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(97))).count().count())
    }
    spark.stop()
  }
}
