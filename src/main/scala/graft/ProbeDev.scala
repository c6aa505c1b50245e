package graft

/** Dev tool: dissect the skewed candidate-join probe (salt on/off) with
  * stage metrics. Not part of the driver contract. */
object ProbeDev {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    val nDocs = args.headOption.map(_.toLong).getOrElse(40000L)
    val nQ = if (args.length > 1) args(1).toLong else 2000L
    val posting = spark.range(nDocs).select(
      col("id").cast("string").as("class_id"),
      explode(array(
        when(pmod(col("id"), lit(2L)) === 0L, lit("hot"))
          .otherwise(concat(lit("c"), pmod(col("id"), lit(97L)))),
        concat(lit("t"), pmod(col("id"), lit(997L))))).as("token"))
    val q = spark.range(nQ).select(
      col("id").cast("string").as("query_id"),
      explode(array(
        lit("hot"),
        concat(lit("t"), pmod(col("id"), lit(997L))))).as("token"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    def arm(buckets: Int): Unit = {
      val t0 = System.nanoTime()
      val n = graft.operators.index.idfCandidates(q, posting, nDocs, 10,
        saltBuckets = buckets,
        widthHint = spark.sparkContext.defaultParallelism).count()
      println(f"[probe] buckets=$buckets sec=${(System.nanoTime() - t0) / 1e9}%.2f rows=$n")
    }
    arm(1); arm(8); arm(1); arm(8)
    spark.stop()
  }
}
