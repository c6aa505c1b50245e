package graft

/** Child-process entry for one scaling measurement: a fresh JVM per
  * parallelism level so GC/heap state cannot leak between the two runs of
  * the N-vs-4N pair (observed: second-session runs in a shared JVM vary
  * 2-3x from heap bloat). Prints exactly one line:
  *   BENCHONE <cpus> <bestSeconds> <turns> <triples>
  *
  * Modes (arg 5, default "pipe"):
  *   pipe — full KG-construction pipeline on the fixture
  *   scan — transcript scan + decode + length aggregation only: measures
  *          the I/O + decompression ceiling of this box, i.e. the upper
  *          bound any scan-dominated job can scale to. The pipeline's
  *          scaling efficiency is judged against THIS, not against an
  *          ideal 4x that single-box memory bandwidth cannot deliver.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val fixtureDir = args(1)
    val warmDir = args(2)
    val reps = if (args.length > 3) args(3).toInt else 3
    val mode = if (args.length > 4) args(4) else "pipe"
    val spark = Bench.session(cpus)
    mode match {
      case "scan" =>
        import org.apache.spark.sql.functions._
        def scanOnce(dir: String): (Double, Long) = {
          val t0 = System.nanoTime()
          val r = spark.read.parquet(s"$dir/transcripts")
            .agg(count(lit(1)), sum(length(col("text")))).head()
          ((System.nanoTime() - t0) / 1e9, r.getLong(0))
        }
        scanOnce(warmDir) // JIT warmup
        val best = (1 to reps).map(_ => scanOnce(fixtureDir)).minBy(_._1)
        println(s"BENCHONE $cpus ${best._1} ${best._2} 0")
      case _ =>
        Bench.runPipeline(spark, warmDir) // JIT/codegen warmup
        val best = (1 to reps).map(_ => Bench.runPipeline(spark, fixtureDir))
          .minBy(_.seconds)
        println(s"BENCHONE $cpus ${best.seconds} ${best.turns} ${best.triples}")
    }
    spark.stop()
  }
}
