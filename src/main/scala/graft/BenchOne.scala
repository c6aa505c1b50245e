package graft

/** Child-process entry for one scaling measurement: a fresh JVM per
  * parallelism level so GC/heap state cannot leak between the two runs of
  * the N-vs-4N pair (observed: second-session runs in a shared JVM vary
  * 2-3x from heap bloat). Prints exactly one line:
  *   BENCHONE <cpus> <bestSeconds> <turns> <triples>
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val fixtureDir = args(1)
    val warmDir = args(2)
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = Bench.session(cpus)
    Bench.runPipeline(spark, warmDir) // JIT/codegen warmup
    val best = (1 to reps).map(_ => Bench.runPipeline(spark, fixtureDir))
      .minBy(_.seconds)
    println(s"BENCHONE $cpus ${best.seconds} ${best.turns} ${best.triples}")
    spark.stop()
  }
}
