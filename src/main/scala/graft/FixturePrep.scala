package graft

/** Dev tool: materialize the bench fixture at a given size.
  * Usage: runMain graft.FixturePrep <nConvs> <dir> */
object FixturePrep {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val dir = args(1)
    val spark = Bench.session(16)
    Bench.writeFixture(spark, n, dir)
    spark.stop()
    new ProcessBuilder("sync").start().waitFor()
  }
}
