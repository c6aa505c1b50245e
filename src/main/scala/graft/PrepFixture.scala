package graft

/** Dev helper: write a bench fixture of N convs to a directory. */
object PrepFixture {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(args.lift(2).map(_.toInt).getOrElse(32))
    Bench.writeFixture(spark, args(0).toInt, args(1))
    spark.stop()
  }
}
