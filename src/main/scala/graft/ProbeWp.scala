package graft

import org.apache.spark.sql.functions._
import graft.operators.{evalmod, vocab}
import graft.plans.Pipeline
import graft.sources.fixtures

/** Dev probe: flagship quality + triple digest when the index runs on a
  * REAL induced WordPiece vocab (vocab.vocabFrom over the catalog-label
  * histogram), at several merge counts — used to pick/pin the q61
  * constants. Usage: runMain graft.ProbeWp [nMerges ...] */
object ProbeWp {
  def main(args: Array[String]): Unit = {
    val mergeCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(30, 100, 400)
    val spark = Bench.session(8)
    val cfg = fixtures.tiny
    val turns = fixtures.transcripts(spark, cfg)
    val classes = fixtures.classes(spark, cfg)
    val edges = fixtures.edges(spark, cfg)
    val refs = fixtures.refMappings(spark, cfg)

    val labelWords = classes.toDF()
      .select(explode(graft.functions.text.normalizeLabelsCol(col("labels"))).as("label"))
      .select(explode(graft.functions.text.wordTokensCol(col("label"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .cache()
    println(s"[wp] catalog label words: ${labelWords.count()}")

    for (n <- mergeCounts) {
      val merges = vocab.learnMerges(spark, labelWords, n)
      val v = vocab.vocabFrom(spark, labelWords, merges)
      println(s"[wp] nMerges=$n learned=${merges.count()} vocab=${v.size}")
      val (mappings, trip) = Pipeline.run(spark, turns, classes, edges,
        Pipeline.Params(wordpieceVocab = Some(v)))
      val ref = refs.filter(!col("is_ignored")).select("entity1", "entity2", "value")
      val ign = refs.filter(col("is_ignored")).select("entity1", "entity2", "value")
      val best = evalmod.bestByF1(evalmod.thresholdSweep(spark, mappings, ref, ign)).head()
      val rowKey = concat_ws("\u0001", col("subj"), col("pred"), col("obj"),
        round(col("score"), 6).cast("string"))
      val h = pmod(conv(substring(md5(rowKey), 1, 15), 16, 10).cast("long"),
        lit(2147483648L))
      val d = trip.agg(
        count(lit(1)).as("n_triples"),
        sum(when(col("pred") === "sameAs", 1L).otherwise(0L)).as("n_sameas"),
        sum(when(col("pred") === "mentions", 1L).otherwise(0L)).as("n_mentions"),
        sum(when(col("pred") === "broader", 1L).otherwise(0L)).as("n_broader"),
        sum(h).as("hash_sum")).head()
      println(s"[wp] nMerges=$n prf=(t=${best.getAs[Double]("threshold")}, " +
        s"n=${best.getAs[Long]("n_mappings")}, ign=${best.getAs[Long]("n_ignored")}, " +
        s"p=${best.getAs[Double]("p")}, r=${best.getAs[Double]("r")}, f1=${best.getAs[Double]("f1")}) " +
        s"digest=(${d.getLong(0)}, ${d.getLong(1)}, ${d.getLong(2)}, ${d.getLong(3)}, ${d.getLong(4)})")
    }
    spark.stop()
  }
}
