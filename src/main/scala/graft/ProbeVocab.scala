package graft

import graft.operators.vocab

/** Dev probe: BPE vocab induction at a realistic merge count over the
  * sf0.1 documents histogram — evidences that the guarded driver-local
  * merge loop makes reference-scale vocabularies (1k+ merges) a
  * seconds-scale operation instead of one Spark job per merge.
  * Usage: runMain graft.ProbeVocab [nMerges] [sfDir] */
object ProbeVocab {
  def main(args: Array[String]): Unit = {
    val nMerges = args.headOption.getOrElse("1000").toInt
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val hist = vocab.wordHistogram(docs, "text").cache()
    val nWords = hist.count()
    val tHist = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val merges = vocab.learnMerges(spark, hist, nMerges)
    val nM = merges.count()
    val tMerge = (System.nanoTime() - t1) / 1e9
    println(f"[vocabprobe] hist_words=$nWords hist_sec=$tHist%.2f " +
      f"merges=$nM merge_sec=$tMerge%.2f")
    // the sf tables have a tiny synthetic alphabet (the loop exhausts
    // early); a seeded 100k-distinct-word histogram exercises the full
    // merge count at realistic vocabulary diversity
    import org.apache.spark.sql.functions._
    // syllable-structured words (natural-language-like pair statistics —
    // random character soup exhausts minCount after ~200 merges)
    val syl = array((for (c <- "bcdfghjklmnpqrstvwz"; v <- "aeiou")
      yield lit(s"$c$v")): _*)
    val synth = spark.range(100000L).select(
      concat_ws("", (0 until 4).map(i =>
        element_at(syl,
          (pmod(col("id") * (i * 2654435761L + 7) + 13 * i, lit(95L)) + 1).cast("int"))): _*)
        .as("word"),
      (pmod(col("id") * 48271L, lit(1000L)) + 1L).as("cnt"))
    val t2 = System.nanoTime()
    val m2 = vocab.learnMerges(spark, synth, nMerges)
    val nM2 = m2.count()
    val tMerge2 = (System.nanoTime() - t2) / 1e9
    println(f"[vocabprobe] synth_words=100000 merges=$nM2 merge_sec=$tMerge2%.2f")
    spark.stop()
  }
}
