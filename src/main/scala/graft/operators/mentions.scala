package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.functions.text

/**
 * Mention detection: link turn text to catalog entities by surface form.
 *
 * Stand-in for the north_star's "batched BERT-style mention detection":
 * a dictionary matcher over word n-grams, executed as a *batched*
 * mapPartitions hop with the surface-form dictionary shipped via
 * SparkContext.broadcast — the identical physical contract (broadcast
 * weights/vocab + per-partition batching) a neural tagger would use; only
 * the kernel differs. Per-conversation ordering is preserved because
 * detection is per-row (conv_id, turn_idx are carried through untouched).
 */
object mentions {

  /** Build the broadcastable dictionary: normalized surface form →
    * (onto, class_iri). Multiple entities may share a surface; all match. */
  def surfaceDict(classes: Seq[ClassText]): Map[String, Seq[(String, String)]] =
    classes
      .flatMap(c => text.normalizeLabels(c.labels).map(l => (l, (c.onto, c.class_iri))))
      .groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).distinct) }

  /** Detect mentions with longest-match-first n-gram scan (n ≤ maxWords). */
  def detectInText(dict: Map[String, Seq[(String, String)]], maxWords: Int,
                   txt: String): Seq[(String, String, String)] = {
    val toks = text.wordTokens(txt)
    val out = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    var i = 0
    while (i < toks.length) {
      var matched = 0
      var n = math.min(maxWords, toks.length - i)
      while (n >= 1 && matched == 0) {
        val cand = toks.slice(i, i + n).mkString(" ")
        dict.get(cand) match {
          case Some(ents) =>
            ents.foreach { case (onto, iriStr) => out += ((onto, iriStr, cand)) }
            matched = n
          case None => ()
        }
        n -= 1
      }
      i += math.max(1, matched)
    }
    out.distinct.toSeq
  }

  /** Transcripts → mentions. Batched mapPartitions with broadcast dict. */
  def detect(spark: SparkSession, turns: Dataset[Turn],
             classes: Seq[ClassText], maxWords: Int = 4): Dataset[Mention] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(surfaceDict(classes))
    turns.mapPartitions { it =>
      val dict = bc.value
      it.flatMap { t =>
        detectInText(dict, maxWords, t.text).map { case (onto, iriStr, surface) =>
          Mention(t.conv_id, t.turn_idx, onto, iriStr, surface)
        }
      }
    }
  }
}
