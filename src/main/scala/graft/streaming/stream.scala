package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.mentions

/**
 * Streaming ingest (graft addition — the reference is pure batch,
 * SURVEY.md §2.11): mention detection is per-turn-local, so it lifts to
 * Structured Streaming unchanged — readStream → the same broadcast-trie
 * mapPartitions kernel → append sink. The candidate join / extension /
 * repair stages are deliberately NOT streamed (cross-catalog global state;
 * they run batch over the accumulated mention table).
 *
 * Also provides the event-time windowed mention-rate aggregation with a
 * watermark — late turns beyond the watermark are dropped, matching the
 * at-most-once-per-turn mention contract.
 */
object stream {

  /** Streaming mention detection: same kernel, streaming Dataset in/out. */
  def detectStream(spark: SparkSession, turns: Dataset[Turn],
                   classes: Seq[ClassText]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(mentions.surfaceDict(classes))
    turns.mapPartitions { it =>
      val trie = mentions.buildTrie(bc.value)
      it.flatMap { t =>
        mentions.detectInTrie(trie, mentions.fastTokens(t.text)).map {
          case (onto, iri, surface) =>
            (t.conv_id, t.turn_idx, onto, iri, surface, t.ts)
        }
      }
    }.toDF("conv_id", "turn_idx", "onto", "class_iri", "surface", "ts")
  }

  /** Windowed mention rate: 10-minute tumbling windows per entity with a
    * 30-minute watermark for late data. */
  def mentionRate(mentionsWithTs: DataFrame): DataFrame =
    mentionsWithTs
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("class_iri"))
      .agg(count(lit(1)).as("n_mentions"))
      .select(col("window.start").as("window_start"), col("class_iri"),
        col("n_mentions"))
}
