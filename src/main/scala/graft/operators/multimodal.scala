package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata; decode / feature-extract run as
 * *batched* partition-local functions (the Scala analogue of mapInPandas —
 * Iterator-of-batches in, Iterator-of-batches out), so a real codec drops
 * into `decodeStub` without touching the plan.
 *
 * The actual media codecs are unavailable in this environment, so the
 * decode step is a clearly-marked deterministic fake: it derives a fixed
 * "feature vector" from the payload bytes. The Spark-side contract —
 * schema, partitioning, batch shape — is real and tested.
 */
object multimodal {

  /** Pure-relational metadata extraction over a binary payload column —
    * stays in whole-stage codegen. */
  def mediaMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("payload_md5"),
      pmod(length(col(payloadCol)).cast("long"), lit(251L)).as("shard"))

  /** DETERMINISTIC FAKE DECODER — stands in for an image/audio codec.
    * Emits `dim` pseudo-features from byte statistics of the payload. */
  def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / (payload.length.toFloat / dim); j += 1 }
    out
  }

  /**
   * Batched decode: (id, payload: binary) → (id, n_bytes, features:
   * array<float>). Batches of `batchSize` rows per kernel invocation —
   * the shape a vectorized (Arrow) UDF would see.
   */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     payloadCol: String, dim: Int = 16,
                     batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "kernel call" per batch: decode all payloads together
        val decoded = batch.map { r =>
          val p = r.getAs[Array[Byte]](pIdx)
          (r.get(idIdx), if (p == null) 0L else p.length.toLong, fakeDecode(p, dim))
        }
        decoded.iterator.map { case (id, n, f) => Row(id, n, f.toSeq) }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
