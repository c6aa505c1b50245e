package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (array<float>) — approximate
 * nearest neighbors for training-data pipelines.
 *
 * Baseline: brute-force cosine top-k (query-side bounded; candidate side
 * scanned once, the dot product stays inside whole-stage codegen via
 * higher-order functions — no UDF).
 * Scale path: IVF — a small centroid table is broadcast, every vector is
 * assigned to its nearest centroid once (one pass), and a query probes only
 * the `nProbe` nearest cells, turning the O(Q×N) scan into O(Q×N×nProbe/C).
 */
object similarity {

  /** Cast array<float> → array<double> so arithmetic is float64 end-to-end
    * (matches DuckDB's DOUBLE[] oracle bit-for-bit under sequential folds). */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product via zip_with + aggregate (codegen'd). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest
   * candidates. `queries`/`candidates` must carry (idCol, vecCol).
   * The query side is broadcast (callers bound it); ties broken on
   * candidate id ascending for determinism.
   */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), toDoubleArray(col(vecCol)).as("cv"))
    val joined = broadcast(q).crossJoin(c)
      .filter(if (excludeSelf) col("query_id") =!= col("cand_id") else lit(true))
      .withColumn("cosine", cosineCol(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cosine", "rank")
  }

  /** Assign each vector to its nearest centroid (IVF cell). `centroids`
    * must be small — it is broadcast. Returns input + (cell). */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
    val cen = centroids.select(col("cell"), toDoubleArray(col("cvec")).as("cv"))
    val w = Window.partitionBy("id").orderBy(col("sim").desc, col("cell").asc)
    v.crossJoin(broadcast(cen))
      .withColumn("sim", cosineCol(col("v"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("id", "v", "cell")
  }

  /**
   * IVF top-k: probe the `nProbe` nearest cells per query, brute-force only
   * inside them. Deterministic "training-free" centroids: callers pass any
   * deterministic centroid table (e.g., every Cth vector by id) — at 100 TB
   * this would be a k-means fit on a sample, which only changes the
   * centroid table, not this plan.
   */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val assigned = assignCells(candidates, centroids, idCol, vecCol)
    val cen = centroids.select(col("cell"), toDoubleArray(col("cvec")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell").asc)
    val probes = broadcast(q).crossJoin(broadcast(cen))
      .withColumn("csim", cosineCol(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nProbe)
      .select("query_id", "qv", "cell")
    val wTop = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id").asc)
    probes.join(assigned, "cell")
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", cosineCol(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("cand_id"), col("cosine"), col("rank"))
  }
}
