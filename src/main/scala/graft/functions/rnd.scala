package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Content-derived pseudo-randomness for sampling operators.
 *
 * Spark's `rand(seed)` is seeded PER PARTITION and drawn in row order, so
 * repartitioning the input changes every draw — it can never satisfy the
 * BASELINE.json determinism-under-parallelism invariant. Every draw here is
 * instead a pure function of row CONTENT (+ a job seed), so the same input
 * yields the same sample at any partition count, and the arithmetic (LCG,
 * md5) has an exact DuckDB twin for oracle checking.
 */
object rnd {

  /** 2^31 modulus shared by all draws. */
  val M: Long = 2147483648L

  /** Portable seeded LCG over a bigint key: (k*1103515245 + 12345) mod 2^31.
    * Exactly the oracle-side twin used by the driver-checked queries. */
  def lcg(k: Column): Column =
    pmod(k * lit(1103515245L) + lit(12345L), lit(M))

  /** Stable 31-bit draw from arbitrary row content: md5 over the
    * "\\u0001"-joined columns, first 15 hex chars (60 bits) as the key into
    * the LCG with the job seed folded in. Works for string keys where a
    * numeric LCG key does not exist. */
  def keyed(seed: Long, cols: Column*): Column =
    lcg(pmod(conv(substring(md5(concat_ws("\u0001", cols: _*)), 1, 15), 16, 10)
      .cast("long") + lit(seed), lit(M)))

  /** Uniform double in [0, 1) from a 31-bit draw column. */
  def uniform01(draw: Column): Column = draw / lit(M.toDouble)
}
