package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.stage.implicits._

/**
 * Hierarchy depth — the reference's recursive DAG depth
 * (/root/reference/bertmap/onto/onto_box.py:145-187: depth_max/depth_min
 * by naive recursion per class; needed when the hard-negative sampler's
 * depth_threshold is set, config.json:23-24).
 *
 * Spark shape: an iterative frontier join from the roots downward —
 * depth(child) relaxes from depth(parent)+1 each round; max-depth keeps
 * the greatest seen, min-depth the least. Rounds are bounded by the DAG
 * height (not the node count), each round one shuffle on the edge list.
 */
object hierarchy {

  /** (id, depth) with depth = length of the LONGEST path to a root when
    * `longest`, else the shortest. Roots (no parent) have depth 0. */
  def depth(spark: SparkSession, edges: DataFrame, longest: Boolean,
            maxRounds: Int = 64): DataFrame = {
    val e = edges.select(col("child_iri"), col("parent_iri")).distinct()
      .materialize
    val nodes = e.select(col("child_iri").as("id"))
      .unionByName(e.select(col("parent_iri").as("id"))).distinct()
    val roots = nodes.join(e.select(col("child_iri").as("id")), Seq("id"), "left_anti")

    var depths = roots.withColumn("depth", lit(0L)).materialize
    var frontier = depths
    var round = 0
    val pick: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      if (longest) (a, b) => greatest(a, b) else (a, b) => least(a, b)

    while (round < maxRounds && !frontier.isEmpty) {
      val proposals = frontier
        .join(e.select(col("parent_iri").as("id"), col("child_iri")), "id")
        .select(col("child_iri").as("id"), (col("depth") + 1).as("depth"))
        .groupBy("id")
        .agg((if (longest) max(col("depth")) else min(col("depth"))).as("depth"))
      // keep a proposal only if it improves the node's current depth.
      // (re-alias via toDF at each step: the loop re-joins frames that
      // share attribute lineage, which otherwise trips ambiguous-attribute
      // resolution in some plans)
      val improved = proposals.toDF("id", "p_depth")
        .join(depths.toDF("id", "old_depth"), Seq("id"), "left")
        .filter(col("old_depth").isNull ||
          (if (longest) col("p_depth") > col("old_depth") else col("p_depth") < col("old_depth")))
        .select(col("id"), col("p_depth").as("depth"))
        .materialize
      depths = depths.join(improved.select(col("id")), Seq("id"), "left_anti")
        .unionByName(improved)
        .toDF("id", "depth")
        .materialize
      frontier = improved
      round += 1
    }
    depths
  }

  def depthMax(spark: SparkSession, edges: DataFrame): DataFrame =
    depth(spark, edges, longest = true)

  def depthMin(spark: SparkSession, edges: DataFrame): DataFrame =
    depth(spark, edges, longest = false)
}
