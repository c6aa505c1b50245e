package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Entity canonicalization + triple materialization — the graft's output
 * stage (BASELINE.json north_star: "canonicalize entities and emit
 * (subj, pred, obj) triples materialized as partitioned graph tables").
 *
 * The reference stops at the mapping TSV (onto_map.py:144-146); the graft
 * closes the loop: sameAs mappings induce an equivalence relation whose
 * connected components pick a canonical representative (lexicographic min —
 * deterministic), and the final graph table carries three predicates:
 *   sameAs   — repaired alignment edges,
 *   mentions — turn → entity evidence from the mention-detect stage,
 *   broader  — child → parent hierarchy edges.
 */
object canonical {

  /**
   * Connected components by iterative min-label propagation: scalable
   * (each iteration = one shuffle on the edge list; converges in
   * O(log(diameter)) iterations for the min-hop variant we run, far fewer
   * than diameter because labels hop across both edge endpoints).
   * `edges` must carry (entity1, entity2). Returns (id, canonical).
   */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
                          maxIter: Int = 10): DataFrame = {
    val sym = edges.select(col("entity1").as("a"), col("entity2").as("b"))
      .unionByName(edges.select(col("entity2").as("a"), col("entity1").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("canonical", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (iter < maxIter && changed > 0) {
      // candidate label for each node: min over self and neighbors' labels
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("canonical"))
      val next = labels.unionByName(viaNeighbor)
        .groupBy("id").agg(min(col("canonical")).as("canonical"))
        .localCheckpoint(true)
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.canonical") =!= col("o.canonical")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** Rewrite both endpoints of a mapping set to canonical representatives. */
  def canonicalize(mappings: DataFrame, components: DataFrame): DataFrame =
    mappings
      .join(components.select(col("id").as("entity1"), col("canonical").as("c1")),
        Seq("entity1"), "left")
      .join(components.select(col("id").as("entity2"), col("canonical").as("c2")),
        Seq("entity2"), "left")
      .select(
        coalesce(col("c1"), col("entity1")).as("entity1"),
        coalesce(col("c2"), col("entity2")).as("entity2"),
        col("value"))

  /** Assemble the graph table. All inputs optional-empty-safe. */
  def triples(sameAs: DataFrame, mentions: DataFrame,
              broader: DataFrame): DataFrame = {
    val a = sameAs.select(col("entity1").as("subj"), lit("sameAs").as("pred"),
      col("entity2").as("obj"), col("value").as("score"))
    val m = mentions.select(
      concat(col("conv_id"), lit("#"), col("turn_idx")).as("subj"),
      lit("mentions").as("pred"), col("class_iri").as("obj"), lit(1.0).as("score"))
    val b = broader.select(col("child_iri").as("subj"), lit("broader").as("pred"),
      col("parent_iri").as("obj"), lit(1.0).as("score"))
    a.unionByName(m).unionByName(b)
  }
}
