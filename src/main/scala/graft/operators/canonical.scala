package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.stage.implicits._

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
   * Connected components by min-label propagation with POINTER JUMPING and
   * EDGE CONTRACTION — O(log(diameter)) rounds, not O(diameter): each round
   * (1) pulls the min neighbor label, (2) compresses canonical chains one
   * level (canonical := canonical(canonical)), (3) rewrites the edge list
   * onto current representatives and drops self-loops, so the residual
   * graph shrinks geometrically. Plain min-propagation needs diameter
   * rounds — a chain-shaped component of length 10^6 in a 100 TB entity
   * graph would never finish; this variant finishes in ~20.
   * `edges` must carry (entity1, entity2). Returns (id, canonical).
   */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    var e = edges.select(col("entity1").as("a"), col("entity2").as("b"))
      .unionByName(edges.select(col("entity2").as("a"), col("entity1").as("b")))
      .distinct()
      .materialize
    var labels = e.select(col("a").as("id")).distinct()
      .withColumn("canonical", col("id"))
      .materialize
    var iter = 0
    while (iter < maxIter && !e.isEmpty) {
      // (1) min over self and current representatives' neighbor labels
      val minNb = e.join(labels.select(col("id").as("b"), col("canonical").as("lb")), "b")
        .groupBy("a").agg(min(col("lb")).as("nb"))
        .withColumnRenamed("a", "id")
      val updated = labels.join(minNb, Seq("id"), "left")
        .select(col("id"),
          least(col("canonical"), coalesce(col("nb"), col("canonical"))).as("canonical"))
      // (2) pointer jump: follow one level of indirection
      val jumped = updated.as("x")
        .join(updated.select(col("id").as("cid"), col("canonical").as("cc")).as("y"),
          col("x.canonical") === col("y.cid"))
        .select(col("x.id").as("id"), col("y.cc").as("canonical"))
        .materialize
      // (3) contract: edges between current representatives only
      e = e.join(jumped.select(col("id").as("a"), col("canonical").as("ca")), "a")
        .join(jumped.select(col("id").as("b"), col("canonical").as("cb")), "b")
        .select(col("ca").as("a"), col("cb").as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .materialize
      labels = jumped
      iter += 1
    }
    // final path compression: resolve any residual canonical chains.
    // Convergence is guaranteed (each pass strictly compresses), but a
    // hard cap bounds the job if an upstream invariant ever breaks —
    // 64 doublings cover any chain shorter than 2^64.
    var changed = 1L
    var compressIter = 0
    while (changed > 0) {
      require(compressIter < 64,
        "connectedComponents: path compression did not converge in 64 " +
          "passes — canonical pointers contain a cycle (corrupt labels?)")
      compressIter += 1
      val next = labels.as("x")
        .join(labels.select(col("id").as("cid"), col("canonical").as("cc")).as("y"),
          col("x.canonical") === col("y.cid"))
        .select(col("x.id").as("id"), col("y.cc").as("canonical"))
        .materialize
      changed = next.as("n")
        .join(labels.select(col("id"), col("canonical").as("old")), "id")
        .filter(col("canonical") =!= col("old")).count()
      labels = next
    }
    labels
  }

  /** Components of a 1-to-1 mapping set (a perfect matching — what
    * repair.oneToOne guarantees): every component is a single edge, so the
    * canonical representative is just the lexicographic min of the pair.
    * No iteration, one projection — use this instead of
    * connectedComponents when the matching invariant holds. */
  def matchingComponents(matching: DataFrame): DataFrame = {
    val c = least(col("entity1"), col("entity2")).as("canonical")
    matching.select(col("entity1").as("id"), c)
      .unionByName(matching.select(col("entity2").as("id"), c))
      .distinct()
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
