package graft

import graft.operators.{extend, repair}

class ExtendRepairSpec extends SparkSuite {
  import spark.implicits._

  // src hierarchy: a1 -> p1 ; tgt: b1 -> q1. Labels make (p1,q1) an exact match.
  private lazy val srcEdges = Seq(("a1", "p1")).toDF("child_iri", "parent_iri")
  private lazy val tgtEdges = Seq(("b1", "q1")).toDF("child_iri", "parent_iri")
  private lazy val srcLabels = Seq(("a1", "alpha"), ("p1", "parent concept"))
    .toDF("id", "label")
  private lazy val tgtLabels = Seq(("b1", "alpha two"), ("q1", "parent concept"))
    .toDF("id", "label")

  test("extension adds the 1-hop parent pair via string match, then terminates") {
    val seeds = Seq(("a1", "b1", 0.95)).toDF("entity1", "entity2", "value")
    val out = extend.extendMappings(spark, seeds, srcEdges, tgtEdges,
      srcLabels, tgtLabels, kappa = 0.9, maxIter = 10)
    val rows = out.as[(String, String, Double)].collect().toSet
    assert(rows == Set(("p1", "q1", 1.0)))
  }

  test("seen pairs are never re-emitted (bert_classifier_extend.py:48-50)") {
    val seeds = Seq(("a1", "b1", 0.95), ("p1", "q1", 0.99))
      .toDF("entity1", "entity2", "value")
    val out = extend.extendMappings(spark, seeds, srcEdges, tgtEdges,
      srcLabels, tgtLabels, kappa = 0.9, maxIter = 10)
    assert(out.count() == 0) // (p1,q1) already in the seed/seen set
  }

  test("no seeds above kappa -> empty expansion, empty-schema preserved") {
    val seeds = Seq(("a1", "b1", 0.5)).toDF("entity1", "entity2", "value")
    val out = extend.extendMappings(spark, seeds, srcEdges, tgtEdges,
      srcLabels, tgtLabels, kappa = 0.9, maxIter = 10)
    assert(out.columns.toSeq == Seq("entity1", "entity2", "value") && out.count() == 0)
  }

  test("extension output scores all >= kappa (invariant)") {
    val seeds = Seq(("a1", "b1", 0.95)).toDF("entity1", "entity2", "value")
    val out = extend.extendMappings(spark, seeds, srcEdges, tgtEdges,
      srcLabels, tgtLabels, kappa = 0.9, maxIter = 10)
    assert(out.filter($"value" < 0.9).count() == 0)
  }

  test("oneToOne: best mapping per entity per side, deterministic ties") {
    val m = Seq(
      ("s1", "t1", 0.9), ("s1", "t2", 0.8), // s1 keeps t1
      ("s2", "t1", 0.95),                   // t1 contested -> s2 wins
      ("s3", "t3", 0.7), ("s4", "t3", 0.7)  // tie on value -> s3 (asc id)
    ).toDF("entity1", "entity2", "value")
    val out = repair.oneToOne(m).select("entity1", "entity2")
      .as[(String, String)].collect().toSet
    assert(out == Set(("s2", "t1"), ("s3", "t3")))
  }

  test("dropCrosswise removes dominated inverted mappings") {
    // a -> b mapped at 0.6; parent(a)=pa mapped to child(b)=cb at 0.9
    // => (a,b) crosswise-inverted and dominated -> dropped
    val m = Seq(("a", "b", 0.6), ("pa", "cb", 0.9)).toDF("entity1", "entity2", "value")
    val sE = Seq(("a", "pa")).toDF("child_iri", "parent_iri")
    val tE = Seq(("cb", "b")).toDF("child_iri", "parent_iri")
    val out = repair.dropCrosswise(m, sE, tE)
      .select("entity1", "entity2").as[(String, String)].collect().toSet
    assert(out == Set(("pa", "cb")))
  }

  test("repair never adds rows (conservative by construction)") {
    val m = Seq(("s1", "t1", 0.9), ("s2", "t2", 0.8)).toDF("entity1", "entity2", "value")
    val sE = Seq.empty[(String, String)].toDF("child_iri", "parent_iri")
    val out = repair.repairMappings(m, sE, sE)
    assert(out.count() <= m.count())
  }
}
