package graft

import graft.operators.corpus

class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private lazy val classes = Seq(
    ("c1", Seq("aa", "bb")),
    ("c2", Seq("cc")),
    ("c3", Seq("dd", "ee", "ff"))
  ).toDF("class_iri", "labels")

  private lazy val edges = Seq(
    ("c1", "root"), ("c2", "root"), ("c3", "other")
  ).toDF("child_iri", "parent_iri")

  test("intraSynonyms: ordered distinct-label pairs per class (intra_onto.py:61-76)") {
    val out = corpus.intraSynonyms(classes)
      .select("sent1", "sent2").as[(String, String)].collect().toSet
    assert(out == Set(("aa", "bb"), ("bb", "aa"),
      ("dd", "ee"), ("ee", "dd"), ("dd", "ff"), ("ff", "dd"), ("ee", "ff"), ("ff", "ee")))
  }

  test("identitySynonyms: every distinct label with itself, label 1") {
    val out = corpus.identitySynonyms(classes)
    assert(out.count() == 6)
    assert(out.filter("sent1 <> sent2").count() == 0)
    assert(out.filter("label <> 1").count() == 0)
  }

  test("softNonsynonyms: seeded, never same-class, never an existing synonym") {
    val out = corpus.softNonsynonyms(classes, rate = 3, seed = 42L)
    val rows = out.select("sent1", "sent2").as[(String, String)].collect()
    assert(rows.nonEmpty)
    val syn = Set(("aa", "bb"), ("bb", "aa"), ("dd", "ee"), ("ee", "dd"),
      ("dd", "ff"), ("ff", "dd"), ("ee", "ff"), ("ff", "ee"))
    rows.foreach { r => assert(!syn.contains(r) && r._1 != r._2) }
    // determinism: same seed twice
    val again = corpus.softNonsynonyms(classes, rate = 3, seed = 42L)
      .select("sent1", "sent2").as[(String, String)].collect()
    assert(rows.sorted.toList == again.sorted.toList)
  }

  test("hardNonsynonyms: sibling-class label pairs, synonyms excluded") {
    val out = corpus.hardNonsynonyms(classes, edges)
      .select("sent1", "sent2").as[(String, String)].collect().toSet
    // siblings under root: c1 x c2 -> labels {aa,bb} x {cc}
    assert(out == Set(("aa", "cc"), ("bb", "cc"), ("cc", "aa"), ("cc", "bb")) ||
      out == Set(("aa", "cc"), ("bb", "cc"))) // direction depends on c1<c2 ordering
  }

  test("crossSynonyms: label cross product of mapped classes, both directions") {
    val maps = Seq(("c1", "t1")).toDF("entity1", "entity2")
    val tgt = Seq(("t1", Seq("xx"))).toDF("class_iri", "labels")
    val out = corpus.crossSynonyms(maps, classes, tgt)
      .select("sent1", "sent2").as[(String, String)].collect().toSet
    assert(out == Set(("aa", "xx"), ("bb", "xx"), ("xx", "aa"), ("xx", "bb")))
  }

  test("split: ratio guard + deterministic assignment") {
    val maps = (1 to 100).map(i => (s"e$i", s"f$i")).toDF("entity1", "entity2")
    val s1 = corpus.split(maps, 0.2, 0.1, 7L).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(s1.values.sum == 100 && s1.keySet == Set("train", "val", "test"))
    intercept[IllegalArgumentException](corpus.split(maps, 0.8, 0.3, 7L))
    val s2 = corpus.split(maps, 0.2, 0.1, 7L).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(s1 == s2)
  }

  test("downsampleNegatives: keeps exactly negRate * nSyn rows with dense global ranks") {
    val negs = (1 to 50).map(i => (s"a$i", s"b$i")).toDF("sent1", "sent2")
    val out = corpus.downsampleNegatives(negs, nSyn = 10, negRate = 2.0, seed = 3L)
    assert(out.count() == 20)
    assert(out.select("rn").as[Long].collect().sorted.toList == (1L to 20L).toList)
  }

  test("counters: per-kind counts") {
    val c = Seq(("a", "b", 1, "syn"), ("c", "d", 0, "soft_neg"), ("e", "f", 0, "soft_neg"))
      .toDF("sent1", "sent2", "label", "kind")
    val m = corpus.counters(c).as[(String, Long)].collect().toMap
    assert(m == Map("syn" -> 1L, "soft_neg" -> 2L))
  }
}
