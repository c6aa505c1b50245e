package graft

import graft.operators.link
import graft.sources.fixtures

class LinkSpec extends SparkSuite {
  import spark.implicits._

  test("surfaceLink recovers entities from corrupted surfaces") {
    val labels = Seq(
      ("e1", "kamiro tazen"), ("e2", "belfor quandun"), ("e3", "hax gilmer"))
      .toDF("id", "label")
    // typo'd variants: last character dropped, word swap
    val surfaces = Seq("kamiro taze", "quandun belfor", "hax gilme")
      .toDF("surface")
    val out = link.surfaceLink(spark, surfaces, labels, threshold = 0.4)
      .as[(String, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out("kamiro taze") == "e1")
    assert(out("quandun belfor") == "e2")
    assert(out("hax gilme") == "e3")
  }

  test("surfaceLink: salted and unsalted paths agree") {
    val cfg = fixtures.tiny
    val labels = graft.plans.Pipeline.sideLabels(fixtures.classes(spark, cfg), "tgt")
    val surfaces = (0 until 30).map(i => fixtures.conceptName(cfg, i).dropRight(1))
      .toDF("surface")
    def run(salt: Int) =
      link.surfaceLink(spark, surfaces, labels, saltBuckets = salt, threshold = 0.4)
        .as[(String, String, Double)].collect().sortBy(r => (r._1, r._2)).toList
    assert(run(1) == run(8))
  }

  test("surfaceLink accuracy on fixture variants >= 0.95") {
    val cfg = fixtures.tiny
    val labels = graft.plans.Pipeline.sideLabels(fixtures.classes(spark, cfg), "src")
    val truth = (0 until cfg.nConcepts)
      .map(i => fixtures.conceptName(cfg, i).dropRight(1) -> fixtures.iri("src", i)).toMap
    val surfaces = truth.keys.toSeq.toDF("surface")
    val out = link.surfaceLink(spark, surfaces, labels, threshold = 0.3)
      .as[(String, String, Double)].collect()
    val correct = out.count(r => truth.get(r._1).contains(r._2))
    val acc = correct.toDouble / truth.size
    info(s"link accuracy: $acc (${truth.size} surfaces)")
    assert(acc >= 0.95)
  }
}
