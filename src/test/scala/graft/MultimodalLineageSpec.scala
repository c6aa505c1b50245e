package graft

import java.nio.file.Files
import graft.operators.multimodal
import graft.plans.lineage

class MultimodalLineageSpec extends SparkSuite {
  import spark.implicits._

  test("mediaMeta: byte length, md5, shard from a binary column") {
    val df = Seq((1L, "abc".getBytes("UTF-8"))).toDF("id", "payload")
    val row = multimodal.mediaMeta(df, "id", "payload").head()
    assert(row.getAs[Long]("n_bytes") == 3L)
    assert(row.getAs[String]("payload_md5") == "900150983cd24fb0d6963f7d28e17f72")
    assert(row.getAs[Long]("shard") == 3L)
  }

  test("decodeFeatures: batched fake decode with stable schema") {
    val df = (1 to 100).map(i => (i.toLong, s"payload-$i".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = multimodal.decodeFeatures(spark, df, "id", "payload", dim = 8, batchSize = 16)
    assert(out.columns.toSeq == Seq("id", "n_bytes", "features"))
    val r = out.filter($"id" === 1L).head()
    assert(r.getSeq[Float](2).length == 8)
    // determinism across batch sizes
    val again = multimodal.decodeFeatures(spark, df, "id", "payload", dim = 8, batchSize = 7)
      .filter($"id" === 1L).head()
    assert(r.getSeq[Float](2).toList == again.getSeq[Float](2).toList)
  }

  test("lineage stage: builds once, resumes from manifest, rebuilds on new fingerprint") {
    val dir = Files.createTempDirectory("graft-lineage").toString
    var builds = 0
    def build = { builds += 1; Seq((1, "a"), (2, "b")).toDF("k", "v") }
    val a = lineage.stage(spark, dir, "s1", "fp-A")(build)
    assert(builds == 1 && a.count() == 2)
    val b = lineage.stage(spark, dir, "s1", "fp-A")(build)
    assert(builds == 1 && b.count() == 2) // manifest hit, no rebuild
    val c = lineage.stage(spark, dir, "s1", "fp-B")(build)
    assert(builds == 2 && c.count() == 2) // input changed -> rebuilt
  }
}
