package graft

import graft.operators.{dedup, similarity}

class DedupSimSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "The  quick_brown fox"),   // same after normalization
    (3L, "a completely different sentence here"),
    (4L, "the quick brown fox jumps")
  ).toDF("id", "text")

  test("exact dedup: normalized-hash groups, min-id canonical") {
    val rows = dedup.exact(docs, "id", "text")
      .select("id", "group_size", "is_canonical")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows(1L) == (2L, 1) && rows(2L) == (2L, 0))
    assert(rows(3L) == (1L, 1) && rows(4L) == (1L, 1))
  }

  test("shingles: sliding word k-grams, distinct") {
    val s = dedup.shingles(Seq((1L, "a b c b c")).toDF("id", "text"), "id", "text", 2)
      .select("shingle").as[String].collect().toSet
    assert(s == Set("a b", "b c", "c b"))
  }

  test("ngramJaccardPairs finds near-dups above threshold") {
    val pairs = dedup.ngramJaccardPairs(docs, "id", "text", 2, 0.5, 100)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical after normalization
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash: identical docs get identical signatures") {
    val sig = dedup.minhashLong(docs, "id", "text", 2, 8)
      .select("id", "seed", "mh").as[(Long, Int, String)].collect()
    val s1 = sig.filter(_._1 == 1L).map(r => (r._2, r._3)).sorted.toList
    val s2 = sig.filter(_._1 == 2L).map(r => (r._2, r._3)).sorted.toList
    assert(s1 == s2 && s1.size == 8)
  }

  test("lshCandidates surfaces the identical pair") {
    val pairs = dedup.lshCandidates(docs, "id", "text", 2, 8, 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash: identical normalized docs -> identical 64-bit signature") {
    val s = dedup.simhash(docs, "id", "text")
      .select("id", "simhash").as[(Long, java.math.BigDecimal)].collect()
      .map(r => r._1 -> r._2.toBigInteger).toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(3L))
  }

  test("bruteForceTopK: hand-computed nearest neighbor") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("vid", "vec")
    val out = similarity.bruteForceTopK(vecs.filter($"vid" === 1L), vecs, "vid", "vec", 2)
      .select("cand_id", "rank").as[(Long, Int)].collect().toMap
    assert(out(2L) == 1 && out(3L) == 2)
  }

  test("ivfTopK probes nearest cells and matches brute force on clean clusters") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.95f, 0.05f)), (2L, Seq(0.9f, 0.1f)),
      (100L, Seq(0.0f, 1.0f)), (101L, Seq(0.05f, 0.95f)), (102L, Seq(0.1f, 0.9f))
    ).toDF("vid", "vec")
    val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cell", "cvec")
    val q = vecs.filter($"vid" === 1L)
    val ivf = similarity.ivfTopK(q, vecs, centroids, "vid", "vec", 2, 1)
      .select("cand_id").as[Long].collect().toSet
    val bf = similarity.bruteForceTopK(q, vecs, "vid", "vec", 2)
      .select("cand_id").as[Long].collect().toSet
    assert(ivf == bf) // nProbe=1 suffices: cluster is clean
  }

  test("embeddingNearDups respects blocking key") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(0.99f, 0.01f), "a"),
      (3L, Seq(1.0f, 0.0f), "b") // identical to 1 but different block
    ).toDF("vid", "vec", "blk")
    val out = dedup.embeddingNearDups(vecs, "vid", "vec", "blk", 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }
}
