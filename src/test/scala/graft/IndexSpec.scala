package graft

import org.apache.spark.sql.functions._
import graft.operators.index

class IndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val classes = Seq(
    (1L, Seq("heart failure")),
    (2L, Seq("heart attack")),
    (3L, Seq("kidney failure", "renal failure"))
  ).toDF("cid", "labels")

  test("postings: explode + tokenize + distinct per class") {
    val p = index.postings(classes, "cid", "labels")
      .as[(Long, String)].collect().toSet
    assert(p == Set(
      (1L, "heart"), (1L, "failure"),
      (2L, "heart"), (2L, "attack"),
      (3L, "kidney"), (3L, "failure"), (3L, "renal")))
  }

  test("postings honor the length cut (onto_index.py:55-58)") {
    val p = index.postings(Seq((1L, Seq("a bb ccc"))).toDF("cid", "labels"),
      "cid", "labels", cut = 2)
    assert(p.select("token").as[String].collect().toSet == Set("ccc"))
  }

  test("docFreq counts classes per token") {
    val df = index.docFreq(index.postings(classes, "cid", "labels"))
      .as[(String, Long)].collect().toMap
    assert(df("heart") == 2 && df("failure") == 2 && df("renal") == 1)
  }

  test("idfCandidates: summed-IDF ranking with deterministic tie-break") {
    val posting = index.postings(classes, "cid", "labels")
    val q = Seq((10L, "heart"), (10L, "failure")).toDF("query_id", "token")
    val out = index.idfCandidates(q, posting, totalDocs = 3, limit = 2)
      .select("query_id", "class_id").as[(Long, Long)].collect().toList
    // class 1 shares heart+failure (idf sum = 2*log10(1.5));
    // classes 2,3 share one token each (log10(1.5)) -> tie broken by id asc
    assert(out == List((10L, 1L), (10L, 2L)))
  }

  test("unique rare token dominates common token (idf ordering)") {
    val posting = index.postings(classes, "cid", "labels")
    val q = Seq((7L, "renal"), (7L, "heart")).toDF("query_id", "token")
    val top = index.idfCandidates(q, posting, 3, 1)
      .select("class_id").as[Long].head()
    assert(top == 3L) // idf(renal)=log10(3) > idf(heart)=log10(1.5)
  }

  test("salted aggregation produces identical results to unsalted") {
    val posting = index.postings(classes, "cid", "labels")
    val q = Seq((1L, "heart"), (1L, "failure"), (2L, "renal"), (2L, "heart"))
      .toDF("query_id", "token")
    val a = index.idfCandidates(q, posting, 3, 3, saltBuckets = 1)
      .orderBy("query_id", "class_id")
      .select("query_id", "class_id").as[(Long, Long)].collect().toList
    val b = index.idfCandidates(q, posting, 3, 3, saltBuckets = 8)
      .orderBy("query_id", "class_id")
      .select("query_id", "class_id").as[(Long, Long)].collect().toList
    assert(a == b && a.nonEmpty)
  }

  test("maxDfFrac drops stop-tokens from scoring") {
    val posting = index.postings(classes, "cid", "labels")
    // 'heart'/'failure' have df=2 of 3 docs = 0.67 > 0.5 -> dropped
    val q = Seq((9L, "heart"), (9L, "renal")).toDF("query_id", "token")
    val out = index.idfCandidates(q, posting, 3, 5, maxDfFrac = 0.5)
      .select("class_id").as[Long].collect().toSet
    assert(out == Set(3L))
  }

  test("sub-word postings: morphological variants share head-piece postings (onto_index.py:46-47)") {
    import graft.functions.text
    // word-level postings: 'cardiomyopathy' vs 'cardiomegaly' share nothing
    val cls = Seq((1L, Seq("cardiomyopathy")), (2L, Seq("cardiomegaly")))
      .toDF("cid", "labels")
    val word = index.postings(cls, "cid", "labels")
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(word(1L).intersect(word(2L)).isEmpty)
    // sub-word postings: both split to head piece 'card' (+ continuations)
    val sub = index.postings(cls, "cid", "labels", 0, c => text.subwordTokensCol(c))
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(sub(1L).intersect(sub(2L)).contains("card"))
    // Column tokenizer agrees with the plain-Scala twin exactly
    assert(sub(1L) == text.subwordTokens("cardiomyopathy").toSet)
    assert(text.subwordTokens("cardiomyopathy") ==
      Seq("card", "##iomy", "##opat", "##hy"))
  }

  test("wordpiece postings: Column tokenizer over a broadcast vocab equals the plain-Scala kernel") {
    import graft.functions.text
    val vocab = Set("card", "##iomy", "##opathy", "##opat", "##hy", "##iome",
      "##galy", "acute")
    val cls = Seq((1L, Seq("cardiomyopathy", "acute")), (2L, Seq("cardiomegaly")))
      .toDF("cid", "labels")
    val bc = spark.sparkContext.broadcast(vocab)
    val got = index.postings(cls, "cid", "labels", 0, c => text.wordpieceTokensCol(bc)(c))
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // plain-Scala twin as the oracle
    assert(got(1L) ==
      (text.wordpieceTokens(vocab, "cardiomyopathy") ++
        text.wordpieceTokens(vocab, "acute")).toSet)
    // greedy prefers the longer '##opathy' over '##opat' + '##hy'
    assert(got(1L).contains("##opathy") && !got(1L).contains("##opat"))
    // morphological variants share the head piece 'card' in the index
    assert(got(2L) == Set("card", "##iome", "##galy"))
    assert(got(1L).intersect(got(2L)) == Set("card"))
  }

  test("fixed-point variant agrees with double variant on ranking") {
    val posting = index.postings(classes, "cid", "labels")
    val q = Seq((1L, "heart"), (1L, "failure"), (1L, "renal"))
      .toDF("query_id", "token")
    val a = index.idfCandidates(q, posting, 3, 3)
      .select("class_id").as[Long].collect().toList
    val b = index.idfCandidatesFixedPoint(q, posting, 3, 3)
      .select("class_id").as[Long].collect().toList
    assert(a == b)
  }
}
