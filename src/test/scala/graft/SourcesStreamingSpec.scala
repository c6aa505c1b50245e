package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model._
import graft.sources.{fixtures, tables}
import graft.streaming.stream

class SourcesStreamingSpec extends SparkSuite {
  import spark.implicits._

  test("mapping TSV roundtrip keeps literal 'null'/'n/a' strings (NA contract)") {
    val dir = Files.createTempDirectory("graft-tsv").toString + "/maps"
    val m = Seq(("null", "n/a", 0.5), ("a", "NULL", 1.0))
      .toDF("entity1", "entity2", "value")
    tables.writeMappingsTsv(m, dir)
    val back = tables.readMappingsTsv(spark, dir)
      .as[(String, String, Double)].collect().toSet
    assert(back == Set(("null", "n/a", 0.5), ("a", "NULL", 1.0)))
  }

  test("OAEI alignment-RDF scan: Cells split into reference (=,<,>) and ignored (?) mappings") {
    val rdf =
      """<?xml version="1.0" encoding="utf-8"?>
        |<rdf:RDF xmlns="http://knowledgeweb.semanticweb.org/heterogeneity/alignment"
        |  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |<Alignment><map><Cell>
        |  <entity1 rdf:resource="http://onto.a/A1"/>
        |  <entity2 rdf:resource="http://onto.b/B1"/>
        |  <measure rdf:datatype="xsd:float">1.0</measure>
        |  <relation>=</relation>
        |</Cell></map>
        |<map><Cell>
        |  <entity1 rdf:resource="http://onto.a/A2"/>
        |  <entity2 rdf:resource="http://onto.b/B2"/>
        |  <measure rdf:datatype="xsd:float">0.7</measure>
        |  <relation>?</relation>
        |</Cell></map>
        |<map><Cell>
        |  <entity1 rdf:resource="http://onto.a/A3"/>
        |  <entity2 rdf:resource="http://onto.b/B3"/>
        |  <measure rdf:datatype="xsd:float">0.9</measure>
        |  <relation>&lt;</relation>
        |</Cell></map></Alignment></rdf:RDF>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("oaei").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "align.rdf"), rdf)
    val (refs, ign) = tables.readOaeiMappings(spark, dir)
    val r = refs.as[(String, String, Double)].collect().toSet
    assert(r == Set(("http://onto.a/A1", "http://onto.b/B1", 1.0),
      ("http://onto.a/A3", "http://onto.b/B3", 0.9)))
    val i = ign.as[(String, String, Double)].collect().toSet
    assert(i == Set(("http://onto.a/A2", "http://onto.b/B2", 0.7)))
  }

  test("OWL catalog scan: named classes with labels + named-parent subClassOf edges") {
    val owl =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:owl="http://www.w3.org/2002/07/owl#"
        |  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |  xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
        |<owl:Class rdf:about="http://onto.a/HeartDisease">
        |  <rdfs:label>heart disease</rdfs:label>
        |  <rdfs:label xml:lang="en">cardiac disease</rdfs:label>
        |  <rdfs:subClassOf rdf:resource="http://onto.a/Disease"/>
        |</owl:Class>
        |<owl:Class rdf:about="http://onto.a/Disease">
        |  <rdfs:label>disease</rdfs:label>
        |</owl:Class>
        |<owl:Class rdf:about="http://onto.a/Anon">
        |  <rdfs:subClassOf><owl:Restriction/></rdfs:subClassOf>
        |</owl:Class>
        |</rdf:RDF>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("owl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "cat.owl"), owl)
    val (classes, edges) = tables.readOwlCatalog(spark, dir, "src")
    val cls = classes.as[(String, String, Seq[String])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(cls("http://onto.a/HeartDisease") == Seq("heart disease", "cardiac disease"))
    assert(cls("http://onto.a/Disease") == Seq("disease"))
    assert(!cls.contains("http://onto.a/Anon")) // label-less class dropped
    val e = edges.as[(String, String, String)].collect().toSet
    assert(e == Set(("src", "http://onto.a/HeartDisease", "http://onto.a/Disease")))
  }

  test("OWL catalog scan resolves anonymous parents to named ancestors") {
    // the shapes real OAEI files carry (owlready2's is_a walks them,
    // onto_box.py:154-161): a nested named-class parent, a nodeID-routed
    // blank class with a named parent, a 2-hop blank chain, a restriction
    // parent (skipped — no reasoner), and a unionOf (skipped — unsound)
    val owl =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:owl="http://www.w3.org/2002/07/owl#"
        |  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |  xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
        |<owl:Class rdf:about="http://o/Nested">
        |  <rdfs:label>nested</rdfs:label>
        |  <rdfs:subClassOf><owl:Class rdf:about="http://o/NamedParent"/></rdfs:subClassOf>
        |</owl:Class>
        |<owl:Class rdf:about="http://o/ViaNode">
        |  <rdfs:label>via node</rdfs:label>
        |  <rdfs:subClassOf rdf:nodeID="b1"/>
        |</owl:Class>
        |<owl:Class rdf:nodeID="b1">
        |  <rdfs:subClassOf rdf:resource="http://o/NodeParent"/>
        |  <rdfs:subClassOf rdf:nodeID="b2"/>
        |</owl:Class>
        |<owl:Class rdf:nodeID="b2">
        |  <owl:intersectionOf rdf:parseType="Collection">
        |    <owl:Class rdf:about="http://o/DeepA"/>
        |    <owl:Class rdf:about="http://o/DeepB"/>
        |  </owl:intersectionOf>
        |</owl:Class>
        |<owl:Class rdf:about="http://o/Restricted">
        |  <rdfs:label>restricted</rdfs:label>
        |  <rdfs:subClassOf rdf:resource="http://o/RealParent"/>
        |  <rdfs:subClassOf><owl:Restriction>
        |    <owl:someValuesFrom rdf:resource="http://o/NotAParent"/>
        |  </owl:Restriction></rdfs:subClassOf>
        |</owl:Class>
        |<owl:Class rdf:about="http://o/Unioned">
        |  <rdfs:label>unioned</rdfs:label>
        |  <rdfs:subClassOf rdf:nodeID="b3"/>
        |</owl:Class>
        |<owl:Class rdf:nodeID="b3">
        |  <owl:unionOf rdf:parseType="Collection">
        |    <owl:Class rdf:about="http://o/UnionA"/>
        |  </owl:unionOf>
        |</owl:Class>
        |</rdf:RDF>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("owl-anon").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "cat.owl"), owl)
    val (_, edges) = tables.readOwlCatalog(spark, dir, "src")
    val e = edges.as[(String, String, String)].collect()
      .map(r => (r._2, r._3)).toSet
    assert(e == Set(
      ("http://o/Nested", "http://o/NamedParent"),       // nested named class
      ("http://o/ViaNode", "http://o/NodeParent"),       // nodeID, 1 hop
      ("http://o/ViaNode", "http://o/DeepA"),            // nodeID chain, 2 hops
      ("http://o/ViaNode", "http://o/DeepB"),            //   (intersection operands)
      ("http://o/Restricted", "http://o/RealParent")))   // restriction skipped,
    // union operands are NOT ancestors; someValuesFrom is NOT an edge
    assert(!e.exists(_._2 == "http://o/UnionA"))
    assert(!e.exists(_._2 == "http://o/NotAParent"))
  }

  test("OWL blank-node restriction fillers are not ancestors, and a " +
      "direct + via-node duplicate parent yields ONE edge") {
    val owl =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:owl="http://www.w3.org/2002/07/owl#"
        |  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |  xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
        |<owl:Class rdf:about="http://o/C">
        |  <rdfs:label>c</rdfs:label>
        |  <rdfs:subClassOf rdf:resource="http://o/P"/>
        |  <rdfs:subClassOf rdf:nodeID="br"/>
        |  <rdfs:subClassOf rdf:nodeID="bd"/>
        |</owl:Class>
        |<owl:Class rdf:nodeID="br">
        |  <owl:intersectionOf rdf:parseType="Collection">
        |    <owl:Class rdf:about="http://o/A"/>
        |    <owl:Restriction>
        |      <owl:someValuesFrom rdf:resource="http://o/Filler"/>
        |      <owl:onClass><owl:Class rdf:about="http://o/Filler2"/></owl:onClass>
        |    </owl:Restriction>
        |  </owl:intersectionOf>
        |</owl:Class>
        |<owl:Class rdf:nodeID="bd">
        |  <rdfs:subClassOf rdf:resource="http://o/P"/>
        |</owl:Class>
        |</rdf:RDF>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("owl-restr").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "cat.owl"), owl)
    val (_, edges) = tables.readOwlCatalog(spark, dir, "src")
    val all = edges.as[(String, String, String)].collect()
      .map(r => (r._2, r._3)).toSeq
    // a restriction-carrying blank node is skipped WHOLE (conservative,
    // same contract as the direct nested path): neither the filler nor
    // the sibling intersection operand surfaces as a phantom ancestor
    assert(!all.exists(_._2 == "http://o/Filler"))
    assert(!all.exists(_._2 == "http://o/Filler2"))
    assert(!all.exists(_._2 == "http://o/A"))
    // P is asserted directly AND via the bd blank node: exactly one edge
    assert(all.count(_ == ("http://o/C", "http://o/P")) == 1)
  }

  test("eval CSV roundtrip keeps the threshold-sweep rows") {
    val report = Seq((0.5, 10L, 0.9, 0.8, 0.847), (0.7, 6L, 1.0, 0.6, 0.75))
      .toDF("threshold", "n_mappings", "p", "r", "f1")
    val dir = java.nio.file.Files.createTempDirectory("evalcsv").toString
    tables.writeEvalCsv(report, dir)
    val back = tables.readEvalCsv(spark, dir)
      .select("threshold", "n_mappings", "f1")
      .as[(Double, Long, Double)].collect().toSet
    assert(back == Set((0.5, 10L, 0.847), (0.7, 6L, 0.75)))
  }

  test("transcript table roundtrip: bucketed write, asserted-schema read") {
    val dir = Files.createTempDirectory("graft-tt").toString + "/transcripts"
    val t = fixtures.transcripts(spark, fixtures.tiny)
    tables.writeTranscripts(t.toDF(), dir)
    val back = tables.readTranscripts(spark, dir)
    assert(back.count() == t.count())
    assert(back.columns.toSeq == Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    // schema assertion fires on a wrong table
    val badDir = Files.createTempDirectory("graft-bad").toString + "/x"
    Seq((1, "a")).toDF("k", "v").write.parquet(badDir)
    intercept[IllegalArgumentException](tables.readTranscripts(spark, badDir))
  }

  test("triples sink partitioned by pred; partition pruning applies") {
    val dir = Files.createTempDirectory("graft-tr").toString + "/graph"
    val t = Seq(("a", "sameAs", "b", 1.0), ("c#1", "mentions", "a", 1.0))
      .toDF("subj", "pred", "obj", "score")
    tables.writeTriples(t, dir)
    val sameAs = tables.readTriples(spark, dir).filter($"pred" === "sameAs")
    assert(sameAs.count() == 1)
    val plan = sameAs.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("pred"))
  }

  test("streaming mention detect over MemoryStream emits same rows as batch") {
    implicit val sqlCtx = spark.sqlContext
    val classes = Seq(ClassText("src", "src:C1", 0L, Seq("heart failure")))
    val turns = Seq(
      Turn("c1", 0, "user", "about heart failure", null, new Timestamp(1000L)),
      Turn("c1", 1, "assistant", "nothing", null, new Timestamp(2000L)))

    val ms = MemoryStream[Turn]
    val out = stream.detectStream(spark, ms.toDS(), classes)
    val q = out.writeStream.format("memory").queryName("mentions_out")
      .outputMode("append").start()
    ms.addData(turns: _*)
    q.processAllAvailable()
    val rows = spark.sql("select conv_id, turn_idx, class_iri from mentions_out")
      .as[(String, Int, String)].collect().toSet
    q.stop()
    assert(rows == Set(("c1", 0, "src:C1")))
  }

  test("stabilizeStream: per-conversation ordinals + cross-batch dedup via flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.stream.StreamMention
    val ms = MemoryStream[StreamMention]
    val out = graft.streaming.stream.stabilizeStream(spark, ms.toDS())
    val q = out.writeStream.format("memory").queryName("stab_out")
      .outputMode("append").start()
    // batch 1: two mentions in turn order + a duplicate inside the batch
    ms.addData(
      StreamMention("c1", 0, "src", "e1", "alpha", new Timestamp(1000L)),
      StreamMention("c1", 0, "src", "e1", "alpha", new Timestamp(1000L)),
      StreamMention("c1", 1, "src", "e2", "beta", new Timestamp(2000L)),
      StreamMention("c2", 0, "src", "e9", "gamma", new Timestamp(1000L)))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate of (c1, 1, e2) plus a new mention
    ms.addData(
      StreamMention("c1", 1, "src", "e2", "beta", new Timestamp(2000L)),
      StreamMention("c1", 2, "src", "e3", "delta", new Timestamp(3000L)))
    q.processAllAvailable()
    val rows = spark.sql("select conv_id, turn_idx, class_iri, mention_ord from stab_out")
      .as[(String, Int, String, Int)].collect().toSet
    q.stop()
    // duplicates (in-batch AND cross-batch) collapsed; ordinals dense per conv
    assert(rows == Set(
      ("c1", 0, "e1", 1), ("c1", 1, "e2", 2), ("c1", 2, "e3", 3),
      ("c2", 0, "e9", 1)))
    // matches the batch stabilize ordinals for the same in-order data
    import org.apache.spark.sql.functions.col
    val batch = graft.operators.mentions.stabilize(Seq(
      ("c1", 0, "src", "e1", "alpha"), ("c1", 1, "src", "e2", "beta"),
      ("c1", 2, "src", "e3", "delta"), ("c2", 0, "src", "e9", "gamma"))
      .toDF("conv_id", "turn_idx", "onto", "class_iri", "surface"))
      .select("conv_id", "turn_idx", "class_iri", "mention_ord")
      .as[(String, Int, String, Int)].collect().toSet
    assert(batch == rows)
  }

  test("stabilizeStream: event-time timeout actually evicts idle conversation state (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.stream.StreamMention
    val ms = MemoryStream[StreamMention]
    // 1-second idle horizon: any conversation is evictable as soon as the
    // 30-minute watermark passes its last event
    val out = graft.streaming.stream.stabilizeStream(spark, ms.toDS(),
      idleHorizonMs = 1000L)
    val q = out.writeStream.format("memory").queryName("stab_state")
      .outputMode("append").start()
    def at(hour: Int, conv: String) =
      StreamMention(conv, 0, "src", "e1", "s", new Timestamp(hour * 3600000L))
    // epoch 1: three conversations hold state
    ms.addData(at(1, "a1"), at(1, "a2"), at(1, "a3"))
    q.processAllAvailable()
    val afterEpoch1 = q.lastProgress.stateOperators.head.numRowsTotal
    assert(afterEpoch1 == 3L, s"expected 3 live conv states, got $afterEpoch1")
    // three watermark epochs, each jumping event time 2 hours: the
    // watermark (maxEventTime - 30 min) passes every earlier epoch's
    // timeout (lastEvent + 1 s), so their states must be REMOVED — state
    // is bounded by conversations inside the horizon, not stream history
    ms.addData(at(3, "b1")); q.processAllAvailable()
    ms.addData(at(5, "c1")); q.processAllAvailable()
    ms.addData(at(7, "d1")); q.processAllAvailable()
    val afterEpochs = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    // 7 conversations ever seen; only the last two epochs' can still be
    // inside the horizon (the newest, plus the one whose timeout the
    // watermark hasn't crossed yet)
    assert(afterEpochs <= 2L,
      s"state grew with stream history: $afterEpochs rows live after eviction epochs")
  }

  test("triplesStream: stream-static canonicalize join emits the batch triples' mention rows") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.stream.StreamMention
    // batch-computed components: e1 and e2 share a canonical representative
    val comps = Seq(("e1", "e1"), ("e2", "e1")).toDF("id", "canonical")
    val ms = MemoryStream[StreamMention]
    val trip = graft.streaming.stream.triplesStream(ms.toDS().toDF(), comps)
    val q = trip.writeStream.format("memory").queryName("trip_out")
      .outputMode("append").start()
    ms.addData(
      StreamMention("c1", 0, "src", "e2", "beta", new Timestamp(1000L)), // canonicalized -> e1
      StreamMention("c1", 1, "src", "e9", "x", new Timestamp(2000L)))    // unknown passes through
    q.processAllAvailable()
    val rows = spark.sql("select subj, pred, obj, score from trip_out")
      .as[(String, String, String, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("c1#0", "mentions", "e1", 1.0),
      ("c1#1", "mentions", "e9", 1.0)))
    // identical to the batch canonicalization + triples mention rows
    val batchMens = Seq(("c1", 0, "src", "e1", "beta"), ("c1", 1, "src", "e9", "x"))
      .toDF("conv_id", "turn_idx", "onto", "class_iri", "surface")
    val batch = graft.operators.canonical.triples(
        Seq.empty[(String, String, Double)].toDF("entity1", "entity2", "value"),
        batchMens, Seq.empty[(String, String)].toDF("child_iri", "parent_iri"))
      .as[(String, String, String, Double)].collect().toSet
    assert(batch == rows)
  }

  test("windowed mention rate with watermark (streaming agg)") {
    implicit val sqlCtx = spark.sqlContext
    val classes = Seq(ClassText("src", "src:C1", 0L, Seq("alpha")))
    val ms = MemoryStream[Turn]
    val agg = stream.mentionRate(stream.detectStream(spark, ms.toDS(), classes))
    val q = agg.writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    ms.addData(
      Turn("c1", 0, "user", "alpha one", null, new Timestamp(0L)),
      Turn("c1", 1, "user", "alpha two", null, new Timestamp(60000L)))
    q.processAllAvailable()
    // push the watermark far forward so the first window closes
    ms.addData(Turn("c2", 0, "user", "alpha late", null, new Timestamp(7200000L)))
    q.processAllAvailable()
    val rows = spark.sql("select class_iri, n_mentions from rate_out")
      .as[(String, Long)].collect().toList
    q.stop()
    assert(rows.contains(("src:C1", 2L)))
  }

  test("JSONL transcript ingest: roundtrip + corrupt-line quarantine (asserted schema, one pass)") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val turns = Seq(
      Turn("c1", 0, "user", "alpha beta", null, new Timestamp(1000L)),
      Turn("c1", 1, "assistant", "gamma", "search", new Timestamp(2000L)),
      Turn("c2", 0, "user", "delta", null, new Timestamp(3000L)))
    graft.sources.tables.writeTranscriptsJsonl(turns.toDF(), s"$dir/clean")
    val (good0, corrupt0) = graft.sources.tables.readTranscriptsJsonl(spark, s"$dir/clean")
    assert(corrupt0.count() == 0)
    val back = good0.as[Turn].collect().sortBy(t => (t.conv_id, t.turn_idx)).toSeq
    assert(back == turns) // per-turn text equality under stable ordering
    // a dump with garbage interleaved: malformed JSON + schema drift
    val mixed = Seq(
      """{"conv_id":"c9","turn_idx":0,"role":"user","text":"ok","tool":null,"ts":"2026-01-01T00:00:00.000Z"}""",
      """this is not json at all""",
      """{"conv_id":"c9","role":"user","text":"missing turn_idx"}""",
      """{"turn_idx":3,"text":"missing conv_id"}""",
      // wrong-typed fields: partial-results parsing nulls just the bad
      // field — these must land in quarantine, not as silently-nulled rows
      """{"conv_id":"c9","turn_idx":"not-an-int","role":"user","text":"drifted turn_idx"}""",
      """{"conv_id":"c9","turn_idx":4,"role":"user","text":"drifted ts","ts":"not-a-timestamp"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/raw.jsonl"),
      mixed.mkString("\n").getBytes("UTF-8"))
    val (good, corrupt) = graft.sources.tables.readTranscriptsJsonl(spark, s"$dir/raw.jsonl")
    assert(good.count() == 1 && good.select("conv_id").as[String].head() == "c9")
    val bad = corrupt.as[String].collect().toSet
    assert(bad == mixed.drop(1).toSet) // quarantined VERBATIM, none dropped
  }

  test("sessionizeGap: new session opens after the idle gap, ordinals per key") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (10L, 1L, ts(0)),    // u1 s1
      (11L, 1L, ts(100)),  // u1 s1 (gap 100 <= 600)
      (12L, 1L, ts(800)),  // u1 s2 (gap 700 > 600)
      (13L, 1L, ts(900)),  // u1 s2
      (20L, 2L, ts(50))    // u2 s1
    ).toDF("event_id", "user_id", "ts")
    val got = graft.streaming.stream
      .sessionizeGap(ev, "user_id", "ts", "event_id", 600.0)
      .select("event_id", "session_ord").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L, 20L -> 1L))
    // a gap of exactly the threshold does NOT open a session (strict >)
    val edge = Seq((1L, 1L, ts(0)), (2L, 1L, ts(600))).toDF("event_id", "user_id", "ts")
    val e = graft.streaming.stream
      .sessionizeGap(edge, "user_id", "ts", "event_id", 600.0)
      .select("event_id", "session_ord").as[(Long, Long)].collect().toMap
    assert(e == Map(1L -> 1L, 2L -> 1L))
  }

  test("dedupStream: first-seen ledger across micro-batches matches batch canonical set") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.stream.StreamDoc
    val ms = MemoryStream[StreamDoc]
    val out = graft.streaming.stream.dedupStream(spark, ms.toDS())
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // batch 1: an in-batch duplicate pair (2 wins on min id) + a singleton
    ms.addData(
      StreamDoc(3L, "The  quick_brown fox"),
      StreamDoc(2L, "the quick brown fox"),
      StreamDoc(5L, "something else entirely"))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate (suppressed) + a new doc
    ms.addData(
      StreamDoc(1L, "the quick brown fox"),
      StreamDoc(7L, "a genuinely new document"))
    q.processAllAvailable()
    val rows = spark.sql("select doc_id from dedup_out").as[Long].collect().toSet
    q.stop()
    // first-seen per content: 2 (min id in its arrival batch), 5, 7; the
    // later-arriving duplicate 1 is suppressed by the ledger
    assert(rows == Set(2L, 5L, 7L))
    // the emitted HASH set equals the batch dedup.exact canonical set over
    // the union of both batches
    val batchHashes = graft.operators.dedup.exact(
      Seq((3L, "The  quick_brown fox"), (2L, "the quick brown fox"),
        (5L, "something else entirely"), (1L, "the quick brown fox"),
        (7L, "a genuinely new document")).toDF("id", "text"), "id", "text")
      .filter(org.apache.spark.sql.functions.col("is_canonical") === 1)
      .select("text_hash").as[String].collect().toSet
    val streamHashes = spark.sql("select text_hash from dedup_out")
      .as[String].collect().toSet
    assert(streamHashes == batchHashes)
  }

  test("Main: staged run resumes from manifests (second run reuses stages)") {
    val work = Files.createTempDirectory("graft-main").toString
    graft.plans.Main.main(Array("fixture:40", "fixture", work))
    val m1 = graft.plans.lineage.readManifest(spark, s"$work/triples")
    assert(m1.isDefined && m1.get.rows > 0)
    // second run must hit the manifests (same fingerprint, same rows)
    graft.plans.Main.main(Array("fixture:40", "fixture", work))
    val m2 = graft.plans.lineage.readManifest(spark, s"$work/triples")
    assert(m2.get.fingerprint == m1.get.fingerprint && m2.get.rows == m1.get.rows)
    assert(spark.read.parquet(s"$work/graph").count() == m1.get.rows)
  }
}
