package graft

import java.sql.Timestamp

/**
 * Core row types of the graft engine (explicit schemas everywhere — the
 * reference keeps schemas implicit in dict conventions / TSV headers, e.g.
 * mapping columns at /root/reference/bertmap/map/onto_map.py:144; we declare
 * them as case classes + Encoders.product so every source read fails fast on
 * drift).
 */
object model {

  /** One transcript turn — the authoritative graft input shape
    * (BASELINE.json input_hint): Iceberg-style table of multi-turn
    * conversation / agent transcripts. */
  final case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String, // nullable
      ts: Timestamp)

  /** A detected entity mention inside a turn (mention-detect stage). */
  final case class Mention(
      conv_id: String,
      turn_idx: Int,
      onto: String,      // which catalog side the surface form resolved to
      class_iri: String, // entity the surface form belongs to
      surface: String)   // matched surface form (normalized)

  /** A catalog entity ("class" in the reference's ontology terminology) with
    * its bag of label strings — cf. classtexts, onto_text.py:53,72-85. */
  final case class ClassText(
      onto: String,      // "src" | "tgt"
      class_iri: String,
      class_idx: Long,   // dense, deterministic (orderBy class_iri)
      labels: Seq[String])

  /** Hierarchy edge (child is-a parent) — cf. onto_box.py:154-161. */
  final case class Edge(onto: String, child_iri: String, parent_iri: String)

  /** Sub-word inverted index posting — cf. onto_index.py:49-60. */
  final case class Posting(onto: String, token: String, class_idx: Long)

  /** A scored cross-catalog mapping — the reference's (Entity1, Entity2,
    * Value) TSV contract, onto_map.py:144-146. */
  final case class Mapping(entity1: String, entity2: String, value: Double)

  /** Corpus pair in long form (reference nests these in a dict keyed by
    * label text, basic_corpus.py:20-29). kind ∈ {id_syn, syn, soft_neg,
    * hard_neg}; label 1 = synonym, 0 = nonsynonym. */
  final case class CorpusPair(
      sent1: String, sent2: String, label: Int, kind: String, split: String)

  /** Output triple of the KG-construction pipeline.
    * pred ∈ {sameAs, mentions, broader}. */
  final case class Triple(subj: String, pred: String, obj: String, score: Double)

  /** Evaluation row — cf. onto_map.py:101-116 report shape. */
  final case class EvalRow(
      set_type: String, threshold: Double, n_mappings: Long, n_ignored: Long,
      p: Double, r: Double, f1: Double)
}
