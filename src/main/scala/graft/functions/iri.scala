package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * IRI abbreviation/expansion — the reference's namespace map device
 * (/root/reference/bertmap/__init__.py:10-20, applied at
 * onto_text.py:163-177): full IRI prefix -> short prefix ("fma:", ...),
 * with a fallback scan over all namespaces.
 *
 * Rebuild: the prefix map is a small driver-side Map (broadcast by value
 * into the plan as literals); abbreviation is a chain of conditional
 * prefix replaces — pure Column expressions, codegen'd, no UDF.
 */
object iri {

  /** Longest-prefix-first abbreviation: iri -> "short:rest". Unmatched
    * IRIs pass through unchanged (onto_text.py:174-177 fallback). */
  def abbreviate(c: Column, prefixes: Map[String, String]): Column = {
    val ordered = prefixes.toSeq.sortBy(-_._1.length) // longest wins
    ordered.foldRight(c) { case ((full, short), acc) =>
      when(c.startsWith(full),
        concat(lit(short + ":"), expr_substring(c, full.length))).otherwise(acc)
    }
  }

  /** Expansion: "short:rest" -> full IRI; unmatched pass through. */
  def expand(c: Column, prefixes: Map[String, String]): Column = {
    val ordered = prefixes.toSeq.sortBy(-_._2.length)
    ordered.foldRight(c) { case ((full, short), acc) =>
      when(c.startsWith(short + ":"),
        concat(lit(full), expr_substring(c, short.length + 1))).otherwise(acc)
    }
  }

  private def expr_substring(c: Column, drop: Int): Column =
    substring(c, drop + 1, Int.MaxValue)

  // plain-Scala twins for tests/oracles
  def abbreviate(s: String, prefixes: Map[String, String]): String =
    prefixes.toSeq.sortBy(-_._1.length)
      .collectFirst { case (full, short) if s.startsWith(full) =>
        short + ":" + s.substring(full.length) }
      .getOrElse(s)

  def expand(s: String, prefixes: Map[String, String]): String =
    prefixes.toSeq.sortBy(-_._2.length)
      .collectFirst { case (full, short) if s.startsWith(short + ":") =>
        full + s.substring(short.length + 1) }
      .getOrElse(s)
}
