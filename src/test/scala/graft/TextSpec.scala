package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.text

class TextSpec extends AnyFunSuite {

  test("normalize: lowercase, underscores, whitespace collapse") {
    assert(text.normalize("Heart_Failure  Acute") == "heart failure acute")
    assert(text.normalize("  A_B ") == "a b")
  }

  test("normalizeLabels: order-preserving dedup, drops empties (uniqify semantics)") {
    assert(text.normalizeLabels(Seq("B_x", "", "b x", "A")) == Seq("b x", "a"))
  }

  test("wordTokens: alnum runs only") {
    assert(text.wordTokens("Heart-failure, acute!") == Seq("heart", "failure", "acute"))
    assert(text.wordTokens("") == Seq.empty)
  }

  test("subwordTokens: head + ##continuations of length 4") {
    assert(text.subwordTokens("hyperthermia") ==
      Seq("hype", "##rthe", "##rmia"))
    assert(text.subwordTokens("ab cd") == Seq("ab", "cd"))
  }

  test("wordpiece: greedy longest-match with ## continuations, [UNK] on dead end") {
    val vocab = Set("un", "##aff", "##able", "aff", "hyper", "##ther", "##mia",
      "custom", "cust", "##er", "##omer", "s", "slo", "##low")
    // the classic BERT example
    assert(text.wordpieceWord(vocab, "unaffable") == List("un", "##aff", "##able"))
    // longest prefix wins even when a shorter decomposition also exists
    assert(text.wordpieceWord(vocab, "customer") == List("custom", "##er"))
    // NO backtracking: 'slow' -> greedy 'slo' then no '##w' -> whole word
    // [UNK], even though 's' + '##low' would have covered it
    assert(text.wordpieceWord(vocab, "slow") == List(text.WordpieceUnk))
    // no piece at position 0 at all
    assert(text.wordpieceWord(vocab, "xyz") == List(text.WordpieceUnk))
    // whole string: word-tokenize then piece each word
    assert(text.wordpieceTokens(vocab, "Unaffable customer, xyz!") ==
      Seq("un", "##aff", "##able", "custom", "##er", "[UNK]"))
  }

  test("levenshtein matches known distances") {
    assert(text.levenshtein("kitten", "sitting") == 3)
    assert(text.levenshtein("", "abc") == 3)
    assert(text.levenshtein("abc", "abc") == 0)
  }

  test("editSimilarity = 1 - dist/maxlen (nes_map.py:73-77)") {
    assert(math.abs(text.editSimilarity("kitten", "sitting") - (1.0 - 3.0 / 7)) < 1e-12)
    assert(text.editSimilarity("", "") == 1.0)
  }

  test("tokenJaccard") {
    assert(text.tokenJaccard("a b c", "b c d") == 2.0 / 4)
    assert(text.tokenJaccard("", "") == 1.0)
  }

  test("languageId: marker voting, deterministic tie-break, und fallback") {
    assert(text.languageId("der hund ist gut und das haus") == "de")
    assert(text.languageId("the cat and the dog") == "en")
    assert(text.languageId("zzz qqq") == "und")
  }

  test("tokenCount and fingerprint deterministic") {
    assert(text.tokenCount("hyperthermia ab") == 4L)
    assert(text.fingerprint("A_b") == text.fingerprint("a b"))
    assert(text.fingerprint("a b") != text.fingerprint("a c"))
  }

  test("qualityScore bounds") {
    val q = text.qualityScore("the quick brown fox jumps over the lazy dog again")
    assert(q > 0.5 && q <= 1.0)
    assert(text.qualityScore("") == 0.0)
  }
}
