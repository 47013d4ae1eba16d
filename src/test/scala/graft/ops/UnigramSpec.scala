package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins q299's deterministic Viterbi lattice DP: the lexicographic
  * objective (fewest pieces, then largest total frequency, then earliest
  * split) on hand-built vocabularies, including the tie cases that define
  * cross-engine determinism.
  */
class UnigramSpec extends AnyFunSuite {

  test("fewest pieces wins over higher score") {
    val vocab = Map("a" -> 100L, "b" -> 100L, "ab" -> 1L)
    // a|b scores 200 with 2 pieces; ab scores 1 with 1 piece -> ab wins
    assert(Unigram.viterbiSegment("ab", vocab) == ((1, 1L, "ab")))
  }

  test("among equal piece counts, larger total frequency wins") {
    val vocab = Map("ab" -> 2L, "cd" -> 2L, "abc" -> 1L, "d" -> 9L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L)
    // ab|cd = (2, 4); abc|d = (2, 10) -> abc|d
    assert(Unigram.viterbiSegment("abcd", vocab) == ((2, 10L, "abc|d")))
  }

  test("full tie resolves to the earliest split point") {
    val vocab = Map("a" -> 5L, "aa" -> 5L)
    // a|aa and aa|a both (2, 10); ascending-i first-wins -> a|aa
    assert(Unigram.viterbiSegment("aaa", vocab) == ((2, 10L, "a|aa")))
  }

  test("single-letter coverage always segments, even at zero frequency") {
    val vocab = ('a' to 'z').map(_.toString -> 0L).toMap
    val (p, sc, seg) = Unigram.viterbiSegment("zyx", vocab)
    assert(p == 3 && sc == 0L && seg == "z|y|x")
  }

  test("pieces longer than 4 are never used (lattice arity bound)") {
    val vocab = Map("abcde" -> 1000L, "ab" -> 1L, "cde" -> 1L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L, "e" -> 1L)
    // the 5-char piece is unreachable by the i >= j-4 lattice
    assert(Unigram.viterbiSegment("abcde", vocab) == ((2, 2L, "ab|cde")))
  }
}
