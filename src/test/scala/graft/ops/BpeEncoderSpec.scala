package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The BPE inference contract ([[Text.bpeEncodeWord]]): applying the learned
  * merge table — rank order, leftmost-first — to a word reproduces exactly
  * the segmentation the training loop reached for that word, and behaves
  * lawfully on held-out words the trainer never saw. This is what makes
  * q139's broadcast-vocabulary application sound: encoding via the stored
  * vocab and re-encoding from the merge table are the same function.
  */
class BpeEncoderSpec extends AnyFunSuite with SparkSpec {

  private lazy val trained = Text.bpeTrain(spark, "/root/testdata/sf0.001", 5)
  private lazy val mergeTable =
    trained._1.map { case (_, pair, merged, _) => (pair, merged) }

  test("re-encoding every training word reproduces the training segmentation") {
    val rows = trained._2.collect()
    assert(rows.nonEmpty)
    var checked = 0
    rows.foreach { r =>
      val seq = r.getString(0)
      val word = seq.replace("(", "").replace(")", "")
      val syms = seq.substring(1, seq.length - 1).split("\\)\\(").toSeq
      assert(Text.bpeEncodeWord(word, mergeTable) == syms, s"word=$word")
      checked += 1
    }
    assert(checked == rows.length)
  }

  test("held-out words: lossless, symbol-closed, deterministic") {
    val mergedToks = mergeTable.map(_._2).toSet
    val heldOut = Seq("zzzzqqqq", "abcabcabc", "thethethe", "xylophonequack",
      mergeTable.head._2 * 3) // repeated first-merge product
    heldOut.foreach { w =>
      val enc = Text.bpeEncodeWord(w, mergeTable)
      assert(enc.mkString == w, s"lossy encode of $w: $enc")
      assert(enc.forall(s => s.length == 1 || mergedToks.contains(s)),
        s"$w produced a symbol outside the learned vocabulary: $enc")
      assert(Text.bpeEncodeWord(w, mergeTable) == enc)
    }
  }

  test("rank order and leftmost-first tie-breaking are honored") {
    // rank order: (a)(b)→ab must exist before (ab)(c)→abc can fire
    val chain = Seq(("(a)(b)", "ab"), ("(ab)(c)", "abc"))
    assert(Text.bpeEncodeWord("abc", chain) == Seq("abc"))
    assert(Text.bpeEncodeWord("abc", chain.reverse) == Seq("ab", "c"))
    // leftmost-first: (a)(a)→aa on "aaa" merges the LEFT pair
    assert(Text.bpeEncodeWord("aaa", Seq(("(a)(a)", "aa"))) == Seq("aa", "a"))
    // and scanning continues after a merge, non-overlapping
    assert(Text.bpeEncodeWord("aaaa", Seq(("(a)(a)", "aa"))) == Seq("aa", "aa"))
    assert(Text.bpeEncodeWord("", mergeTable).isEmpty)
  }
}
