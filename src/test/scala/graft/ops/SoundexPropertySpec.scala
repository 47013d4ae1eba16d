package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property pin for q387's Soundex: the SQL pipeline (translate →
  * per-digit run collapse → vowel drop → pad) is cross-checked against an
  * INDEPENDENT imperative character-walk implementation of the same
  * vowel-separator variant, over 500 deterministic pseudo-random
  * letter strings — the defense-in-depth for exactly the bug class the
  * 3× gate caught (a replace-convention difference that regex chains can
  * hide): if either side's regex semantics drift, the walk disagrees.
  */
class SoundexPropertySpec extends AnyFunSuite with SparkSpec {

  /** Reference: direct single-pass walk, no regex anywhere. */
  private def refSoundex(nm: String): String = {
    val codes = "01230120022455012623010202"
    def code(c: Char): Char = codes(c.toUpper - 'A')
    val mapped = nm.map(code)
    // collapse adjacent equal codes 1-6 (0s break nothing here: they are
    // kept, so vowel-separated repeats survive — matching the SQL chain,
    // which collapses digit runs BEFORE dropping 0s)
    val collapsed = mapped.foldLeft(new StringBuilder) { (sb, c) =>
      if (sb.nonEmpty && sb.last == c && c != '0') sb else sb.append(c)
    }.toString
    val dropped = collapsed.filter(_ != '0')
    val tail = dropped.drop(1).padTo(3, '0').take(3)
    s"${nm.head.toUpper}$tail"
  }

  test("SQL Soundex pipeline equals the imperative reference on 500 " +
    "random letter strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    // letters only, starting with a consonant (the documented fixture
    // invariant q387's step 4 relies on)
    val consonants = "bcdfgjklmnpqrstvxz"
    val letters = "abcdefgijklmnopqrstuvxz" // no h/w/y, per the fixture
    val names = (1 to 500).map { _ =>
      val len = 3 + rnd.nextInt(9)
      val head = consonants(rnd.nextInt(consonants.length))
      val tail = (1 until len)
        .map(_ => letters(rnd.nextInt(letters.length))).mkString
      s"$head$tail"
    }.distinct
    val got = names.toDF("nm")
      .selectExpr("nm", s"${Phonetic13.soundexSql("nm")} AS sdx")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    names.foreach { n =>
      assert(got(n) == refSoundex(n),
        s"$n: sql=${got(n)} ref=${refSoundex(n)}")
    }
  }

  test("LSH planner squaring chains equal math.pow over the bin grid") {
    import spark.implicits._
    // evaluate the exact CASE chains q399 splices, for every (bin, r, b)
    val rows = (0 to 20).flatMap(bin =>
      Seq((32, 2), (16, 4), (8, 8), (4, 16)).map { case (b, r) =>
        (bin, b, r)
      }).toDF("bin", "b", "r")
    val sExpr = "least((CAST(bin AS DOUBLE) + 0.5) / 20.0, 1.0)"
    def chain(base: String, pick: String, exps: Seq[Int]): String = {
      def p(e: Int): String =
        if (e == 1) s"($base)" else { val h = p(e / 2); s"($h * $h)" }
      exps.map(e => s"WHEN $pick = $e THEN ${p(e)}")
        .mkString("CASE ", " ", " ELSE NULL END")
    }
    val srExpr = chain(sExpr, "r", Seq(2, 4, 8, 16))
    val pExpr = s"(1.0 - ${chain(s"(1.0 - ($srExpr))", "b", Seq(4, 8, 16, 32))})"
    val out = rows.selectExpr("bin", "b", "r", s"$pExpr AS p").collect()
    out.foreach { x =>
      val (bin, b, r, p) =
        (x.getInt(0), x.getInt(1), x.getInt(2), x.getDouble(3))
      val s = math.min((bin + 0.5) / 20.0, 1.0)
      val expect = 1.0 - math.pow(1.0 - math.pow(s, r), b)
      assert(math.abs(p - expect) < 1e-12, s"bin=$bin b=$b r=$r: $p vs $expect")
    }
  }
}
