package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{SeededGen, SparkSpec}

/** Seeded property pin for q275's glob matcher: the higher-order
  * ordered-segment fold must agree with the obvious regex translation of
  * the RFC 9309 pattern grammar (`^` + quoted segments joined by `.*`,
  * full-match when `$`-anchored, prefix-match otherwise) on random
  * pattern/path pairs over a small alphabet chosen to force overlaps,
  * repeats, and empty segments. First-fit earliest-position search is
  * complete for this pattern class (an exchange argument: earliest
  * placements leave maximal room), and this spec is the executable form
  * of that claim.
  */
class RobotsPropertySpec extends AnyFunSuite with SparkSpec with SeededGen {

  // tiny alphabet maximizes collisions between segments and path content
  private val piece: Gen[String] = for {
    n <- Gen.chooseNum(0, 3)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', '/', '.'))
  } yield cs.mkString

  private val patternGen: Gen[String] = for {
    nSegs <- Gen.chooseNum(1, 4)
    segs <- Gen.listOfN(nSegs, piece)
    anchored <- Gen.oneOf(true, false)
  } yield segs.mkString("*") + (if (anchored) "$" else "")

  private val pathGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 10)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', '/', '.'))
  } yield cs.mkString

  private def refMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    val rx = body.split("\\*", -1).map(Pattern.quote).mkString(".*")
    val m = Pattern.compile("^" + rx + (if (anchored) "$" else "")).matcher(path)
    if (anchored) m.matches() else m.lookingAt()
  }

  test("globMatch agrees with the regex translation on random pattern/path pairs") {
    import spark.implicits._
    val patterns = sample(patternGen, 40, 0x9309L).distinct
    val paths = sample(pathGen, 25, 0x9309cafeL).distinct
    for (p <- patterns) {
      val anchored = p.endsWith("$")
      val body = if (anchored) p.dropRight(1) else p
      val segs = body.split("\\*", -1).toSeq
      val got = paths.toDF("path")
        .select(col("path"), Robots.globMatch(col("path"),
          typedLit(segs), lit(anchored)).as("m"))
        .as[(String, Boolean)].collect().toMap
      for (t <- paths) {
        assert(got(t) === refMatch(p, t),
          s"pattern '$p' vs path '$t': fold=${got(t)} regex=${refMatch(p, t)}")
      }
    }
  }
}
