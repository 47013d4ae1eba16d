package graft.ddl

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ddl.DdlRewriter._

/** Property widening of DdlRewriterSpec's directed boundary cases: for
  * ARBITRARY identifiers from the supported alphabet, `versionSuffix`
  * must rewrite exactly the exact-boundary `db.name` occurrences and
  * leave every decoy embedding (prefix sibling, suffix sibling,
  * underscore extension) untouched — the property form of the
  * `staging_db.sales` / `db.sales2` regressions.
  */
class DdlRewriterPropertySpec extends AnyFunSuite with graft.SeededGen {

  private val genIdent: Gen[String] = for {
    h <- Gen.alphaChar
    n <- Gen.choose(0, 12)
    t <- Gen.listOfN(n, Gen.frequency(
           8 -> Gen.alphaNumChar, 2 -> Gen.const('_')))
  } yield (h :: t).mkString

  test("property: versionSuffix rewrites exact-boundary occurrences only") {
    val cases = sample(Gen.zip(genIdent, genIdent, genIdent), 40, 0xDD1L)
    assert(cases.size >= 35)
    cases.foreach { case (db, name, extra) =>
      val ver = "__v7"
      val target = s"$db.$name"
      // decoys: prefixed db, suffixed name, underscore extension — each
      // embeds the target string without being an exact identifier match
      val ddl = s"CREATE TABLE $target (x Int) AS SELECT * FROM " +
        s"x$target JOIN $target$extra ON 1=1 JOIN ${target}_$extra ON 1=1 " +
        s"WHERE y IN (SELECT z FROM $target)"
      val out = versionSuffix(ddl, db, name, ver)
      assert(out.contains(s"CREATE TABLE $target$ver "), out)
      assert(out.contains(s"FROM x$target JOIN"), out)
      assert(out.contains(s"JOIN $target$extra ON"), out)
      assert(out.contains(s"JOIN ${target}_$extra ON"), out)
      assert(out.endsWith(s"(SELECT z FROM $target$ver)"), out)
      // decoys never gain the suffix
      assert(!out.contains(s"x$target$ver"), out)
      assert(!out.contains(s"${target}_$extra$ver"), out)
    }
  }

  test("property: retargetAtOldLocal renames exact `<tbl>_local` refs only") {
    val cases = sample(Gen.zip(genIdent, genIdent), 40, 0xDD2L)
    assert(cases.size >= 35)
    cases.foreach { case (tbl, extra) =>
      val ddl = s"Distributed('c','db','${tbl}_local', k) " +
        s"-- $extra${tbl}_local ${tbl}_local$extra ${tbl}_locals"
      val out = retargetAtOldLocal(ddl, tbl)
      assert(out.contains(s"'${tbl}_local_old'"), out)
      assert(out.contains(s"$extra${tbl}_local "), out)
      assert(out.contains(s"${tbl}_local$extra"), out)
      assert(out.contains(s"${tbl}_locals"), out)
      assert(!out.contains(s"$extra${tbl}_local_old"), out)
      assert(!out.contains(s"${tbl}_locals_old"), out)
    }
  }
}
