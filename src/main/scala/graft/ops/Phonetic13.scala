package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q387 — phonetic (Soundex) blocking for record linkage: the classic
  * sound-alike block key (Russell 1918; Odell & Russell's census coding)
  * that survives the spelling noise exact keys and even balance buckets
  * can't — completing the linkage family's blocking toolbox next to the
  * adaptive numeric bucket (q374/q383) and the edit-distance band (q90).
  *
  * The code here is the VOWEL-SEPARATOR Soundex variant (H/W map to 0
  * like vowels — the variant classic SQL implementations ship), spelled
  * as the same four-step string pipeline in BOTH engines so the oracle
  * checks the algorithm cross-implementation:
  *
  *   1. map letters to digit classes via translate(upper(nm),
  *      'A..Z', '01230120022455012623010202');
  *   2. collapse adjacent equal codes 1–6 (one regexp per digit —
  *      DuckDB's RE2 has no backreferences, so no '(\d)\1+' shortcut);
  *   3. drop the 0s (vowel separators);
  *   4. first LETTER + next 3 codes, right-padded with 0.
  *
  * Step 2 runs before step 3, so vowel-separated repeats keep both codes
  * (canonical) while doubled letters collapse. Generated names always
  * start with a consonant, so the first letter's own code is exactly the
  * leading digit dropped in step 4 (documented fixture invariant).
  */
object Phonetic13 {

  /** The per-digit collapse chain (step 2): one regexp_replace per code
    * class. The algorithm text is identical in both engines but the
    * GLOBAL-REPLACE convention is not: Spark's regexp_replace replaces
    * every match, DuckDB's replaces only the FIRST unless passed the 'g'
    * option — a second same-code run in one name ("kamnesgar" →
    * 205502206 has runs of 5s AND 2s) stays uncollapsed without it.
    * The 3× derived-scale gate caught exactly this (±3 cross-key pairs
    * of 21k at factor 3 — invisible at the base fixtures, where no
    * colliding pair happened to straddle the broken collapse).
    */
  private def collapseSql(in: String, duck: Boolean): String =
    (1 to 6).foldLeft(in) { (acc, d) =>
      if (duck) s"regexp_replace($acc, '$d+', '$d', 'g')"
      else s"regexp_replace($acc, '$d+', '$d')"
    }

  /** Full Soundex pipeline as a SQL expression string — same four steps
    * in both engines; `duck = true` adds DuckDB's 'g' replace option
    * (see [[collapseSql]]).
    */
  private[ops] def soundexSql(nm: String, duck: Boolean = false): String = {
    val mapped =
      s"translate(upper($nm), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', " +
        "'01230120022455012623010202')"
    val collapsed = collapseSql(mapped, duck)
    val dropped = s"replace($collapsed, '0', '')"
    s"concat(upper(substring($nm, 1, 1)), " +
      s"rpad(substring($dropped, 2, 3), 3, '0'))"
  }

  private def soundex(c: String): Column = expr(soundexSql(c))

  /** Deterministic pronounceable names: three syllables picked by md5
    * nibbles (the engines' shared randomness — the q310/q320 derived-
    * replica discipline). The syllable alphabet avoids H/W/Y so the
    * variant choice above never touches a generated name, and every
    * syllable starts with a consonant.
    */
  private val syls = Seq("bal", "ben", "cor", "dan", "fel", "gar", "jol",
    "kam", "lin", "mor", "nes", "pol", "rak", "sil", "tor", "vun")

  private val sylArr = s"array(${syls.map(s => s"'$s'").mkString(",")})"
  private val sylList = s"[${syls.map(s => s"'$s'").mkString(",")}]"

  /** Spark: name from custkey via three md5 nibbles (1-based element_at). */
  private def nameExpr(key: String): String = {
    def nib(k: Int) =
      s"conv(substring(md5(concat('nm', CAST($key AS STRING))), $k, 1), 16, 10)"
    s"concat(element_at($sylArr, CAST(${nib(1)} AS INT) + 1), " +
      s"element_at($sylArr, CAST(${nib(2)} AS INT) + 1), " +
      s"element_at($sylArr, CAST(${nib(3)} AS INT) + 1))"
  }

  /** DuckDB: the same name construction (1-based list indexing). */
  private def nameSql(key: String): String = {
    def nib(k: Int) =
      s"CAST(concat('0x', substr(md5('nm' || CAST($key AS VARCHAR)), $k, 1)) AS BIGINT)"
    s"$sylList[CAST(${nib(1)} AS INT) + 1] || " +
      s"$sylList[CAST(${nib(2)} AS INT) + 1] || " +
      s"$sylList[CAST(${nib(3)} AS INT) + 1]"
  }

  /** q387 — the phonetic-blocking audit. A dirty replica perturbs each
    * name deterministically by custkey class: every 3rd key swaps ALL
    * 'a'→'o' (vowel noise — Soundex-invariant, exact match destroyed),
    * every 5th (not 3rd) replaces the FIRST consonant with 'z' (class
    * change — Soundex blocking MUST miss it, and this query MEASURES
    * that loss instead of hiding it), every 7th (not 3rd/5th) doubles
    * the final consonant (adjacent-collapse-invariant), the rest stay
    * exact. Balances are NOT perturbed, so the numeric bucket never
    * costs a true pair and the measured loss is the phonetic key's
    * alone.
    *
    * Candidate pairs come from a blocked equi-join on (nationkey,
    * Soundex code, ADAPTIVE balance bucket — the q374/SCALING_r13B
    * discipline: a Soundex code's domain is corpus-independent, so
    * soundex alone would be a fixed-domain ~n² block key; the
    * count(*)-derived bucket width pins expected block population).
    *
    * Output per perturbation class: keys, blocked pairs, true blocked
    * pairs, Soundex recall of true pairs (measured 1.0 / 1.0 / 0.0 / 1.0
    * — the first-consonant row is the honest loss), and surviving
    * exact-name pairs, the "why phonetic blocking" column: 0 for the
    * first-consonant and doubled-letter classes, and only the a-less
    * names (where the swap is a no-op, ~1/3 of the class) for the vowel
    * row, vs ~full survival in the exact class.
    */
  val q387SoundexBlocking = GraftQuery(
    "q387_soundex_blocking",
    (s, dir) => {
      val bal = round(col("c_acctbal") * 100, 0).cast("long")
      val widthFrame = Tables.customer(s, dir)
        .agg(greatest(lit(100L),
          expr("(1100000L * 64L) div count(*)")).as("width"))
      val clean = Tables.customer(s, dir).select(
        col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
        bal.as("bal"))
        .withColumn("nm", expr(nameExpr("ck")))
        .crossJoin(broadcast(widthFrame))
      val cls = when(pmod(col("ck"), lit(3)) === 0, "1_vowel_swap")
        .when(pmod(col("ck"), lit(5)) === 0, "2_first_consonant")
        .when(pmod(col("ck"), lit(7)) === 0, "3_double_last")
        .otherwise("0_exact")
      val dirty = clean.select(
        col("ck").as("dk"), col("nk").as("dnk"), col("bal").as("dbal"),
        col("width").as("dwidth"),
        when(pmod(col("ck"), lit(3)) === 0, translate(col("nm"), "a", "o"))
          .when(pmod(col("ck"), lit(5)) === 0,
            concat(lit("z"), expr("substring(nm, 2)")))
          .when(pmod(col("ck"), lit(7)) === 0,
            concat(col("nm"), expr("substring(nm, length(nm), 1)")))
          .otherwise(col("nm")).as("dnm"),
        cls.as("dcls"))
      val pairs = clean
        .withColumn("sdx", soundex("nm"))
        .withColumn("blk", expr("(bal + 100000L) div width"))
        .join(dirty
            .withColumn("dsdx", soundex("dnm"))
            .withColumn("dblk", expr("(dbal + 100000L) div dwidth")),
          col("nk") === col("dnk") && col("sdx") === col("dsdx") &&
            col("blk") === col("dblk"))
      val perClass = pairs.groupBy("dcls")
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("ck") === col("dk")).cast("long")).as("n_true_blocked"),
          sum((col("nm") === col("dnm")).cast("long")).as("n_exact_name"))
      val classSizes = dirty.groupBy("dcls")
        .agg(count(lit(1)).as("n_keys"))
      classSizes.join(perClass, Seq("dcls"), "left")
        .select(col("dcls").as("perturbation"), col("n_keys"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_true_blocked"), lit(0L)).as("n_true_blocked"),
          round(coalesce(col("n_true_blocked"), lit(0L)).cast("double") /
            col("n_keys").cast("double"), 6).as("soundex_recall"),
          coalesce(col("n_exact_name"), lit(0L)).as("n_exact_name"))
        .orderBy("perturbation")
    },
    Some {
      val sdxC = soundexSql("nm", duck = true)
      val sdxD = soundexSql("dnm", duck = true)
      s"""WITH w AS (
         |  SELECT greatest(100, (1100000 * 64) // count(*)) AS width
         |  FROM customer),
         |clean AS (
         |  SELECT c_custkey AS ck, c_nationkey AS nk,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
         |    ${nameSql("c_custkey")} AS nm
         |  FROM customer),
         |dirty AS (
         |  SELECT ck AS dk, nk AS dnk, bal AS dbal,
         |    CASE WHEN ck % 3 = 0 THEN translate(nm, 'a', 'o')
         |      WHEN ck % 5 = 0 THEN 'z' || substring(nm, 2)
         |      WHEN ck % 7 = 0 THEN nm || substring(nm, length(nm), 1)
         |      ELSE nm END AS dnm,
         |    CASE WHEN ck % 3 = 0 THEN '1_vowel_swap'
         |      WHEN ck % 5 = 0 THEN '2_first_consonant'
         |      WHEN ck % 7 = 0 THEN '3_double_last'
         |      ELSE '0_exact' END AS dcls,
         |    nm AS onm
         |  FROM clean),
         |pairs AS (
         |  SELECT c.ck, d.dk, d.dcls, c.nm, d.dnm
         |  FROM clean c JOIN dirty d
         |    ON c.nk = d.dnk
         |    AND $sdxC = $sdxD
         |    AND (c.bal + 100000) // (SELECT width FROM w)
         |      = (d.dbal + 100000) // (SELECT width FROM w)),
         |pc AS (
         |  SELECT dcls, CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(CASE WHEN ck = dk THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_true_blocked,
         |    CAST(sum(CASE WHEN nm = dnm THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_exact_name
         |  FROM pairs GROUP BY 1),
         |cs AS (
         |  SELECT dcls, CAST(count(*) AS BIGINT) AS n_keys
         |  FROM dirty GROUP BY 1)
         |SELECT cs.dcls AS perturbation, cs.n_keys,
         |  CAST(coalesce(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(pc.n_true_blocked, 0) AS BIGINT)
         |    AS n_true_blocked,
         |  round(CAST(coalesce(pc.n_true_blocked, 0) AS DOUBLE)
         |    / CAST(cs.n_keys AS DOUBLE), 6) AS soundex_recall,
         |  CAST(coalesce(pc.n_exact_name, 0) AS BIGINT) AS n_exact_name
         |FROM cs LEFT JOIN pc USING (dcls)
         |ORDER BY perturbation""".stripMargin
    })

  val all: Seq[GraftQuery] = Seq(q387SoundexBlocking)
}
