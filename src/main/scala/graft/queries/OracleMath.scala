package graft.queries

/** DuckDB-side emulation of Java's wrapping 64-bit arithmetic, shared by
  * every oracle that re-derives a native hash kernel
  * ([[graft.functions.FingerprintKernel]] and the dedup tier built on
  * it). DuckDB BIGINT overflow throws, so values live as UBIGINT and
  * every multiply/add routes through HUGEINT and reduces mod 2^64. A
  * full 64×64 product can overflow even HUGEINT, so it splits at 32
  * bits: a*b ≡ a_lo*b + ((a_hi*b mod 2^32) << 32), each term ≤ 2^96.
  *
  * Caveat shared by all users (documented at the fingerprint oracle):
  * the string hash reads characters via ord(), identical to UTF-8 bytes
  * for the all-ASCII synthetic corpus; a non-ASCII regeneration would
  * surface as a loud value mismatch, not silent agreement.
  */
private[queries] object OracleMath {
  val m64 = "18446744073709551616" // 2^64

  def u64(x: String): String =
    s"CAST(CAST(($x) AS HUGEINT) % $m64 AS UBIGINT)"

  def mul64(a: String, b: String): String =
    s"CAST(((CAST(($a) AS HUGEINT) % 4294967296) * CAST(($b) AS HUGEINT)" +
      s" + ((CAST(($a) AS HUGEINT) // 4294967296) * CAST(($b) AS HUGEINT)" +
      s" % 4294967296) * 4294967296) % $m64 AS UBIGINT)"

  /** The splitmix64 tail (FingerprintKernel.mix) as staged CTEs over a
    * source CTE exposing `keys` plus a UBIGINT column `vcol`; emits
    * `pfx1..pfx3` and a final `pfx` CTE with the mixed value as `out`.
    * Staged rather than nested because mul64 references its argument
    * twice — inlining would blow the SQL up 8× per mix.
    */
  def mixCtes(pfx: String, src: String, keys: Seq[String],
      vcol: String = "v", out: String = "h"): String = {
    val kc = if (keys.isEmpty) "" else keys.mkString("", ", ", ", ")
    s"""|${pfx}1 AS (SELECT $kc${u64(s"CAST($vcol AS HUGEINT) + 11400714819323198485")} AS z FROM $src),
        |${pfx}2 AS (SELECT $kc${mul64("xor(z, z >> 30)", "CAST(13787848793156543929 AS UBIGINT)")} AS z FROM ${pfx}1),
        |${pfx}3 AS (SELECT $kc${mul64("xor(z, z >> 27)", "CAST(10723151780598845931 AS UBIGINT)")} AS z FROM ${pfx}2),
        |$pfx AS (SELECT ${kc}xor(z, z >> 31) AS $out FROM ${pfx}3)""".stripMargin
  }

  /** Pre-mix polynomial hash (base 1000003 over the characters' UTF-8
    * bytes via ord(); see the ASCII caveat above) of string column
    * `wcol` as a UBIGINT expression. Empty string = 0, matching the
    * kernel's zero accumulator (list_reduce refuses empty lists).
    */
  def polySql(wcol: String): String =
    s"CASE WHEN length($wcol) = 0 THEN CAST(0 AS UBIGINT) ELSE " +
      s"CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      s"list_transform(string_split($wcol, ''), ch -> CAST(ord(ch) AS HUGEINT))), " +
      s"(acc, b) -> (acc * 1000003 + b) % $m64) AS UBIGINT) END"

  /** Signed view of a UBIGINT column (two's complement), for comparing
    * against Spark's signed BIGINT values with plain MIN/=.
    */
  def signed(ucol: String): String =
    s"CAST(CAST($ucol AS HUGEINT) - CASE WHEN $ucol >= 9223372036854775808 " +
      s"THEN $m64 ELSE 0 END AS BIGINT)"
}
