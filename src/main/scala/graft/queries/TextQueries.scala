package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.functions.GraftFunctions

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language ID, fingerprinting — the text half of an
  * LLM-data-pipeline (extension phase, SURVEY §7.6).
  *
  * Counting uses the replace-trick `(len(t) - len(replace(t, m, ''))) / len(m)`
  * so the identical ANSI SQL runs in Catalyst and DuckDB.
  */
object TextQueries extends QueryPack {

  private def occurrences(marker: String): String = {
    val m = marker.replace("'", "''")
    s"(LENGTH(text) - LENGTH(REPLACE(text, '$m', ''))) / ${marker.length}"
  }

  /** Whitespace token count (single-space-joined corpus). */
  private val tokens = s"(${occurrences(" ")} + 1)"

  private def shared(name: String, sql: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql))

  // ----------------------------------------------------------- stats
  // Per-source corpus statistics + quality score: token count, stopword
  // ratio, punctuation ratio, length buckets. Quality = weighted per-row
  // double arithmetic (deterministic), aggregated through exact decimals.
  private val statsSql = s"""
    |SELECT source,
    |  COUNT(*) AS n_docs,
    |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    |  CAST(SUM($tokens) AS BIGINT) AS total_tokens,
    |  CAST(MIN($tokens) AS BIGINT) AS min_tokens,
    |  CAST(MAX($tokens) AS BIGINT) AS max_tokens,
    |  COUNT(CASE WHEN $tokens >= 50 THEN 1 END) AS n_long_docs,
    |  ${dsum(s"(${occurrences(" the ")}) * 1.0 / $tokens", 6)} AS stopword_ratio_sum,
    |  ${dsum(s"""
      CASE WHEN $tokens BETWEEN 20 AND 80 THEN 0.5 ELSE 0.0 END
      + CASE WHEN ${occurrences(" the ")} > 0 THEN 0.3 ELSE 0.0 END
      + CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 0.2 ELSE 0.0 END""", 6)}
    |    AS quality_sum
    |FROM documents
    |GROUP BY source
    |ORDER BY source
    |""".stripMargin.trim

  // ---------------------------------------------------------- langid
  // Stopword-marker scoring per language; deterministic argmax tiebreak.
  private def score(markers: Seq[String]): String =
    markers.map(occurrences).mkString("(", " + ", ")")

  private val sEn = score(Seq(" the ", " and ", " of "))
  private val sDe = score(Seq(" der ", " und ", " die "))
  private val sEs = score(Seq(" el ", " los ", " que "))
  private val sFr = score(Seq(" le ", " les ", " des "))

  private val langidSql = s"""
    |WITH scored AS (
    |  SELECT lang AS labeled_lang,
    |    CASE
    |      WHEN $sEn >= $sDe AND $sEn >= $sEs AND $sEn >= $sFr AND $sEn > 0 THEN 'en'
    |      WHEN $sDe >= $sEs AND $sDe >= $sFr AND $sDe > 0 THEN 'de'
    |      WHEN $sEs >= $sFr AND $sEs > 0 THEN 'es'
    |      WHEN $sFr > 0 THEN 'fr'
    |      ELSE 'unknown'
    |    END AS predicted_lang
    |  FROM documents)
    |SELECT predicted_lang, labeled_lang, COUNT(*) AS n_docs
    |FROM scored
    |GROUP BY predicted_lang, labeled_lang
    |ORDER BY predicted_lang, labeled_lang
    |""".stripMargin.trim

  // ------------------------------------------------------ fingerprint
  // Winnowing fingerprint via the native codegen'd expression; no SQL
  // oracle exists for it => driver records the rows-only check. The query
  // is still deterministic: collision-grouped fingerprints find near-dup
  // prefixes share (window-min hashes collide for heavily-overlapping docs).
  private def fingerprint(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.registerAll(s, dir)
    s.sql("""
      |SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      |FROM (SELECT doc_id, doc_fingerprint(text, 16) AS fp FROM documents)
      |GROUP BY fp
      |HAVING COUNT(*) > 1
      |ORDER BY n_docs DESC, fp
      |LIMIT 100
      |""".stripMargin.trim)
  }

  // ------------------------------------------------- token frequency
  // Top-50 corpus tokens: explode + count + deterministic top-k. The
  // Spark side explodes via split(); the oracle unnests string_split —
  // same token definition (single-space corpus).
  private def tokenFreq(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(50)
  }

  private val tokenFreqOracle = """
    |SELECT token, COUNT(*) AS n_occurrences
    |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    |WHERE length(token) > 0
    |GROUP BY token
    |ORDER BY n_occurrences DESC, token
    |LIMIT 50
    |""".stripMargin.trim

  // --------------------------------------------- BPE-ish token counts
  // Subword-style tokenization via the classic pre-tokenizer regex
  // shape: letter runs | digit runs (capped at 3, GPT-2-style) |
  // single non-alphanumeric marks. Counted per doc, aggregated per
  // source next to the whitespace count, so the two tokenizer costs are
  // directly comparable. The pattern uses only portable regex syntax,
  // so Spark (Java regex) and DuckDB (RE2) tokenize identically.
  private val bpePattern = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 ]"

  private def tokenBpe(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.load(s, dir, "documents")
      .select(col("source"),
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
          .cast("long").as("bpe"),
        size(split(col("text"), " ")).cast("long").as("ws"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("bpe")).cast("long").as("bpe_tokens"),
        sum(col("ws")).cast("long").as("ws_tokens"),
        max(col("bpe")).as("max_bpe_doc"))
      .orderBy("source")
  }

  private val tokenBpeOracle = s"""
    |WITH t AS (
    |  SELECT source,
    |    CAST(len(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS bpe,
    |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws
    |  FROM documents)
    |SELECT source, COUNT(*) AS n_docs,
    |  CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
    |  CAST(SUM(ws) AS BIGINT) AS ws_tokens,
    |  MAX(bpe) AS max_bpe_doc
    |FROM t
    |GROUP BY source
    |ORDER BY source
    |""".stripMargin.trim

  override val all: Seq[Q] = Seq(
    shared("text_stats", statsSql),
    shared("text_langid", langidSql),
    Q("text_fingerprint", fingerprint, None),
    Q("text_token_freq", tokenFreq, Some(tokenFreqOracle)),
    Q("text_token_bpe", tokenBpe, Some(tokenBpeOracle)),
  )
}
