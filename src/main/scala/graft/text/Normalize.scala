package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Entry

/** Unicode NFC normalization (SURVEY.md Q216) — the canonicalization
  * step that belongs BEFORE every dedup/hash stage in a text pipeline:
  * "é" as one code point and "e"+U+0301 are the same text but different
  * bytes, so un-normalized corpora leak duplicates past exact dedup
  * (Q60), fingerprints (Q71) and shingle hashing (Q61). The engine ships
  * `nfc_normalize` as a codegen'd Catalyst expression
  * ([[graft.functions.NfcNormalize]], backed by the JDK's
  * `java.text.Normalizer` — the Q198/Q199 no-external-library argument)
  * registered under the SAME NAME DuckDB uses, so the oracle SQL runs
  * VERBATIM on both engines.
  *
  * Proof shape: the oracle's `nfc_normalize` is utf8proc — an
  * INDEPENDENT implementation of UAX #15 — so md5(NFC(text)) pins two
  * unrelated conformance implementations against each other over the
  * whole corpus: a standards bake-off, not a formula replay (most
  * oracles re-derive our own arithmetic; this one cannot be satisfied
  * by a cancelling bug pair on our side). The fixture text may already
  * be NFC, so a DECOMPOSED tail (e+COMBINING ACUTE, a+COMBINING RING)
  * is appended per doc — both engines append the same code points via
  * chr() — guaranteeing every row exercises composition: the normalized
  * length must shrink by exactly 2.
  *
  * Scale posture: a pure codegen'd projection (no UDF, no shuffle
  * before the output sort); the normalize-then-hash chain is what
  * Q60/Q71 prepend at 100 TB — one pass, then the usual hash group.
  */
object Normalize {

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** The SQL, parameterized on how the decomposed tail is spelled:
    * DuckDB `chr()` is code-point so the oracle uses chr(); Spark's
    * `chr` is mod-256 ASCII (the q206 lesson), so the twin embeds the
    * combining marks as a literal. Everything else (||, length, md5,
    * and — via GraftExtensions — nfc_normalize) resolves identically. */
  private def sql(tail: String) =
    s"""WITH t AS (SELECT doc_id,
      |             text || $tail AS aug,
      |             nfc_normalize(text) = text AS already_nfc
      |           FROM documents)
      |SELECT doc_id, CAST(length(aug) AS BIGINT) AS n_chars_in,
      |  CAST(length(nfc_normalize(aug)) AS BIGINT) AS n_chars_nfc,
      |  already_nfc, md5(nfc_normalize(aug)) AS nfc_md5
      |FROM t ORDER BY doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    // NFC canonicalization (see object doc): JDK Normalizer vs DuckDB's
    // utf8proc, hash-compared over every doc through one codegen'd
    // projection. Map-only, no shuffle before the output sort.
    Entry("q216_unicode_nfc",
      sql("chr(101) || chr(769) || chr(97) || chr(778)")) { (s, d) =>
      // the DECOMPOSED tail as explicit escapes (an editor could silently
      // NFC-normalize a raw source literal, diverging from the oracle's
      // chr(101)||chr(769)||chr(97)||chr(778))
      val aug = concat(col("text"), lit("e\u0301a\u030A"))
      T(s, d, "documents")
        .select(col("doc_id"),
          length(aug).cast("bigint").as("n_chars_in"),
          length(call_function("nfc_normalize", aug)).cast("bigint").as("n_chars_nfc"),
          (call_function("nfc_normalize", col("text")) === col("text")).as("already_nfc"),
          md5(encode(call_function("nfc_normalize", aug), "UTF-8")).as("nfc_md5"))
        .orderBy(col("doc_id"))
    }.sqlTwin(sql("'e\u0301a\u030A'"))
  )
}
