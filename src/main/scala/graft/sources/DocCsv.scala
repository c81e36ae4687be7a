package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/**
 * CSV ingestion plumbing for the documents table — the other
 * interchange format corpora arrive in (tabular exports, spreadsheet
 * dumps). Same contract as [[DocJsonl]]: the registered query is a
 * serialize → parse ROUNDTRIP with an identity oracle (the
 * ts_codec_roundtrip pattern) — each row renders as one CSV line via
 * `to_csv` (quoting engaged automatically for delimiter/quote bytes in
 * the payload), is parsed back through `from_csv` with the explicit
 * schema, and the PARSED fields are emitted, so any quoting, escaping,
 * type-coercion or column-order mangling breaks the oracle hash
 * against the raw table. Both directions are per-row codegen
 * expressions: zero shuffles, zero joins — a pure map-side ingest
 * stage at 100 TB.
 */
object DocCsv {

  /** Explicit null/empty representations on BOTH directions: with the
    * defaults, from_csv parses a quoted-empty field (`""`) as NULL, so
    * a document with empty text/lang/source would round-trip to NULL
    * (and md5(NULL) = NULL breaks the identity oracle). Writing NULL
    * as `\N` and reading `\N` back as NULL keeps the two cases — empty
    * string and absent value — distinct through the roundtrip. */
  private val WriteOpts =
    Map("nullValue" -> "\\N", "emptyValue" -> "\"\"")
  private val ReadOpts =
    Map("nullValue" -> "\\N", "emptyValue" -> "")

  /** #248 — CSV roundtrip: docs → CSV lines → parsed docs; text
    * travels as md5 (the DocJsonl convention — the hash is what the
    * oracle compares; mangled bytes change it). */
  def roundtrip(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(to_csv(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")), WriteOpts.asJava).as("line"))
      .select(from_csv(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"),
        ReadOpts).as("d"))
      .select(col("d.doc_id").as("doc_id"), md5(col("d.text")).as("text_md5"),
        col("d.lang").as("lang"), col("d.source").as("source"),
        col("d.n_chars").as("n_chars"))
}
