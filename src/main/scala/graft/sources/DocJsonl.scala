package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/**
 * JSONL ingestion plumbing for the documents table — the interchange
 * format every training-data pipeline actually receives corpora in.
 * The registered query is a serialize → parse ROUNDTRIP with an
 * identity oracle (the ts_codec_roundtrip pattern): each row becomes
 * one JSON line via `to_json`, is parsed back through `from_json` with
 * the explicit schema, and the PARSED fields are emitted — any
 * mangling (encoding, quoting, schema drift, type coercion) breaks the
 * oracle hash against the raw table. Both steps are per-row codegen
 * expressions: zero shuffles, zero joins; at 100 TB this is a pure
 * map-side ingest stage.
 */
object DocJsonl {
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** #165 — JSONL roundtrip: docs → JSON lines → parsed docs; output
    * the parsed fields (text as md5 — the hash travels through the
    * oracle, the full text would too but hashes compare smaller). */
  def roundtrip(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("line"))
      .select(from_json(col("line"), DocSchema).as("d"))
      .select(col("d.doc_id").as("doc_id"), md5(col("d.text")).as("text_md5"),
        col("d.lang").as("lang"), col("d.source").as("source"),
        col("d.n_chars").as("n_chars"))
}
