package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-enforced IO for entry batches — the interchange formats a user
 * feeds into / reads out of [[graft.core.HelixStore]]. Binary columns
 * travel base64-encoded in the text formats (csv/json), raw in parquet.
 *
 * Scale note: all readers produce a plain DataFrame with the canonical
 * entry schema, so everything downstream (put, codec, operators) is
 * format-agnostic; writers emit whatever partition layout the caller
 * arranged — no hidden coalesce.
 */
object EntryIO {
  val EntrySchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("value", BinaryType, nullable = true)))

  private val TextSchema = StructType(Seq(
    StructField("key_b64", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("value_b64", StringType, nullable = true)))

  private def fromText(df: DataFrame): DataFrame =
    df.select(unbase64(col("key_b64")).as("key"), col("ts"),
      unbase64(col("value_b64")).as("value"))

  private def toText(df: DataFrame): DataFrame =
    df.select(base64(col("key")).as("key_b64"), col("ts"),
      base64(col("value")).as("value_b64"))

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.schema(EntrySchema).parquet(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.select(col("key"), col("ts"), col("value")).write.mode("append").parquet(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.schema(EntrySchema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.select(col("key"), col("ts"), col("value")).write.mode("append").orc(path)

  def readCsv(s: SparkSession, path: String): DataFrame =
    fromText(s.read.schema(TextSchema).option("header", "true").csv(path))

  def writeCsv(df: DataFrame, path: String): Unit =
    toText(df).write.mode("append").option("header", "true").csv(path)

  def readJson(s: SparkSession, path: String): DataFrame =
    fromText(s.read.schema(TextSchema).json(path))

  def writeJson(df: DataFrame, path: String): Unit =
    toText(df).write.mode("append").json(path)
}
