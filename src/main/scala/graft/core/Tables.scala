package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS) which Spark 4 only reads as a
    * long (nanos) under the legacy conf; normalize back to a timestamp
    * column (µs precision — the data is µs-aligned). */
  /** Set the nanos-as-long legacy conf once (idempotent guard: mutating
    * session conf on every table read shows up as churn in plan caches). */
  private def ensureNanosConf(s: SparkSession): Unit = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    try { if (s.conf.getOption(k).forall(_ != "true")) s.conf.set(k, "true") }
    catch { case _: Throwable => () }
    // The NTZ→TIMESTAMP re-tag below (and eventsRange's NTZ bound
    // literals) is value-preserving ONLY under a UTC session; pin it
    // here so an external caller with a non-UTC session can't get
    // silently shifted timestamps. All in-repo entrypoints already set
    // UTC, so for them this is a no-op.
    val tz = "spark.sql.session.timeZone"
    try { if (s.conf.getOption(tz).forall(_ != "UTC")) s.conf.set(tz, "UTC") }
    catch { case _: Throwable => () }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosConf(s)
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // µs parquet written with isAdjustedToUTC=false reads as NTZ; all
      // engine sessions run in UTC, so the cast is a pure re-tag (the
      // stored µs value is unchanged and unix_micros agrees with DuckDB).
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events with a time-range predicate applied BEFORE the nanos→micros
    * conversion, so it reaches the parquet scan as a pushed filter on
    * the raw int64 column (a filter on the converted timestamp cannot
    * be pushed). Bounds are epoch-µs; [lo, hi). */
  def eventsRange(s: SparkSession, d: String,
      loUs: Option[Long], hiUs: Option[Long]): DataFrame = {
    ensureNanosConf(s)
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        val lo = loUs.map(us => col("ts") >= us * 1000L).getOrElse(lit(true))
        val hi = hiUs.map(us => col("ts") < us * 1000L).getOrElse(lit(true))
        df.filter(lo && hi)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Bound literals fold to NTZ constants (UTC sessions), so the
        // comparison still reaches the scan as a pushed INT64 filter.
        def ntz(us: Long) = timestamp_micros(lit(us)).cast("timestamp_ntz")
        val lo = loUs.map(us => col("ts") >= ntz(us)).getOrElse(lit(true))
        val hi = hiUs.map(us => col("ts") < ntz(us)).getOrElse(lit(true))
        df.filter(lo && hi)
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        val lo = loUs.map(us => col("ts") >= timestamp_micros(lit(us))).getOrElse(lit(true))
        val hi = hiUs.map(us => col("ts") < timestamp_micros(lit(us))).getOrElse(lit(true))
        df.filter(lo && hi)
    }
  }

  /** Register every test table as a temp view so the whole engine is
    * reachable from plain `spark.sql` (events gets the normalized µs
    * timestamp column). */
  def registerAll(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => apply(s, dir, n).createOrReplaceTempView(n))
    events(s, dir).createOrReplaceTempView("events")
  }

  /** Epoch-µs of a UTC midnight date literal (for range bounds). */
  def dayUs(date: String): Long =
    java.time.Instant.parse(date + "T00:00:00Z").toEpochMilli * 1000L

  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
