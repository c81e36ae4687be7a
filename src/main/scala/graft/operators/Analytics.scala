package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/**
 * OLAP queries over the star schema — the analytical side of the engine.
 *
 * Determinism contract with the DuckDB oracle: money sums go through
 * decimal (exact, order-independent) and only then to double; timestamps
 * are emitted as epoch-microsecond longs.
 *
 * Scale notes: dims (region/nation/customer/supplier/part) are broadcast —
 * at 100 TB only fact tables shuffle, and only when an agg/join key
 * requires it. AQE handles skew.
 */
object Analytics {
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** #10 — TPC-H Q1-style pricing summary: one map-side-combinable agg. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** #11 — revenue top-10: broadcast customer dim, shuffle only facts. */
  def q3TopkRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** #12 — per-nation revenue: 5-way join, all dims broadcast. */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("revenue"))
  }

  /** #13 — top-2 orders per customer (window rank; ties broken by key). */
  def qWindowTopn(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
  }

  /** #14 — sessionization: a new session starts after a >30-min gap.
    * Single shuffle on user_id; running sum stays within the window. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables.events(s, dir)
      .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** #35 — exact interpolated percentiles (p50/p95 of value per
    * event_type), computed from rank arithmetic so both engines produce
    * bit-identical doubles (approx sketches would not oracle-match).
    * One shuffle; the rank window and the final agg share it. */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    val byVal = Window.partitionBy("event_type").orderBy("value")
    val all = Window.partitionBy("event_type")
    def interp(q: Double): Column = {
      val pos = (col("n") - 1) * lit(q)
      val loRn = floor(pos).cast("long") + 1
      val frac = pos - floor(pos)
      val lo = max(when(col("rn") === loRn, col("value")))
      val hi = max(when(col("rn") === loRn + 1, col("value")))
      lo + frac.cast("double") * (coalesce(hi, lo) - lo)
    }
    val ranked = Tables.events(s, dir)
      .withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(all))
    ranked.groupBy(col("event_type"), col("n"))
      .agg(interp(0.5).as("p50"), interp(0.95).as("p95"))
      .select(col("event_type"), col("n").as("n_rows"), col("p50"), col("p95"))
  }

  /** #39 — TPC-H Q6-style selective revenue: every predicate reaches the
    * scan (date range, discount band, quantity cap), so at 100 TB this
    * reads only matching row groups and aggregates map-side to one row. */
  def q6Selective(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * col("l_discount").cast("decimal(3,2)"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  /** #40 — multi-level ROLLUP aggregate: (flag, status), (flag), () in
    * one pass — Spark expands grouping sets without re-reading the
    * input. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))

  /** #43 — funnel: users who did view → click → purchase in strict
    * timestamp order; per-stage first-times via one conditional-min
    * window pass, no self-joins. */
  def qFunnel(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_purchase"))
      .select(col("user_id"),
        col("t_view").isNotNull.cast("int").as("did_view"),
        (col("t_view") < col("t_click")).cast("int").as("view_then_click"),
        (col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
          .cast("int").as("full_funnel"))

  /** #44 — sketch path: HyperLogLog approximate distinct users per
    * event_type. No DuckDB oracle (sketch internals differ by engine) —
    * accuracy vs exact is spec-asserted instead; at 100 TB this is the
    * only affordable distinct-count. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("cnt"))

  /** #15 — semi-structured prop extraction from events.props JSON. */
  def qJsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
      .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec("value")).cast("double").as("sum_value"))
}
