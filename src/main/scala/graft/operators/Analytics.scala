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
    * event_type), TWO-PHASE rank selection so no window ever sees a
    * whole group (a per-event_type window would funnel the entire fact
    * table into #event_type tasks at scale):
    *  1. per-group (n, min, max) — one map-side-combinable agg;
    *  2. equal-width bucket histogram per group (B=256) — the only
    *     full-data pass, and it combines map-side to <= B rows/group;
    *  3. prefix-sum offsets over the <= B bucket rows per group;
    *  4. the 4 target ranks (lo/hi for each quantile) locate their
    *     bucket by offset arithmetic, and ONLY rows of those <= 4
    *     buckets per group (~4/B of the data) are shuffled and ranked
    *     within-bucket to extract the k-th smallest value.
    * The interpolation arithmetic is unchanged, so the oracle's doubles
    * are still bit-identical. (Degenerate all-equal-values groups fall
    * into one bucket; rank extraction there is bounded by the group's
    * duplicate count — recursing the bucketing would bound it further.)
    *
    * Phases 1–3 are EAGER (two collect jobs whose results fold back as
    * literals); only phase 4's bounded-bucket extraction rides the
    * returned lazy frame. Nothing is cached — callers need no
    * unpersist discipline. */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    val B = 256
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    // The phase frames are bounded by the EVENT-TYPE DOMAIN (the former
    // broadcast(stats)/cached-histogram design carried the same
    // boundedness assumption), so they COLLECT and fold back as
    // literals — the kmeans/rebalance literal-plan discipline (r21):
    // per-group stats and the ≤ groups×B histogram move to the driver,
    // rank location becomes the identical long/double arithmetic there,
    // and both persisted fact-wide frames disappear — at 100 TB a cache
    // write of the corpus costs more than the one extra columnar scan
    // this takes (guide §5), and the job count drops ~3x.
    val statRows = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"), min("value").as("mn"), max("value").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    if (statRows.isEmpty) // empty fact: same empty frame the old plan made
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type STRING, n_rows BIGINT, p50 DOUBLE, p95 DOUBLE"))
    def byEt(f: ((String, Long, Double, Double)) => Column): Column =
      statRows.tail.foldLeft(f(statRows.head)) { (acc, st) =>
        when(col("event_type") === st._1, f(st)).otherwise(acc) }
    // the SAME bucket expression with mn/mx as per-group literals — no
    // broadcast join under either fact scan
    val bucketExpr = byEt { case (_, _, mn, mx) =>
      if (mx == mn) lit(0)
      else least(lit(B - 1),
        floor((col("value") - lit(mn)) / lit(mx - mn) * B).cast("int")) }
    val bucketed = ev.withColumn("bucket", bucketExpr)
    val hist = bucketed.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // driver-side rank location — the arithmetic the old offs/targets/
    // located frames ran, on the same longs: bucket-ascending prefix
    // sums, k = floor((n−1)·q)+1 and successor (successors past n
    // drop), a rank lands in the bucket covering (off, off+c]
    val located: Seq[(String, String, Int, Long)] = statRows.toSeq.flatMap {
      case (et, n, _, _) =>
        val offs = hist.filter(_._1 == et).sortBy(_._2)
          .scanLeft((0, 0L, 0L)) { case ((_, off, c0), (_, b, c)) =>
            (b, off + c0, c) }.tail // (bucket, off, count)
        Seq(0.5 -> "50", 0.95 -> "95").flatMap { case (q, tag) =>
          val k0 = math.floor((n - 1).toDouble * q).toLong + 1
          Seq(s"lo$tag" -> k0, s"hi$tag" -> (k0 + 1)).collect {
            case (which, k) if k <= n =>
              val (b, off, _) = offs.find { case (_, o, c) =>
                k > o && k <= o + c }.get
              (et, which, b, k - off)
          }
        }
    }
    // ONE distributed pass over the needed buckets (~4/B of the data):
    // the located (which, bucket, kb) rows join as a driver-local
    // relation (broadcast without a job); the in-bucket rank replays
    // per which-copy, so each copy ranks the same bucket identically
    val locDf = s.createDataFrame(located)
      .toDF("event_type", "which", "bucket", "kb")
    val wInB = Window.partitionBy("event_type", "bucket", "which")
      .orderBy("value")
    val found = bucketed.join(broadcast(locDf), Seq("event_type", "bucket"))
      .withColumn("rnb", row_number().over(wInB).cast("long"))
      .filter(col("rnb") === col("kb"))
      .select(col("event_type"), col("which"), col("value"))
    def pick(which: String): Column = max(when(col("which") === which, col("value")))
    def interp(q: Double, lo: Column, hi: Column): Column = {
      val frac = byEt { case (_, n, _, _) =>
        val p = (n - 1).toDouble * q
        lit(p - math.floor(p)) }
      lo + frac * (coalesce(hi, lo) - lo)
    }
    found.groupBy("event_type")
      .agg(pick("lo50").as("lo50"), pick("hi50").as("hi50"),
        pick("lo95").as("lo95"), pick("hi95").as("hi95"))
      .select(col("event_type"),
        byEt { case (_, n, _, _) => lit(n) }.as("n_rows"),
        interp(0.5, col("lo50"), col("hi50")).as("p50"),
        interp(0.95, col("lo95"), col("hi95")).as("p95"))
  }

  /** #89 — equal-width value histogram per event type (20 buckets over
    * the group's [min, max]): the profiling pass before outlier capping
    * or feature binning. Two aggregations — tiny per-group stats
    * broadcast back, then one map-side-combinable count to ≤ 20
    * rows/group; the bucket arithmetic is ordered identically in the
    * oracle so double floors agree bit-for-bit. */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val HB = 20
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    val st = ev.groupBy("event_type").agg(min("value").as("mn"), max("value").as("mx"))
    ev.join(broadcast(st), "event_type")
      .withColumn("bucket",
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(lit(HB - 1),
            floor((col("value") - col("mn")) / (col("mx") - col("mn")) * HB).cast("int"))))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** #94 — Pearson correlation between the daily view and purchase
    * volumes — do purchases track views day to day? Computed from the
    * five sums (n, Σx, Σy, Σxy, Σx², Σy²) carried as DECIMAL(38,0) so
    * everything up to the final expression is exact — Long products
    * would wrap silently at ~3e9 events/day, while the oracle's
    * HUGEINT stays exact (the decimal bound, ~1e38 on the largest
    * product, is past any physical corpus). The final expression (one
    * subtract, two IEEE sqrts, one divide — all correctly-rounded ops)
    * is ordered identically in the oracle, so the double is
    * bit-deterministic, unlike each engine's own corr() (their
    * accumulation orders differ). Two map-side-combinable aggs; the
    * day frame is one row per day, so the final global agg is
    * driver-bounded at any scale. */
  def qCorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .cast("decimal(19,0)").as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("decimal(19,0)").as("y"))
    val n = count(lit(1)).cast("decimal(10,0)")
    daily.agg(
      count(lit(1)).as("n_days"),
      ((n * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))).cast("double") /
        (sqrt((n * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))).cast("double")) *
          sqrt((n * sum(col("y") * col("y")) - sum(col("y")) * sum(col("y"))).cast("double"))))
        .as("corr_xy"))
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
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    // Same pre-aggregation as [[qCube]] (r21): rollup expands the fact
    // 3x map-side; aggregate the |rf|x|ls| cell frame once and roll THAT
    // up — exact decimal addition, bit-identical sums, one fact pass.
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec("l_quantity")).as("sq"), count(lit(1)).as("cnt"))
    cells.rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("sq")).cast("double").as("sum_qty"),
        sum(col("cnt")).as("cnt"))
  }

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

  /** Chain timeout for #q_funnel_window (7 days in µs — the synthetic
    * events are sparse, ~minutes-to-hours apart per user, so a 7-day
    * conversion window separates converted / timed-out / never like a
    * real product analytics cut would). */
  val FunnelWindowUs: Long = 7L * 86400 * 1000000

  /** #q_funnel_window — funnel WITH A TIMEOUT (the ClickHouse
    * windowFunnel / Amplitude "conversion window" semantics, pinned to
    * the deterministic EARLIEST-CHAIN rule): per user, t1 = first
    * view, t2 = first click AFTER t1, t3 = first purchase AFTER t2;
    * the reached depth counts only steps within [[FunnelWindowUs]] of
    * t1 — "converted within the hour", which #43's order-only funnel
    * cannot express. Earliest-chain is exactly mirrorable (each step
    * is a conditional min given the previous), unlike ClickHouse's
    * max-over-all-chains scan, whose per-level state updates are not
    * SQL-expressible cross-engine. Three full-partition conditional
    * mins REUSE one user_id exchange (unordered windows — no sort),
    * then one rollup to ≤4 depth rows with the mean time-to-convert
    * of completed funnels (exact integer µs sums, one mirrored
    * division). */
  def qFunnelWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("us") > col("t1"), col("us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("us") > col("t2"), col("us"))).over(w))
    val perUser = base.groupBy("user_id")
      .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
      .withColumn("depth",
        when(col("t3").isNotNull && col("t3") - col("t1") <= FunnelWindowUs, 3L)
          .when(col("t2").isNotNull && col("t2") - col("t1") <= FunnelWindowUs, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L))
    perUser.groupBy("depth")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("depth") === 3, col("t3") - col("t1"))).as("sum_us"))
      .select(col("depth"), col("n_users"),
        (col("sum_us").cast("double") / col("n_users")).as("mean_convert_us"))
  }

  /** Relative-error budget the #44 accuracy flag asserts: HLL at
    * rsd = 0.01 sits well inside 5%. */
  val SketchDistinctTol = 0.05

  /** The #44 sketch + its exact leg in one frame — the spec asserts
    * the raw estimate's accuracy off this; the registered query
    * projects the oracled audit columns. */
  private[graft] def qApproxDistinctFull(s: SparkSession, dir: String): DataFrame =
    // the exact leg two-levels through the (type, user) pair frame
    // instead of countDistinct beside the sketch: a mixed
    // distinct/non-distinct aggregate plans an Expand that doubles the
    // corpus shuffle, while HLL is duplicate-INSENSITIVE — identical
    // registers over the deduped pairs — so both legs and the row
    // count ride the pair frame (measured 2.54 → 0.94 s at sf0.1)
    Tables.events(s, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("exact_users"),
        sum(col("c")).as("cnt"))

  /** #44 — HyperLogLog distinct-count WITH ITS ACCURACY AUDIT: the
    * sketch estimate (the only affordable distinct at 100 TB — one
    * map-side-combinable pass, mergeable across partitions/days) is
    * checked in-engine against an exact leg and the output carries
    * (exact value, sketch_ok flag). The sketch VALUE stays
    * engine-specific (HLL internals differ by engine) and is
    * spec-asserted; the FLAG is the oracle-checkable contract — the
    * oracle emits the contractual 1, so a sketch drifting past
    * [[SketchDistinctTol]] fails the hash gate loudly. The exact leg
    * is the audit's ground-truth cost (the recall-eval discipline:
    * production serves the sketch alone; this registered form is the
    * go/no-go run before trusting it). */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    qApproxDistinctFull(s, dir).select(
      col("event_type"), col("cnt"), col("exact_users"),
      (abs(col("approx_users") - col("exact_users")).cast("double") <=
        lit(SketchDistinctTol) * col("exact_users").cast("double"))
        .cast("long").as("sketch_ok"))

  /** Rank-error budget the #81 flags assert: GK at accuracy 2500
    * guarantees ~4e-4 rank error; 0.02 is generous. */
  val SketchRankTol = 0.02

  /** The #81 sketch values + the exact rank-position audit in one
    * frame (spec consumes the raw ap50/ap95; the registered query
    * projects the flags). The audit counts, per type, the values on
    * either side of the sketch's picks — GK's guarantee IS a rank
    * guarantee, so the check is tie-robust and scale-free, and the
    * conditional counts are exact longs in any engine. */
  private[graft] def qApproxQuantilesFull(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    val ap = ev.groupBy("event_type")
      .agg(
        approx_percentile(col("value"), lit(0.5), lit(2500)).as("ap50"),
        approx_percentile(col("value"), lit(0.95), lit(2500)).as("ap95"),
        count(lit(1)).as("cnt"))
    ev.join(broadcast(ap), "event_type")
      .groupBy("event_type")
      .agg(max("ap50").as("ap50"), max("ap95").as("ap95"),
        max("cnt").as("cnt"),
        sum((col("value") <= col("ap50")).cast("long")).as("le50"),
        sum((col("value") < col("ap50")).cast("long")).as("lt50"),
        sum((col("value") <= col("ap95")).cast("long")).as("le95"),
        sum((col("value") < col("ap95")).cast("long")).as("lt95"))
  }

  /** #81 — mergeable quantile sketch (Greenwald-Khanna via
    * approx_percentile) WITH ITS ACCURACY AUDIT: p50/p95 per
    * event_type in ONE combinable pass (the single-pass affordable
    * quantile at 100 TB, vs the exact two-phase [[qPercentiles]]),
    * then one exact pass counts each type's values around the sketch's
    * picks and flags whether both picks sit within [[SketchRankTol]]
    * of their target ranks (frac(≤ pick) ≥ q − tol AND frac(< pick) ≤
    * q + tol — the two-sided rank test that is exact under ties). The
    * sketch values stay engine-specific and spec-asserted; the FLAGS
    * are the oracle contract (constant 1), so sketch drift fails the
    * hash gate. */
  def qApproxQuantiles(s: SparkSession, dir: String): DataFrame = {
    def rankOk(le: String, lt: String, q: Double): Column =
      ((col(le).cast("double") >= (lit(q) - lit(SketchRankTol)) * col("cnt")) &&
        (col(lt).cast("double") <= (lit(q) + lit(SketchRankTol)) * col("cnt")))
        .cast("long")
    qApproxQuantilesFull(s, dir).select(
      col("event_type"), col("cnt"),
      rankOk("le50", "lt50", 0.5).as("p50_rank_ok"),
      rankOk("le95", "lt95", 0.95).as("p95_rank_ok"))
  }

  /** #48 — TPC-H Q4-style priority count via LEFT SEMI join: orders with
    * at least one line shipped after the order date. The semi join never
    * duplicates the probe side, so no post-join dedup; only
    * (l_orderkey, l_shipdate) streams through the shuffle, and at 100 TB
    * both sides hash-partition on the order key — one co-located
    * shuffle, no fact-×-fact blowup. */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** #49 — dormant customers via LEFT ANTI join (NOT EXISTS): customers
    * with no order since 2001-01-01. The date predicate is pushed to the
    * orders scan, so the anti join's build side holds only recent order
    * keys — at 100 TB that's the pruned slice, not the full fact. */
  def qAntiDormant(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_dormant"), min("c_custkey").as("first_custkey"))
  }

  /** #50 — TPC-H Q7-style nation-pair volume: revenue flowing between
    * two nations (either direction) per ship year. Nations broadcast;
    * supplier/customer/orders join on their natural keys (each a single
    * co-partitioned shuffle — at 100 TB none of those sides fits a
    * broadcast, so the plan must survive as shuffled hash joins). */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(n1), supp("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), cust("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("revenue"))
  }

  /** #51 — TPC-H Q10-style returned-item report: top-20 customers by
    * revenue lost to returns. The returnflag filter is pushed to the
    * lineitem scan; top-k collapses to TakeOrderedAndProject (no global
    * sort materialization). */
  /** #64 — TPC-H Q8-style market share: one nation's suppliers' slice
    * of total revenue per order year. Supplier and nation broadcast;
    * numerator and denominator are decimal-exact sums sharing one fact
    * shuffle; the share is a single float division per year. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val rev = dec("l_extendedprice") *
      (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
      rev.as("rev"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val nation = Tables.nation(s, dir).select("n_nationkey", "n_name")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .groupBy("o_year")
      .agg(
        (sum(when(col("n_name") === "NATION_7", col("rev"))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(col("rev")).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_rows"))
  }

  /** #65 — per-type anomaly flags: events whose value exceeds their
    * event_type's exact p95 (composes the two-phase percentile rank
    * machinery of [[qPercentiles]]); the tiny percentile frame
    * broadcasts back onto the fact scan, so flagging costs one
    * map-side comparison per row. */
  def tsAboveP95(s: SparkSession, dir: String): DataFrame = {
    val p = qPercentiles(s, dir).select(col("event_type"), col("p95"))
    Tables.events(s, dir)
      .join(broadcast(p), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_above"))
  }

  /** #61 — TPC-H Q12-style priority line counts (reshaped to the
    * synthetic schema, which has no shipmode/receipt dates): lineitems
    * shipped in 1996 joined to their order's priority, conditional
    * integer counts per linestatus. One fact-fact join on orderkey with
    * the date filter pushed to the scan — exact everywhere. */
  def q12Shipmode(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
  }

  /** Salt fanout for #q_join_salted — one hot key spreads across this
    * many join reducers. */
  val JoinSaltN = 8

  /** #q_join_salted — SKEW-HARDENED equi-join twin: the lineitem ⋈
    * orders fact join with the orders side REPLICATED [[JoinSaltN]]×
    * (explode of a literal salt array) and the fact side salted by a
    * deterministic per-row hash, so a hot orderkey's rows spread over
    * [[JoinSaltN]] reducers instead of stalling one task — #38 proved
    * the two-phase SALTED pattern for aggregations; this applies it to
    * the JOIN shuffle, the other operator a hot key stalls at 100 TB
    * (AQE's skew-join split handles moderate skew at runtime; the
    * explicit salt is the plan-level guarantee for the pathological
    * key AQE only discovers after a straggler). The join is hinted
    * sort-merge — the strategy big×big joins take at scale, and the
    * one the salt exists for (a broadcast join has no shuffle to
    * skew). Output: priority × returnflag revenue rollup, BIT-EQUAL to
    * the unsalted join by construction — the oracle IS the plain join
    * SQL, and the planted-hot-key spec proves equality against the
    * unsalted formulation. Cost: the dim side carries JoinSaltN× rows
    * through the shuffle — the standard trade (pay bounded dim
    * replication, buy hot-key spread); decimal sums keep the rollup
    * exact under any row order. */
  def qJoinSalted(s: SparkSession, dir: String): DataFrame =
    qJoinSaltedOf(Tables.lineitem(s, dir), Tables.orders(s, dir))

  /** [[qJoinSalted]]'s core over explicit frames — the spec drives a
    * planted-hot-key corpus through it against the unsalted join. */
  private[graft] def qJoinSaltedOf(li0: DataFrame, od0: DataFrame): DataFrame = {
    val li = li0.select(col("l_orderkey"), col("l_returnflag"),
      (dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .as("rev"),
      // deterministic per-row salt: uniform over the hot key's rows,
      // and salt-value-independent output (bit-equality is by
      // construction, so the hash only affects balance)
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(JoinSaltN))
        .as("salt"))
    val od = od0.select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt",
        explode(array((0 until JoinSaltN).map(i => lit(i.toLong)): _*)))
    li.join(od.hint("merge"),
        li("l_orderkey") === od("o_orderkey") && li("salt") === od("salt"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev")).cast("double").as("revenue"))
  }

  /** #62 — TPC-H Q14-style promo revenue share: decimal-exact numerator
    * and denominator, ONE double division at the end (bit-identical in
    * both engines). Part is a broadcast dim. */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val part = Tables.part(s, dir).select("p_partkey", "p_type")
    val rev = dec("l_extendedprice") *
      (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        (sum(when(col("p_type").startsWith("PROMO"), rev)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100.0 /
          sum(rev).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_rows"))
  }

  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name", "c_nationkey")
    val nation = Tables.nation(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** #52 — cohort retention: per first-seen-day cohort, how many users
    * came back the next day (D1) and within a week (D7). One distinct
    * shuffle to daily activity, one groupBy user (day sets are ≤31
    * elements, so collect_set stays tiny regardless of event volume),
    * one groupBy cohort — no self-join of the raw event log. */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = Tables.events(s, dir)
      .select(col("user_id"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .distinct()
    daily.groupBy("user_id")
      .agg(min("day_us").as("d0"), collect_set("day_us").as("days"))
      .select(col("d0"),
        exists(col("days"), d => d === col("d0") + dayUs).cast("int").as("r1"),
        exists(col("days"), d => d > col("d0") && d <= col("d0") + 7 * dayUs)
          .cast("int").as("r7"))
      .groupBy(col("d0").as("cohort_us"))
      .agg(count(lit(1)).as("n_users"),
        sum("r1").cast("long").as("n_d1"),
        sum("r7").cast("long").as("n_d7"))
  }

  /** #q_cohort_matrix — the WEEKLY RETENTION TRIANGLE: users cohorted
    * by their first active epoch-week, and for every (cohort, week
    * offset) the count + share of the cohort still active — the full
    * matrix behind every product-analytics retention chart (#52 gives
    * d1/d7 cuts, #162 the adjacent-week ledger; the triangle is the
    * view a PM actually reads). Weeks are pure integer floor(µs/week)
    * buckets (no calendar/locale conventions can diverge engines),
    * offsets integer subtraction, share ONE mirrored division against
    * the cohort-size frame. One distinct pass to (user, week), the
    * cohort min reuses the user shuffle, the matrix rollup is bounded
    * by weeks² — never event volume. */
  def qCohortMatrix(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val weekly = Tables.events(s, dir)
      .select(col("user_id"), floor(unix_micros(col("ts")) / weekUs)
        .cast("long").as("wk"))
      .distinct()
    val cohort = weekly.groupBy("user_id").agg(min("wk").as("c0"))
    val sizes = cohort.groupBy("c0").agg(count(lit(1)).as("cohort_n"))
    weekly.join(cohort, "user_id")
      .groupBy(col("c0"), (col("wk") - col("c0")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "c0")
      .select(col("c0").as("cohort_wk"), col("week_offset"),
        col("n_active"), col("cohort_n"),
        (col("n_active").cast("double") / col("cohort_n").cast("double"))
          .as("share"))
  }

  /** #53 — heavy hitters: top-10 users by event count, deterministic
    * ties. Map-side partial counts collapse the shuffle to one row per
    * user; the top-k is TakeOrderedAndProject (per-partition heaps, no
    * global sort) — the exact-counting complement of q_approx_distinct. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(10)

  /** #15 — semi-structured prop extraction from events.props JSON. */
  def qJsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
      .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec("value")).cast("double").as("sum_value"))

  /** #68 — TPC-H Q9-style profit by supplier nation × ship year
    * (reshaped: the synthetic schema has no partsupp, so supply cost is
    * p_retailprice × quantity). Part filter prunes the fact scan via
    * the broadcast hash; both dims broadcast — the fact table is
    * touched once and never shuffled before the final small agg. */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
      .filter(col("p_name").like("%widget%"))
      .select("p_partkey", "p_retailprice")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val nation = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val li = Tables.lineitem(s, dir)
    val amount = dec("l_extendedprice") *
      (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")) -
      dec("p_retailprice") * col("l_quantity").cast("decimal(4,0)")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("profit"),
        count(lit(1)).as("n_rows"))
  }

  /** #69 — TPC-H Q13-style customer order-count distribution. Orders
    * pre-aggregate to one row per customer BEFORE touching the customer
    * table (map-side combine collapses the fact shuffle), then a left
    * join preserves zero-order customers and a second tiny agg builds
    * the histogram. No per-order rows ever reach the join. */
  def q13Custdist(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    Tables.customer(s, dir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** #70 — TPC-H Q15-style top supplier: quarterly revenue per
    * supplier, then every supplier tying the maximum (the scalar
    * subquery shape). The per-supplier frame is small after the agg, so
    * the max broadcasts back as a single-row crossJoin; tie equality is
    * on doubles both engines derive from the same exact decimal sum. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("total_revenue"))
    val top = rev.agg(max("total_revenue").as("mx"))
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_name")
    rev.crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** #71 — TPC-H Q17-style small-quantity revenue: lineitems of one
    * brand whose quantity is below 20% of their part's average. The
    * correlated per-part average becomes a broadcast frame keyed by
    * partkey (bounded by #parts of the brand, not by fact volume); the
    * threshold arithmetic — exact decimal sum, one double division,
    * one multiply — is ordered identically in the oracle so the
    * comparison is bit-deterministic. */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    val li = Tables.lineitem(s, dir)
    val branded = li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
    val avgQty = branded.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((lit(0.2) * (sum(dec("l_quantity")).cast("double") /
        count(lit(1)))).as("qty_thr"))
    // no forced broadcast: avgQty grows with the brand's part count (a
    // dimension, not a constant) — AQE picks broadcast when it fits
    branded.join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg((sum(dec("l_extendedprice")).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  /** #92 — TPC-H Q21-style sole late supplier (adapted: the testdata
    * lineitem has no commit/receipt dates, so "late" is shipping more
    * than 90 days after the order date): suppliers who were the ONLY
    * late supplier on a multi-supplier order, ranked by offence count.
    * The classic Q21 quadruple self-join collapses to ONE fact-fact
    * join plus per-order WINDOW counts: the EXISTS (another supplier)
    * and NOT EXISTS (another late supplier) become distinct-supplier
    * collect_sets over the orderkey partition, so lineitem is scanned
    * and shuffled exactly once (a groupBy + join-back would re-scan —
    * the two subtrees' pushed filters differ, defeating exchange
    * reuse). Per-order state is bounded by lines-per-order, a data
    * constant. Late-ness is integer µs arithmetic so the oracle agrees
    * exactly. */
  def q21LateSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
    val flagged = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (unix_micros(col("l_shipdate").cast("timestamp")) >
          unix_micros(col("o_orderdate").cast("timestamp")) + lit(7776000000000L))
          .cast("int").as("late"))
    // One explicit orderkey exchange serves BOTH the (orderkey,
    // suppkey) dedup aggregate (hash(ok) clusters every (ok, sk) group)
    // and the per-order window (guide §2.4: same-keyed operations share
    // one exchange). Over the deduped pairs the EXISTS/NOT-EXISTS
    // counts are a plain count and sum — the former per-row
    // collect_set windows built two hash sets per order group over
    // every LINE (r21: 5.5 summed task-seconds, the query's whole
    // compute). A pair survives iff max(late) = 1 ∧ n_supp > 1 ∧
    // n_late_supp = 1 — exactly the rows the per-line filter + distinct
    // kept: a (ok, sk) pair passed late = 1 on SOME line ⟺ max = 1,
    // n_supp = #distinct suppliers, n_late_supp = #suppliers with a
    // late line.
    val w = Window.partitionBy("l_orderkey")
    flagged
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late_supp") === 1)
      .select("l_orderkey", "l_suppkey")
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_orders"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_orders"))
      .orderBy(col("n_orders").desc, col("s_suppkey"))
      .limit(10)
  }

  /** #72 — TPC-H Q18-style large orders: orders whose total quantity
    * exceeds 250, with their customer. The HAVING pre-filter runs on
    * the per-order agg (map-side combinable), so only the few large
    * orders join back to orders/customer — never the raw lineitems. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
  }

  /** #73 — TPC-H Q19-style disjunctive-predicate revenue: an
    * OR-of-ANDs over (brand, size, quantity). Brand/size conjuncts live
    * on the broadcast part dim; the residual OR evaluates post-join in
    * one codegen stage — the plan shape that proves disjunctions don't
    * force a fact shuffle or repeated scans. */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(s, dir)
    val qty = col("l_quantity")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        qty.between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        qty.between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        qty.between(20, 30))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .filter(cond)
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** #84 — CUBE grouping sets: all 2^2 rollup combinations of
    * (returnflag, linestatus) in ONE pass — Spark expands the grouping
    * sets map-side, so the fact table is read and shuffled once for
    * all four aggregation levels (the complement of q_rollup's
    * hierarchy). */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    // Pre-aggregate per (rf, ls) BEFORE the cube (r21, guide §2.3
    // shuffle fewer bytes / §4): Spark plans cube as Expand-below-
    // Aggregate, so the raw form pushes every fact row through the
    // expand 4× map-side; the cell frame is |rf|×|ls| rows, and cubing
    // THAT re-derives every grouping set by exact decimal addition of
    // the cell sums (associative) — bit-identical sums, one fact pass.
    // Natural-null keys land in the same null groups either way: the
    // pre-aggregation only merges rows the cube's finest grouping set
    // merged anyway.
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec("l_quantity")).as("sq"), count(lit(1)).as("cnt"))
    cells.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("sq")).cast("double").as("sum_qty"),
        sum(col("cnt")).as("cnt"))
  }

  /** #79 — daily event matrix: counts pivoted to one column per event
    * type. With the value list given explicitly, pivot plans as plain
    * conditional aggregates — map-side combinable, ONE shuffle on day,
    * no second pass to discover the pivot domain. */
  def qPivotDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .select(col("day_us"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("error"), lit(0L)).as("n_error"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("view"), lit(0L)).as("n_view"))

  /** #74 — TPC-H Q22-style sales opportunity: customers with
    * above-average positive balance and no recent orders, per segment.
    * The global average is a 1-row broadcast; the anti-join streams the
    * (pre-projected, pre-deduplicated) recent-customer keys against the
    * customer scan — a left_anti that AQE turns into a broadcast when
    * the recent-buyer set is small. */
  def q22Opportunity(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec("c_acctbal")).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        sum(dec("c_acctbal")).cast("double").as("total_bal"))
  }

  /** Exact integer cents from a money double — the cross-engine-safe
    * currency unit (DECIMAL(18,2) is exact; ×100 → BIGINT). */
  private def cents(c: String): Column = (dec(c) * 100).cast("long")

  /** #113 — TPC-H Q2-style min-cost supplier (adapted: no partsupp
    * table, so "cost" is the cheapest OBSERVED line price): for each
    * PROMO-type part sold by a European supplier, the supplier offering
    * the minimum per-line price. The per-(part, supplier) min is a
    * map-side-combinable integer-cents agg on the ONE fact shuffle
    * (partkey); the per-part arg-min is a struct-ordered min on the
    * same key — no rank window, no second shuffle (both aggs hash on
    * l_partkey; ties break to the lowest suppkey inside the struct
    * order). Dims broadcast; region/nation prune suppliers BEFORE the
    * fact join so the fact rows of other regions never aggregate. */
  def q2MinCostSupp(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey", "p_size")
    val euroSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val perSupp = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), cents("l_extendedprice").as("pc"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "p_size", "l_suppkey", "s_name", "n_name")
      .agg(min(col("pc")).as("min_pc"))
    perSupp
      .groupBy(col("l_partkey").as("p_partkey"), col("p_size"))
      .agg(min(struct(col("min_pc"), col("l_suppkey"), col("s_name"),
        col("n_name"))).as("best"))
      .select(col("p_partkey"), col("p_size"),
        (col("best.min_pc").cast("double") / 100.0).as("min_price"),
        col("best.l_suppkey").as("s_suppkey"),
        col("best.s_name").as("s_name"), col("best.n_name").as("n_name"))
  }

  /** #114 — TPC-H Q11-style important stock (adapted: "value" is
    * discounted revenue instead of availqty·supplycost): parts whose
    * revenue from NATION_0's suppliers exceeds 0.1% of that nation's
    * total. Supplier keys of the nation broadcast to the fact scan
    * (map-side semi filter); ONE fact shuffle on partkey; the total is
    * the 1-row re-agg of the per-part frame broadcast back. The HAVING
    * compare runs on EXACT decimals (part_value·1000 > total) so no
    * float ordering can flip a borderline part. */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_0")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = Tables.lineitem(s, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .as("val_dec"))
    val total = perPart.agg(sum(col("val_dec")).as("total_dec"))
    perPart.crossJoin(broadcast(total))
      .filter(col("val_dec") * 1000 > col("total_dec"))
      .select(col("l_partkey").as("p_partkey"),
        col("val_dec").cast("double").as("part_value"))
  }

  /** #115 — TPC-H Q16-style supplier-count-per-part-class (adapted:
    * supplier↔part pairs come from OBSERVED lineitems instead of
    * partsupp; "customer complaints" is a negative account balance):
    * distinct supplier counts per (brand, size-class), excluding one
    * brand and flagged suppliers. Part attrs broadcast to the fact
    * scan; flagged suppliers are a broadcast anti-join BEFORE the
    * distinct so excluded rows never shuffle; the distinct pair set
    * reduces on (brand, class, suppkey) and the final count is a plain
    * combinable agg — two narrow shuffles over an already-collapsed
    * frame, never over raw facts. */
  def q16SupplierCount(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#13")
      .select(col("p_partkey"), col("p_brand"),
        (col("p_size") % 10).as("size_class"))
    val flagged = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .select("p_brand", "size_class", "l_suppkey").distinct()
      .groupBy("p_brand", "size_class")
      .agg(count(lit(1)).as("supplier_cnt"))
  }

  /** #116 — TPC-H Q20-style supply concentration (adapted: the
    * availqty>half-of-shipped predicate becomes its observable twin):
    * suppliers who shipped MORE THAN HALF of some PROMO part's 1995
    * volume — the single-source-risk report. Per-(part, supplier)
    * quantity sums are combinable on the one fact shuffle (partkey);
    * the per-part total is the re-agg of that same frame (no second
    * fact scan) joined back on partkey (AQE broadcasts it); dominance
    * compares exact integer cents·2 > total so both engines agree on
    * borderline halves. Output is per supplier with the count of parts
    * they dominate. */
  def q20DominantSupp(s: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val perPS = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(cents("l_quantity")).as("qty_c"))
    val perPart = perPS.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("qty_c")).as("total_c"), count(lit(1)).as("n_supp"))
    perPS.join(perPart, col("l_partkey") === col("t_partkey"))
      .filter(col("n_supp") > 1 && col("qty_c") * 2 > col("total_c"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_parts_dominated"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "n_parts_dominated")
  }

  /** #149 — MARKET-BASKET pair mining (association rules): the top-20
    * part pairs bought together in one order, with their co-occurrence
    * count and LIFT — the a-priori candidate step of every
    * recommender / assortment analysis. The pair join is keyed on
    * o_orderkey, so fanout is bounded by lines-per-order squared (a
    * handful), never corpus²; item supports re-aggregate the same
    * distinct (order, part) frame. That frame is corpus-invariant and
    * parameter-free, so it is STAGED ([[BasketIndex]], the winnow/
    * knn-graph discipline): the query reads the small staged incidence
    * frame and lineitem never enters the pair join. Lift =
    * (c_ab·n) / (c_a·c_b) — all integers into ONE IEEE division
    * mirrored by the oracle; top-k is TakeOrderedAndProject on
    * (count desc, p1, p2). */
  /** Within-order part pairs (p1 < p2) of the staged incidence frame —
    * one ok-keyed shuffle into per-order sorted part arrays, pairs
    * generated MAP-SIDE from each array (r20: replaces the ok-keyed
    * self-join, which shuffled the incidence twice and sort-merged it
    * before the same fanout — one Exchange fewer, no join; identical
    * pair multiset: the ok sets are distinct, so sorted-array (i < j)
    * enumeration IS the p1 < p2 equi-join). Fanout stays bounded by
    * lines-per-order². */
  private def basketPairs(op: DataFrame): DataFrame = {
    val grouped = op.groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
    grouped.select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))),
          y => struct(x.as("p1"), y.as("p2")))))).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("c_ab"))
  }

  def qMarketBasket(s: SparkSession, dir: String): DataFrame = {
    val op = BasketIndex.frame(s, dir) // staged distinct (ok, pk)
    val pairs = basketPairs(op)
    val supp = op.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    // order count rides as a broadcast 1-row frame — no driver-side
    // action in the query path
    val nOrders = op.select("ok").distinct().agg(count(lit(1)).as("n_ord"))
    // lift's integer products form in DECIMAL(38,0) (one operand cast
    // before the multiply, oracle in lockstep): at 100 TB support
    // counts, c·n would wrap a 64-bit intermediate silently
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    pairs
      .join(supp.select(col("pk").as("p1"), col("c").as("c_a")), "p1")
      .join(supp.select(col("pk").as("p2"), col("c").as("c_b")), "p2")
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("c_ab"),
        ((col("c_ab").cast(dec) * col("n_ord")).cast("double") /
          (col("c_a").cast(dec) * col("c_b")).cast("double")).as("lift"))
      .orderBy(col("c_ab").desc, col("p1"), col("p2"))
      .limit(20)
  }

  /** Min joint support and output depth of #258. */
  val RuleMinSup = 3
  val RuleTopK = 10

  /** #258 — ASSOCIATION RULES (A→B by LIFT): #118 ranks pairs by raw
    * joint support, which buries rare-but-correlated pairs under the
    * bestsellers; this is the Agrawal-Srikant second half — DIRECTED
    * rules over the min-support survivors, confidence = P(B|A) and
    * lift = P(AB)/(P(A)P(B)), ranked by (lift desc, antecedent,
    * consequent). Same staged incidence frame and bounded pair join as
    * #118 (fanout ≤ lines-per-order²; lineitem never enters the plan);
    * the direction expansion is a 2× projection of the pair frame;
    * conf and lift are single divisions of exact longs, so their
    * doubles — and the rank order — are bit-identical cross-engine
    * (the text_bigram_lift precedent); top-10 via
    * TakeOrderedAndProject. */
  def qBasketRules(s: SparkSession, dir: String): DataFrame = {
    val op = BasketIndex.frame(s, dir)
    val pairs = basketPairs(op) // shared map-side pair mining (see above)
      .filter(col("c_ab") >= RuleMinSup)
    val supp = op.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    val nOrders = op.select("ok").distinct().agg(count(lit(1)).as("n_ord"))
    val scored = pairs
      .join(supp.select(col("pk").as("p1"), col("c").as("c_1")), "p1")
      .join(supp.select(col("pk").as("p2"), col("c").as("c_2")), "p2")
    // both directions of each surviving pair — confidence is the only
    // directed quantity; lift is symmetric
    val rules = scored.select(col("p1").as("ante"), col("p2").as("cons"),
        col("c_ab"), col("c_1").as("c_a"), col("c_2").as("c_b"))
      .unionAll(scored.select(col("p2").as("ante"), col("p1").as("cons"),
        col("c_ab"), col("c_2").as("c_a"), col("c_1").as("c_b")))
    // same DECIMAL(38,0)-before-multiply discipline as qMarketBasket
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    rules.crossJoin(broadcast(nOrders))
      .select(col("ante"), col("cons"), col("c_ab"),
        (col("c_ab").cast("double") / col("c_a")).as("conf"),
        ((col("c_ab").cast(dec) * col("n_ord")).cast("double") /
          (col("c_a").cast(dec) * col("c_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("ante"), col("cons"))
      .limit(RuleTopK)
  }

  /** #145 — RFM CUSTOMER SEGMENTATION (recency / frequency / monetary
    * — the classic marketing-analytics scoring an OLAP engine serves):
    * per customer, last order time, order count, and integer-cents
    * spend, each scored into an exact per-nation quintile 1..5 (5 =
    * best). Quintiles are EXACT order statistics — score =
    * (5·rank−1) div n + 1 with rank = row_number ordered by (metric,
    * custkey) — so ties and engine boundaries cannot flip a score
    * (ntile's remainder distribution is mirrored exactly by the same
    * integer formula on both sides). Each rank is TWO-LEVEL (see the
    * bucket widths below): a whole nation's customers never sort in
    * one task. Output: per customer, the three scores and the composed
    * RFM cell. */
  /** Order-aligned bucket widths of #145's two-level ranks (r17 — the
    * q_decile_lift discipline applied to the per-NATION ranks, whose
    * partitions are customers/25 and grow with the corpus): recency
    * buckets are calendar DAYS of the last-order time, frequency
    * buckets the small-integer order count itself, monetary buckets
    * $1k of lifetime cents. Each bucket value partitions its metric's
    * (metric, custkey) sort order, so within-(nation, bucket) ranks
    * plus a per-nation bucket-histogram carry compose the exact
    * per-nation rank — no task ever sorts a whole nation's
    * customers. */
  val RfmDayUs = 86400000000L
  val RfmSpendBucketCents = 100000L

  def qRfmSegments(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(unix_micros(col("o_orderdate").cast("timestamp"))).as("last_us"),
        count(lit(1)).as("freq"),
        sum(cents("o_totalprice")).as("spend_c"))
    // checkpointed: the three carries, the nation counts and the main
    // frame all read this once instead of re-running the orders agg
    val j = perCust.join(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("b_r", expr(s"last_us div $RfmDayUs"))
      .withColumn("b_f", col("freq"))
      .withColumn("b_m", expr(s"spend_c div $RfmSpendBucketCents"))
      .localCheckpoint()
    // ONE histogram pass serves all three carries AND the nation
    // counts (r21, guide §2.4): each customer explodes into its three
    // (metric, bucket) memberships, one aggregate counts them, and one
    // per-(nation, metric) prefix-sum window replaces the three former
    // aggregate+window chains — same carry values, a third of the jobs.
    // Nation×bucket-bounded, so the checkpoint is tiny and the three
    // broadcast probes below re-read it without re-aggregating.
    val hist = j.select(col("c_nationkey"), explode(array(
        struct(lit("r").as("m"), col("b_r").as("b")),
        struct(lit("f").as("m"), col("b_f").as("b")),
        struct(lit("m").as("m"), col("b_m").as("b")))).as("e"))
      .groupBy(col("c_nationkey"), col("e.m").as("m"), col("e.b").as("b"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("carry", coalesce(sum(col("bc")).over(
        Window.partitionBy("c_nationkey", "m").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .localCheckpoint()
    val cnts = hist.filter(col("m") === "r")
      .groupBy("c_nationkey").agg(sum("bc").as("cnt_n"))
    def carryOf(b: String) = {
      val m = b.stripPrefix("b_") // "b_r" -> metric tag "r"
      hist.filter(col("m") === m)
        .select(col("c_nationkey"), col("b").as(b), col("carry").as(s"carry_$b"))
    }
    def rnOf(b: String, m: String) =
      row_number().over(Window.partitionBy(col("c_nationkey"), col(b))
        .orderBy(col(m), col("c_custkey"))).cast("long")
    val scored = j
      .join(broadcast(carryOf("b_r")), Seq("c_nationkey", "b_r"))
      .join(broadcast(carryOf("b_f")), Seq("c_nationkey", "b_f"))
      .join(broadcast(carryOf("b_m")), Seq("c_nationkey", "b_m"))
      .join(broadcast(cnts), "c_nationkey")
      .withColumn("rn_r", col("carry_b_r") + rnOf("b_r", "last_us"))
      .withColumn("rn_f", col("carry_b_f") + rnOf("b_f", "freq"))
      .withColumn("rn_m", col("carry_b_m") + rnOf("b_m", "spend_c"))
    scored.select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"),
        expr("(rn_r * 5 - 1) div cnt_n + 1").as("r_score"),
        expr("(rn_f * 5 - 1) div cnt_n + 1").as("f_score"),
        expr("(rn_m * 5 - 1) div cnt_n + 1").as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** #139 — PEAK SESSION CONCURRENCY per day (the capacity-planning
    * ask every interactive service runs: "how many sessions were open
    * at once?"): sessions come from the NATIVE session_window operator
    * ([[graft.streaming.StreamOps.sessionSpans]] — 30-min gap, end =
    * last event + gap), then a SWEEP LINE counts overlap: +1 at each
    * session start, −1 at each end, running sum, max. The classic
    * formulation needs one GLOBAL time-ordered pass — a corpus-sized
    * single partition at 100 TB — so the sweep is split by DAY: the
    * within-day running sum partitions on day_us (bounded by one day's
    * sessions), and the midnight carry-in is a prefix sum over the
    * per-day NET deltas — a one-row-per-day frame (bounded by the
    * calendar, ~thousands of rows at any corpus size), the
    * doc_pack_bins two-level treatment. Ends sort before starts at the
    * same microsecond (d ascending), and ties share their running-sum
    * value in both engines (the shared RANGE default frame), so the
    * max is deterministic. A day's true peak can precede its first
    * delta (carry alone, e.g. a day that only closes sessions), hence
    * max_concurrent = carry + greatest(0, max running sum). All
    * integer arithmetic end-to-end. */
  def sessionConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.streaming.StreamOps.sessionSpans(Tables.events(s, dir))
    val deltas = sess.select(explode(array(
        struct(col("session_start_us").as("ts_us"), lit(1).as("d")),
        struct(col("session_end_us").as("ts_us"), lit(-1).as("d")))).as("e"))
      .select(col("e.ts_us").as("ts_us"), col("e.d").as("d"))
      .withColumn("day_us", expr("ts_us div 86400000000") * lit(86400000000L))
    val wDay = Window.partitionBy("day_us").orderBy("ts_us", "d")
    val perDay = deltas.withColumn("run", sum("d").over(wDay))
      .groupBy("day_us")
      .agg(max("run").as("max_run"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_starts"),
        sum("d").cast("long").as("net"))
    val wCarry = Window.orderBy("day_us")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("carry", coalesce(sum("net").over(wCarry), lit(0L)))
      .select(col("day_us"), col("n_starts"),
        (col("carry") + greatest(lit(0L), col("max_run"))).cast("long")
          .as("max_concurrent"))
  }

  /** #180 — month-over-month PART GROWTH movers: top-10 (part, month)
    * cells by revenue growth ratio vs the previous calendar month —
    * the merchandising "what's taking off" scan (ts_top_movers lifted
    * to the business fact). Months key on the integer year·12+month
    * index (pure field extraction — no epoch division can misbucket a
    * calendar month); revenue stays on the exact 10^-4 quanta grid so
    * the growth ratio is ONE double division of integers. One fact
    * shuffle to the (part, month) frame; the month shift is a lag
    * window guarded by mi_prev = mi − 1 (exactly the rows the previous
    * self equi-join on (part, mi−1) matched). The one shuffle is an
    * explicit repartition on l_partkey ALONE: hash(part) satisfies the
    * (part, month) agg's clustering AND the window's, so agg, lag and
    * rank all ride a single exchange — the default plan paid a second
    * full exchange to re-key the (part, month) frame for the window,
    * and with ~30 populated months per part the agg barely reduces, so
    * that second exchange moved nearly the whole fact volume again. */
  def qPartGrowth(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_partkey").orderBy("mi")
    Tables.lineitem(s, dir)
      // one tz conversion per row (timestamp → date), then year/month
      // are plain epoch-day field extractions — not two independent
      // µs → ZonedDateTime walks per row
      .withColumn("d", to_date(col("l_shipdate")))
      .select(col("l_partkey"), col("d"), col("l_extendedprice"), col("l_discount"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"),
        (year(col("d")) * 12 + month(col("d"))).cast("long").as("mi"))
      .agg((sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        * 10000)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("rq"))
      .withColumn("mi_prev", lag("mi", 1).over(w))
      .withColumn("rq_prev", lag("rq", 1).over(w))
      .filter(col("mi_prev") === col("mi") - 1)
      .select(col("l_partkey"), col("mi"),
        (col("rq").cast("double") / 10000.0).as("revenue"),
        (col("rq_prev").cast("double") / 10000.0).as("revenue_prev"),
        ((col("rq") - col("rq_prev")).cast("double") /
          col("rq_prev").cast("double")).as("growth"))
      .orderBy(col("growth").desc, col("l_partkey"), col("mi"))
      .limit(10)
  }

  /** #176 — median PURCHASE-GAP per user: the exact doubled-integer
    * median (odd n → 2·middle, even → lower+upper — no division, the
    * ts_anomaly_mad discipline) of the µs gaps between a user's
    * consecutive purchases — the repeat-cycle stat behind replenishment
    * and churn-risk models, exact where approx quantiles would drift.
    * One user shuffle carries the purchase filter, the lag, the
    * partition count and the rank window; the conditional sum at the
    * two middle ranks makes the median a plain integer. */
  def qPurchaseGapMedian(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val gaps = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("g", col("ts_us") - lag("ts_us", 1).over(byTs))
      .filter(col("g").isNotNull)
    val wN = Window.partitionBy("user_id")
    val byG = Window.partitionBy("user_id").orderBy("g", "ts_us")
    gaps
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("rn", row_number().over(byG))
      .groupBy("user_id")
      .agg(max("n").as("n_gaps"),
        sum(when(expr("n % 2 = 1 AND rn = (n + 1) div 2"), col("g") * 2)
          .when(expr("n % 2 = 0 AND (rn = n div 2 OR rn = n div 2 + 1)"),
            col("g"))
          .otherwise(0L)).as("med2_us"))
      .select(col("user_id"), col("n_gaps"), col("med2_us"),
        (col("med2_us").cast("double") / 2.0).as("med_us"))
  }

  /** Order-aligned value-bucket width of #171's two-level cumulative
    * sum: $10k revenue buckets (rq div 10⁸ exact 10⁻⁴-dollar units)
    * partition the (rq desc, partkey) sort order. Bucket count is
    * value-range/width bounded (a revenue histogram — the
    * q_decile_lift witness), so the carry frame stays hundreds of rows
    * while the part dimension grows with the corpus. */
  val AbcBucketUnits = 100000000L

  /** #171 — ABC (Pareto) ANALYSIS of parts by revenue — the 80/95
    * inventory-classification cut every ops/merchandising warehouse
    * serves: parts ranked by exact decimal revenue, class A while the
    * running share ≤ 80%, B ≤ 95%, else C. Revenue quantizes to exact
    * 10^-4 integer units (the product scale of price × (1−disc)), so
    * the cumulative sums and both share thresholds compare as pure
    * integers — no float can flip a class at any scale. ONE fact
    * shuffle to per-part revenue; the running revenue is NEVER one
    * window partition (the r16 q_decile_lift lesson applied before it
    * bites — TPC-H's part table grows with SF, so "catalogue-bounded"
    * does not hold at 100 TB): cumulative sums compute within
    * [[AbcBucketUnits]] revenue buckets plus a broadcast
    * bucket-histogram carry of SUMS (decimal sums are associative, so
    * carry + within-bucket running sum is bit-identical to the global
    * window it replaces); the grand total is a broadcast 1-row
    * aggregate. */
  def qAbcAnalysis(s: SparkSession, dir: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // checkpointed: the total, the carry histogram and the main frame
    // all read the part-dimension frame once — without it each branch
    // re-runs the corpus aggregate (three lineitem scans, sweep ratio
    // 1.73 measured; one scan + a dimension-sized materialization after)
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg((sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        * 10000)
        .cast(dec38).as("rq"))
      .withColumn("b", expr(s"CAST(rq div $AbcBucketUnits AS BIGINT)"))
      .localCheckpoint()
    val tot = rev.agg(sum("rq").cast(dec38).as("t"))
    // carry(b) = revenue in HIGHER-revenue buckets (order is rq desc)
    val wCarry = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = rev.groupBy("b").agg(sum("rq").as("bs"))
      .withColumn("carry",
        coalesce(sum(col("bs")).over(wCarry), lit(0).cast(dec38)))
      .select("b", "carry")
    val wIn = Window.partitionBy("b").orderBy(col("rq").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(broadcast(carry), "b")
      .withColumn("cum", (col("carry") + sum("rq").over(wIn)).cast(dec38))
      .crossJoin(broadcast(tot))
      .withColumn("cls",
        when(col("cum") * 5 <= col("t") * 4, "A")
          .when(col("cum") * 20 <= col("t") * 19, "B")
          .otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"),
        (sum("rq").cast("double") / 10000.0).as("revenue"),
        (sum("rq").cast("double") / max("t").cast("double")).as("share"))
  }

  /** #162 — GROWTH ACCOUNTING (the new / retained / resurrected /
    * churned weekly user ledger every product-analytics warehouse
    * serves — the decomposition satisfying active(w) = new + retained
    * + resurrected and active(w−1) = retained + churned(w)): ONE
    * distinct pass to (user, week), one user-keyed window supplying
    * both lag and lead (same shuffle, per-row state = two longs), and
    * a conditional-count rollup. Churn events are emitted at week+1 by
    * the lead gap and clipped to the observed range by a broadcast
    * 1-row max-week frame. All-integer; week ids are epoch-µs /
    * 7-day buckets. */
  def qGrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val WkUs = 604800000000L
    // localCheckpoint: the window classification and the max-week bound
    // both consume this distinct frame — one corpus scan, not two
    val weekly = Tables.events(s, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $WkUs").as("wk"))
      .distinct()
      .localCheckpoint()
    val w = Window.partitionBy("user_id").orderBy("wk")
    val fl = weekly
      .withColumn("prev", lag("wk", 1).over(w))
      .withColumn("nxt", lead("wk", 1).over(w))
    val statuses = fl.select(col("wk"),
      when(col("prev").isNull, "new")
        .when(col("prev") === col("wk") - 1, "retained")
        .otherwise("resurrected").as("status"))
    val churn = fl.filter(col("nxt").isNull || col("nxt") > col("wk") + 1)
      .select((col("wk") + 1).as("wk"), lit("churned").as("status"))
    val maxWk = weekly.agg(max("wk").as("mx"))
    statuses.unionByName(churn)
      .crossJoin(broadcast(maxWk)).filter(col("wk") <= col("mx"))
      .groupBy((col("wk") * WkUs).as("wk_us"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("status") === "churned", 1L).otherwise(0L)).as("n_churned"))
  }

  /** Attribution lookback window: 7 days in epoch-µs. */
  val AttrWindowUs: Long = 7L * 86400000000L

  /** #157 — LAST-TOUCH attribution: every purchase credits the most
    * recent click/view by the same user within a 7-day lookback (the
    * marketing-attribution join every event warehouse serves), rolled
    * up to (attributed channel, purchase day) with purchase counts and
    * credited revenue. NO join at all: the running conditional
    * struct-max over the (ts, event_id)-ordered user shuffle carries
    * each purchase's latest prior touch (the ts_asof_join technique —
    * at 100 TB this is one shuffle where a purchases×touches interval
    * join would blow up on active users); the 7-day cutoff filters the
    * carried value AFTER the pick, which is equivalent (the latest
    * touch overall being stale implies no in-window touch exists).
    * Purchases with no eligible touch land in the 'none' channel, so
    * the rollup partitions all purchases. Revenue sums are
    * DECIMAL(18,2)-exact. */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type") === "click" || col("event_type") === "view"
    Tables.events(s, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("lt",
        max(when(isTouch, struct(col("tus"), col("event_id"), col("event_type"))))
          .over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("attr_type",
        when(col("lt").isNotNull && col("lt.tus") >= col("tus") - AttrWindowUs,
          col("lt.event_type")).otherwise(lit("none")))
      .groupBy(col("attr_type"),
        (expr("tus div 86400000000") * lit(86400000000L)).as("day_us"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(dec("value")).cast("double").as("credited_value"))
  }

  /** #243 — JOIN-KEY SKEW DIAGNOSTIC: the report an operator consults
    * BEFORE choosing the salted twin (#38 / #239) — per-key row-count
    * distribution of the events key. Shape: per-key counts (one
    * combinable key shuffle), then a count-VALUE histogram (distinct
    * count values ≪ keys ≪ rows), so the cumulative window and the
    * exact-integer disc-percentile selection ride a frame bounded by
    * how many distinct per-key counts exist — never by keys and never
    * by rows. ceil(q·n) ranks stay integer as (q_num·n + q_den−1) div
    * q_den; every emitted double is one division of exact longs.
    * Output is ONE row: total rows/keys, the hottest key's share, p50
    * and p99 of per-key rows, and the p99/p50 skew ratio — >4 is the
    * "salt this join" signal. */
  def qSkewStats(s: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    // checkpointed: three consumers (totals, cumulative, selection)
    // would otherwise each replay the corpus scan — the histogram is
    // distinct-count-values-bounded, the cheapest frame in the plan
    val hist = perKey.groupBy("cnt").agg(count(lit(1)).as("nk"))
      .localCheckpoint()
    val wCum = Window.orderBy("cnt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("ck", sum(col("nk")).over(wCum))
    val tot = hist.agg(
      sum(col("cnt") * col("nk")).as("n_rows"),
      sum(col("nk")).as("n_keys"),
      max(col("cnt")).as("top1_rows"))
    // disc percentile = smallest count value whose cumulative key
    // coverage reaches ceil(q * n_keys); selection is a conditional min
    // over the histogram frame against the broadcast 1-row totals
    val sel = cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("ck") >= expr("(n_keys + 1) div 2"), col("cnt")))
          .as("p50_key_rows"),
        min(when(col("ck") >= expr("(n_keys * 99 + 99) div 100"), col("cnt")))
          .as("p99_key_rows"))
    tot.crossJoin(broadcast(sel))
      .select(col("n_rows"), col("n_keys"), col("top1_rows"),
        (col("top1_rows").cast("double") / col("n_rows")).as("top1_share"),
        col("p50_key_rows"), col("p99_key_rows"),
        (col("p99_key_rows").cast("double") / col("p50_key_rows"))
          .as("skew_ratio"))
  }

  /** Order-aligned value-bucket width of #254's two-level rank:
    * $1k-wide lifetime-spend buckets (rev div 10⁵ cents) partition the
    * (rev desc, custkey) sort order, so within-bucket ranks plus a
    * bucket-histogram carry compose the exact global rank. The bucket
    * count is VALUE-RANGE/width bounded (a rev histogram — the
    * q_skew_stats count-histogram witness), never customer-count
    * bounded: at 100 TB the customer dimension grows ~linearly but the
    * spend range only drifts, so the carry frame stays thousands of
    * rows while no single window partition ever holds the dimension. */
  val DecileBucketCents = 100000L

  /** #254 — CUSTOMER DECILE LIFT: customers ranked by lifetime spend,
    * cut into 10 equal-count deciles, each reporting its revenue share
    * and the cumulative concentration curve — the Pareto/"whale"
    * report behind every LTV analysis (q_abc_analysis gives the A/B/C
    * cut over parts; this is the decile-grain customer view). The
    * corpus collapses to the per-customer decimal-cents frame in one
    * combinable shuffle; the global rank is NEVER one window
    * partition: ranks compute within [[DecileBucketCents]] rev buckets
    * (the bucket value partitions the sort order) and a broadcast
    * bucket-histogram carry (the docInterleave two-level discipline)
    * lifts them to exact global ranks. The decile id is exact integer
    * arithmetic ((rn−1)·10 div n) and the cumulative share runs over
    * 10 decile rows. Every double is a division of exact longs;
    * output is bit-identical to the single-window formulation it
    * replaces (same total order, same carry algebra). */
  def qDecileLift(s: SparkSession, dir: String): DataFrame = {
    // checkpointed: the total, the carry histogram and the ranked main
    // frame all read the customer-dimension frame once instead of each
    // re-running the orders aggregate (the q_abc_analysis measurement)
    val perCust = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("rev"))
      .withColumn("b", expr(s"rev div ${DecileBucketCents}L"))
      .localCheckpoint()
    val tot = perCust.agg(count(lit(1)).as("nc"),
      sum(col("rev")).as("total_rev"))
    // carry(b) = customers in HIGHER-rev buckets (rank order is rev
    // desc) — a combinable count over the bucket histogram, cumulated
    // over that bounded frame only
    val wCarry = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perCust.groupBy("b").agg(count(lit(1)).as("bc"))
      .withColumn("carry", coalesce(sum(col("bc")).over(wCarry), lit(0L)))
      .select("b", "carry")
    val wIn = Window.partitionBy("b").orderBy(col("rev").desc, col("o_custkey"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perCust
      .join(broadcast(carry), "b")
      .withColumn("rn", (col("carry") + row_number().over(wIn)).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("((rn - 1) * 10) div nc") + 1L)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev")).as("rev_cents"),
        max(col("total_rev")).as("total_rev"))
      .withColumn("cum_cents", sum(col("rev_cents")).over(wCum))
      .select(col("decile"), col("n_customers"), col("rev_cents"),
        (col("rev_cents").cast("double") / col("total_rev")).as("rev_share"),
        (col("cum_cents").cast("double") / col("total_rev"))
          .as("cum_rev_share"))
  }

  /** Path length and output depth of #255. */
  val PathLen = 3
  val PathTopK = 10

  /** #255 — EVENT PATH MINING: the top-10 most common 3-step event
    * sequences across all user journeys — the "what do users actually
    * do" path report product analytics builds Sankeys from (#121's
    * attribution asks who gets credit; this asks what the flows ARE).
    * Two leads over the (ts, event_id)-ordered user exchange emit each
    * row's forward 3-gram (per-key series partitions — the
    * ts_delta_encode shape); the count is one combinable aggregate
    * over a bounded key space (|event_types|³ ≤ 125 here), and the
    * top-10 is TakeOrderedAndProject on the (cnt desc, path) total
    * order — never a global sort. */
  def qEventPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(PathTopK)
  }
}
