package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/**
 * Spark-native re-expression of the reference TSDB surface
 * (reference: src/db.rs:33-80 — put/get/scan over (key, timestamp) → value;
 * src/level.rs:523-592 — compact/outdate lifecycle).
 *
 * The `events` table plays the role of the KV log: key = user_id,
 * logical timestamp = ts, value = value.
 *
 * Scale notes: every op is a single shuffle keyed on the key column (or
 * none at all for pure filters). Point/range reads are predicate-pushdown
 * filters — at 100 TB with shard/bucket-partitioned storage (see
 * graft.core.HelixStore) they become partition-pruned scans.
 */
object TimeSeriesOps {
  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val NumShards = 8

  /** #1 — sharded put layout: which (shard, day-bucket) each entry routes
    * to, as the reference's ShardingKeyFn does per key
    * (reference: src/db.rs:146-160, src/fn_registry.rs:55). */
  def putShard(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        pmod(col("user_id"), lit(NumShards)).as("shard_id"),
        unix_micros(date_trunc("DAY", col("ts"))).as("bucket_us"))
      .agg(count(lit(1)).as("cnt"))

  /** #2 — exact-timestamp point get (reference: src/db.rs:54). The probe
    * timestamp is "this key's newest", located with a per-key max —
    * equivalent to get(max_ts, key). */
  def getPoint(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") === 42)
    val probe = ev.agg(max("ts").as("ts"))
    ev.join(broadcast(probe), Seq("ts"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
  }

  /** #3 — time-range × key-range rectangle scan, (key, ts) ordered
    * (reference: src/db.rs:67-74, iterator.rs ShardMuxTimeIterator). The
    * global order comes from a range-partitioned sort, not a mux thread. */
  def scanRange(s: SparkSession, dir: String): DataFrame =
    Tables.eventsRange(s, dir,
      Some(Tables.dayUs("2024-01-05")), Some(Tables.dayUs("2024-01-12")))
      .filter(col("user_id").between(10, 50))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy("user_id", "ts_us")

  /** #4 — latest value per key as of T (TimeIterator newest-wins merge,
    * reference: src/iterator.rs). */
  def scanLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc)
    Tables.eventsRange(s, dir, None, Some(Tables.dayUs("2024-01-15")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
  }

  /** #5 — compaction block build: per (shard, key, rick-bucket) roll all
    * (ts, value) pairs into one block, as UDCF compress does
    * (reference: src/level.rs:356-470, src/fn_registry.rs:127-198).
    * Block stats stand in for the opaque compressed bytes. */
  def compactBlock(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        pmod(col("user_id"), lit(NumShards)).as("shard_id"),
        col("user_id"),
        unix_micros(date_trunc("DAY", col("ts"))).as("bucket_us"))
      .agg(
        count(lit(1)).as("n_entries"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** #6 — outdate/retention: drop everything older than the threshold,
    * report surviving day-buckets (reference: src/level.rs:337-354,584-588).
    * On partitioned storage this is a partition drop, not a rewrite. */
  def outdate(s: SparkSession, dir: String): DataFrame =
    Tables.eventsRange(s, dir, Some(Tables.dayUs("2024-01-10")), None)
      .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("bucket_us"))
      .agg(count(lit(1)).as("cnt"), countDistinct("user_id").as("n_keys"))

  /** #7 — time-hierarchy downsample: per key per hour rollup (the
    * "Hierarchy" capability in the reference README). */
  def downsample(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"),
        unix_micros(date_trunc("HOUR", col("ts"))).as("hour_us"))
      .agg(
        count(lit(1)).as("cnt"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_value"))

  /** #38 — skew-hardened downsample: identical output to #7, computed
    * as a two-phase SALTED aggregation — partials over (key, hour,
    * salt) spread one hot key across 8 reducers, the final phase merges
    * the 8 partials. Decimal sums keep the two-phase result exactly
    * equal to the direct one (same oracle as #7 proves it). */
  def downsampleSalted(s: SparkSession, dir: String): DataFrame = {
    val partial = Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("user_id"),
        unix_micros(date_trunc("HOUR", col("ts"))).as("hour_us"), col("salt"))
      .agg(
        count(lit(1)).as("pcnt"),
        min("value").as("pmin"),
        max("value").as("pmax"),
        sum(col("value").cast("decimal(18,2)")).as("psum"))
    partial.groupBy("user_id", "hour_us")
      .agg(
        sum("pcnt").as("cnt"),
        min("pmin").as("min_value"),
        max("pmax").as("max_value"),
        (sum("psum").cast("double") / sum("pcnt")).as("avg_value"))
  }

  /** #8 — per-key timestamp delta chain (the delta encoding a TS codec —
    * reference UDCF — would exploit; here surfaced as analytics). */
  def deltaEncode(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables.events(s, dir)
      .withColumn("delta_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("delta_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_deltas"),
        min("delta_us").as("min_delta_us"),
        max("delta_us").as("max_delta_us"),
        sum("delta_us").as("sum_delta_us"))
  }

  /** #32 — UDCF codec roundtrip: delta-compress every (key, day-bucket)
    * run into blocks, decompress back, and return the points — the
    * compress/decompress identity the reference's noop_udcf test checks
    * (reference: src/fn_registry.rs:200-222). The oracle is simply the
    * original table. */
  def codecRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TsCodec
    implicit val sp: SparkSession = s
    import sp.implicits._
    val pts = Tables.events(s, dir)
      .select(col("user_id").as("key"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[TsCodec.TsPoint]
    TsCodec.decompress(TsCodec.compress(pts, 86400L * 1000000L))
      .select(col("key").as("user_id"), col("ts_us"), col("value"))
  }

  /** #67 — per-key UDCF codec dispatch, end-to-end: even keys' blocks
    * pack through the Gorilla float codec, odd keys through noop — the
    * reference's register_dispatch_fn routing (fn_registry.rs:88) run
    * at query level over the REAL BlockCodec registry — then every
    * block decodes via its recorded codec name and the points come
    * back out. The oracle is the identity (same as #32): dispatching
    * must change the storage bytes, never the data. */
  def codecDispatch(s: SparkSession, dir: String): DataFrame = {
    import graft.core.{BlockCodec, GorillaCodec, NoopCodec}
    import graft.functions.TsCodec
    implicit val sp: SparkSession = s
    import sp.implicits._
    val registry: Map[String, BlockCodec] =
      Map(NoopCodec.name -> NoopCodec, GorillaCodec.name -> GorillaCodec)
    val route: Long => String =
      k => if (k % 2 == 0) GorillaCodec.name else NoopCodec.name
    val pts = Tables.events(s, dir)
      .select(col("user_id").as("key"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[TsCodec.TsPoint]
    TsCodec.decompressDispatch(
      TsCodec.compressDispatch(pts, 86400L * 1000000L, registry, route), registry)
      .select(col("key").as("user_id"), col("ts_us"), col("value"))
  }

  /** #33 — as-of join: each purchase event picks up the same user's
    * latest STRICTLY-prior view event. Expressed as a running
    * conditional max over a row frame — one shuffle on the key, no join
    * operator at all; this is the formulation that survives 100 TB
    * (a sort-merge as-of join degenerates to the same shuffle+sort). */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("prior_view_us",
        max(when(col("event_type") === "view", unix_micros(col("ts")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("prior_view_us"))
  }

  /** #34 — range join: events of the same user in the 5 minutes before
    * each purchase, counted via a RANGE window frame on epoch-µs — the
    * bounded-interval join as a single shuffle, no O(n·k) pair blowup. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-300000000L, -1L)
    Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("n_recent", count(lit(1)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("ts_us"), col("n_recent"))
  }

  /** #41 — gap fill: materialize every missing hour in each key's
    * range and carry the last observed hourly count forward. The hour
    * spine comes from sequence()+explode per key (bounded by that key's
    * own range), the fill from a running last_value — one shuffle. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("user_id"),
        expr("unix_micros(date_trunc('HOUR', ts)) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val spine = hourly.groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled_cnt", last(col("cnt"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("cnt").isNull.cast("int"))
      .select(col("user_id"), (col("hour") * 3600000000L).as("hour_us"),
        col("filled_cnt"), col("is_gap"))
  }

  /** Bounds for the windowed gap fill: users 10–50, hours of
    * [2024-01-05, 2024-01-12) — the ts_scan_range rectangle. */
  val GapFillUserLo = 10L
  val GapFillUserHi = 50L
  val GapFillHourLo: Long =
    java.time.Instant.parse("2024-01-05T00:00:00Z").toEpochMilli * 1000L / 3600000000L
  val GapFillHourHi: Long =
    java.time.Instant.parse("2024-01-12T00:00:00Z").toEpochMilli * 1000L / 3600000000L

  /** #194 — BOUNDED gap fill: the windowed form a 100 TB operator
    * actually ships. ts_gap_fill materializes every key's full-history
    * spine unconditionally — correct, but the output (and the sweep
    * ratio) grows with keys × total history. Here the spine is capped
    * to a queried key range and time window BEFORE anything is built:
    * the rectangle predicate pushes to the parquet scan, the hourly
    * aggregate sees only in-window rows, and the per-key spine spans
    * the key's observed hours INSIDE the window — so cost is bounded
    * by keys-in-range × window-hours no matter how much history the
    * corpus accumulates. Same fill semantics as ts_gap_fill
    * (last-observation-carried-forward, gap flag). */
  def gapFillRange(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .filter(col("user_id").between(GapFillUserLo, GapFillUserHi))
      .filter(expr("unix_micros(ts)").between(
        GapFillHourLo * 3600000000L, GapFillHourHi * 3600000000L - 1))
      .groupBy(col("user_id"),
        expr("unix_micros(date_trunc('HOUR', ts)) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val spine = hourly.groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled_cnt", last(col("cnt"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("cnt").isNull.cast("int"))
      .select(col("user_id"), (col("hour") * 3600000000L).as("hour_us"),
        col("filled_cnt"), col("is_gap"))
  }

  /** #196 — counter INCREASE with reset correction (PromQL increase):
    * per (key, day), the sum of deltas between consecutive samples
    * where a value DROP is a counter reset contributing the post-reset
    * value (the counter restarted from zero — the semantics ts_resets
    * counts and ts_rate sidesteps by filtering positive deltas). Exact
    * integer cents end to end, so the day totals are engine-exact; one
    * (key, day) shuffle carries the lag window and the rollup
    * (partitions bounded by one key-day's samples). event_id trails the
    * ORDER BY so the lag order is total BY CONSTRUCTION — not by
    * relying on (user_id, ts) uniqueness, which a per-user ts tie in a
    * future corpus would break differently in each engine. */
  def increase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day_us").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("prev", lag("cents", 1).over(w))
      .withColumn("inc", when(col("prev").isNull, lit(0L))
        .when(col("cents") >= col("prev"), col("cents") - col("prev"))
        .otherwise(col("cents")))
      .groupBy("user_id", "day_us")
      .agg(count(lit(1)).as("n_samples"), sum("inc").as("increase_cents"))
  }

  /** #197 — INSTANTANEOUS rate (PromQL irate): per key, the delta over
    * the LAST two samples only — the spike-sensitive companion to the
    * averaged ts_rate, with the same reset correction as ts_increase
    * (a drop contributes the post-reset value). The asc lag and the
    * desc last-row rank share ONE user_id shuffle (the ts_anomaly_mad
    * two-windows-one-exchange discipline). event_id trails both window
    * orders so they are total even under a per-user ts tie (dt_us = 0
    * would then make the division ±Inf identically in both engines
    * rather than pairing different rows nondeterministically). */
  def irate(s: SparkSession, dir: String): DataFrame = {
    val asc = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val desc = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("prev_ts", lag("ts_us", 1).over(asc))
      .withColumn("prev_c", lag("cents", 1).over(asc))
      .withColumn("rn", row_number().over(desc))
      .filter(col("rn") === 1 && col("prev_ts").isNotNull)
      .withColumn("d_cents",
        when(col("cents") >= col("prev_c"), col("cents") - col("prev_c"))
          .otherwise(col("cents")))
      .withColumn("dt_us", col("ts_us") - col("prev_ts"))
      .select(col("user_id"), col("d_cents"), col("dt_us"),
        (col("d_cents").cast("double") /
          (col("dt_us").cast("double") / 1000000.0)).as("rate_per_s"))
  }

  /** #204 — PromQL deriv(): per-key least-squares DERIVATIVE of the
    * gauge value over time — the trend-direction primitive served next
    * to rate() for gauges (rate is for counters; deriv fits a line).
    * Same closed-form OLS shape as ts_trend_fit (#161) but regressing
    * the VALUE (exact cents) on elapsed SECONDS from the key's first
    * sample, so x and y are both exact integers and Σx, Σy, Σxy, Σx²
    * are order-independent DECIMAL sums; the slope division is one
    * mirrored double chain. ONE key shuffle (the window min and the
    * regression agg share the user_id exchange); single-sample /
    * zero-variance keys yield NULL through the den=0 guard. */
  def deriv(s: SparkSession, dir: String): DataFrame = {
    val base = derivBase(s, dir, 1000000L)
    val n = count(lit(1)).cast("decimal(19,0)")
    val den = n * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))
    val num = n * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))
    base.groupBy("user_id")
      .agg(count(lit(1)).as("n_samples"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(num.cast("double") / den.cast("double"))
          .as("slope_cents_per_s"))
  }

  /** Shared regression frame for #204/#205: per key, x = elapsed time
    * since the key's own first sample floor-divided onto a unit grid
    * (seconds for #204, minutes for #205 — the coarser grid keeps
    * #205's intercept-sized numerator under 2^63, where the DuckDB
    * oracle's BIGINT→DOUBLE cast is correctly rounded; its
    * HUGEINT→DOUBLE cast is NOT, off by an ULP near halfway points),
    * y = exact cents. The window min and the downstream agg both key
    * on user_id — one exchange. */
  private def derivBase(s: SparkSession, dir: String, unitUs: Long): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("t0", min("ts_us").over(Window.partitionBy("user_id")))
      .select(col("user_id"),
        expr(s"(ts_us - t0) div ${unitUs}L").cast("decimal(19,0)").as("x"),
        col("cents").cast("decimal(19,0)").as("y"))

  /** Forecast horizon for #205 (one hour = 60 minute-units past each
    * key's last sample). */
  val PredictHorizonMin = 60L

  /** #205 — PromQL predict_linear(): the value each key's least-squares
    * line reaches [[PredictHorizonMin]] minutes past its LAST sample —
    * the disk-will-fill / quota-will-exhaust alerting primitive built
    * on the same five exact sums as #204. The affine form
    * intercept + slope·(x_last+H) is algebraically collapsed to ONE
    * division, (icpt_num + num·(x_last+H)) / den, whose numerator stays
    * in the exact integer domain — a single rounding per engine, so the
    * double is bit-identical by construction (a two-division chain
    * differed in the last ULP between engines). Same single key-shuffle
    * plan as #204; NULL through the same den=0 guard. */
  def predictLinear(s: SparkSession, dir: String): DataFrame = {
    val base = derivBase(s, dir, 60000000L)
    val n = count(lit(1)).cast("decimal(19,0)")
    val den = n * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))
    val num = n * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))
    val icpt = sum(col("y")) * sum(col("x") * col("x")) -
      sum(col("x")) * sum(col("x") * col("y"))
    base.groupBy("user_id")
      .agg(count(lit(1)).as("n_samples"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(
            (icpt + num * (max(col("x")) + lit(PredictHorizonMin)))
              .cast("double") / den.cast("double"))
          .as("predicted_cents"))
  }

  /** #206 — PromQL quantile_over_time(): exact interpolated p50/p95 of
    * value per (key, day). Unlike q_percentiles' corpus-wide two-phase
    * rank extraction, a (key, day) group is bounded by the scrape
    * interval (the ts_downsample argument), so a per-group window rank
    * is safe at any corpus size: row_number + count over ONE
    * (user_id, day) exchange, the two bracketing ranks of each target
    * selected by conditional min, and the interpolation h = (n−1)·q,
    * v = v_lo + (h − ⌊h⌋)(v_hi − v_lo) mirrored verbatim (event_id
    * breaks value ties so both engines rank identically). */
  def quantileDaily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day_us")
    def h(q: Double) = (col("n") - 1).cast("double") * lit(q)
    def bracket(q: Double, edge: Column => Column) =
      min(when(col("rn") === edge(h(q)) + 1, col("value")))
    def interp(q: Double, vlo: Column, vhi: Column): Column = {
      val hq = (col("n_samples") - 1).cast("double") * lit(q)
      vlo + (hq - floor(hq)) * (vhi - vlo)
    }
    Tables.events(s, dir)
      .select(col("user_id"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w.orderBy("value", "event_id")))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy("user_id", "day_us")
      .agg(count(lit(1)).as("n_samples"),
        bracket(0.50, floor).as("v50l"), bracket(0.50, ceil).as("v50h"),
        bracket(0.95, floor).as("v95l"), bracket(0.95, ceil).as("v95h"))
      .select(col("user_id"), col("day_us"), col("n_samples"),
        interp(0.50, col("v50l"), col("v50h")).as("p50"),
        interp(0.95, col("v95l"), col("v95h")).as("p95"))
  }

  /** #42 — counter rate (PromQL-style): per key, value delta over time
    * delta between consecutive events, averaged per day. Deltas are a
    * lag window; the rollup shares the same key shuffle. */
  def rate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables.events(s, dir)
      .withColumn("dv", col("value").cast("decimal(18,2)") -
        lag(col("value").cast("decimal(18,2)"), 1).over(w))
      .withColumn("dt_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("dt_us").isNotNull && col("dt_us") > 0)
      .groupBy(col("user_id"), unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("n_deltas"),
        (sum(col("dv")).cast("double") / (sum(col("dt_us")) / lit(1000000L))).as("rate_per_s"))
  }

  /** #56 — exponential moving average per key: the order-sensitive fold
    * EMA' = 0.25*v + 0.75*EMA from 0, over values ordered by (ts, value)
    * — the classic smoothing a TSDB serves alongside raw reads.
    *
    * Bounded-state formulation: the fold over one day-bucket's values is
    * AFFINE in its carry-in — f(x) = a*x + b with a = fold(1, acc ->
    * 0.75*acc) and b = fold(0, (acc,v) -> 0.25*v + 0.75*acc) — so the
    * first aggregate folds each (key, day) bucket independently and the
    * second composes the ordered per-bucket (a, b) pairs. No row ever
    * holds more than ONE DAY of one key's history (vs. the key's whole
    * history before), so a years-hot key can no longer OOM a task; the
    * per-key chain row is 3 doubles per day. The oracle composes the
    * identical (a, b) chain, so the doubles match bit-for-bit. */
  def ema(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("day", expr("tus div 86400000000"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("tus"), col("value")))).as("seq"))
      .select(col("user_id"), col("day"), col("n"),
        aggregate(col("seq"), lit(1.0), (acc, _) => lit(0.75) * acc).as("a"),
        aggregate(col("seq"), lit(0.0),
          (acc, x) => lit(0.25) * x.getField("value") + lit(0.75) * acc).as("b"))
    parts.groupBy("user_id")
      .agg(sum("n").as("n_events"),
        sort_array(collect_list(struct(col("day"), col("a"), col("b")))).as("chain"))
      .select(col("user_id"), col("n_events"),
        aggregate(col("chain"), lit(0.0),
          (acc, c) => c.getField("a") * acc + c.getField("b")).as("ema"))
  }

  /** #82 — counter-reset detection (PromQL resets()): how often each
    * key's cumulative counter went backwards, per day — the signal a
    * rate() consumer needs to trust its deltas. One lag window on the
    * key shuffle, rolled up per (key, day); integer counts only, so the
    * oracle is trivially exact. */
  def resets(s: SparkSession, dir: String): DataFrame = {
    // (ts, value) ordering: a bare ts order would make the lag pair —
    // and so the reset count — nondeterministic on same-timestamp rows
    val w = Window.partitionBy("user_id").orderBy("ts", "value")
    Tables.events(s, dir)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("user_id"), unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("n_deltas"),
        sum(when(col("value") < col("prev"), 1L).otherwise(0L)).as("n_resets"))
  }

  /** #80 — Holt linear-trend smoothing per key (level + trend, α=0.2,
    * β=0.1): the 2-D generalization of [[ema]]'s bounded-state trick.
    * The per-value update is affine in the (level, trend) state —
    * x' = M·x + d(v) with constant M — so a whole day-bucket composes
    * to ONE affine map (P, q) = (M^k, Σ M^(k-i)·d(v_i)), folded with a
    * 6-double accumulator over that bucket's values; the per-key chain
    * then composes the ordered (P, q) pairs. No row ever holds more
    * than one day of one key's history, whatever the total length. The
    * oracle folds the identical literals in the identical order, so the
    * doubles match bit-for-bit. */
  def holt(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("day", expr("tus div 86400000000"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("tus"), col("value")))).as("seq"))
      .select(col("user_id"), col("day"), col("n"),
        aggregate(col("seq"),
          struct(lit(1.0).as("p11"), lit(0.0).as("p12"), lit(0.0).as("p21"),
            lit(1.0).as("p22"), lit(0.0).as("q1"), lit(0.0).as("q2")),
          (acc, x) => {
            val v = x.getField("value")
            // M = [[0.8, 0.8], [-0.02, 0.98]], d(v) = [0.2v, 0.02v]
            struct(
              (lit(0.8) * acc.getField("p11") +
                lit(0.8) * acc.getField("p21")).as("p11"),
              (lit(0.8) * acc.getField("p12") +
                lit(0.8) * acc.getField("p22")).as("p12"),
              (lit(-0.02) * acc.getField("p11") +
                lit(0.98) * acc.getField("p21")).as("p21"),
              (lit(-0.02) * acc.getField("p12") +
                lit(0.98) * acc.getField("p22")).as("p22"),
              (lit(0.8) * acc.getField("q1") + lit(0.8) * acc.getField("q2") +
                lit(0.2) * v).as("q1"),
              (lit(-0.02) * acc.getField("q1") + lit(0.98) * acc.getField("q2") +
                lit(0.02) * v).as("q2"))
          }).as("f"))
    parts.groupBy("user_id")
      .agg(sum("n").as("n_events"),
        sort_array(collect_list(struct(col("day"), col("f")))).as("chain"))
      .select(col("user_id"), col("n_events"),
        aggregate(col("chain"),
          struct(lit(0.0).as("l"), lit(0.0).as("t")),
          (acc, c) => {
            val f = c.getField("f")
            struct(
              (f.getField("p11") * acc.getField("l") +
                f.getField("p12") * acc.getField("t") + f.getField("q1")).as("l"),
              (f.getField("p21") * acc.getField("l") +
                f.getField("p22") * acc.getField("t") + f.getField("q2")).as("t"))
          }).as("st"))
      .select(col("user_id"), col("n_events"),
        col("st.l").as("level"), col("st.t").as("trend"))
  }

  /** #57 — sliding-window event counts (1 h window, 15 min slide): every
    * event lands in 4 overlapping windows; Spark's window() generator
    * expands them map-side, then one (window, type) shuffle aggregates —
    * the batch twin of the streaming sliding-window aggregation. */
  def slidingCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .groupBy(unix_micros(col("w.start")).as("win_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** #75 — per-key z-score anomalies: events more than 2.5 standard
    * deviations from their key's mean. Stats come from ONE map-side-
    * combinable agg (count + exact decimal Σv and Σv², so the mean/
    * variance doubles are order-independent and bit-equal in the
    * oracle); the tiny per-key frame broadcasts back onto the fact
    * scan, so flagging is a single codegen comparison per row — two
    * fact passes total, no window over unbounded key history. */
  def zscore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val stats = ev.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      (sum(dec("value")).cast("double") / count(lit(1))).as("mean"),
      (sum(dec("value") * dec("value")).cast("double") / count(lit(1))).as("msq"))
    val z = (col("value") - col("mean")) /
      sqrt(col("msq") - col("mean") * col("mean"))
    // no broadcast hint: the stats frame is one row PER KEY — unbounded
    // at scale. AQE broadcasts it while it is small and falls back to a
    // shuffle join once the key domain outgrows the threshold.
    ev.join(stats, "user_id")
      .filter(col("n") >= 2 && col("msq") - col("mean") * col("mean") > 0 &&
        abs(z) > 2.5)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"), z.as("z_score"))
  }

  /** #76 — linear interpolation over the hourly grid: like [[gapFill]]
    * but gap hours get a value interpolated between the neighboring
    * observed hourly averages instead of a carry-forward. Every spine
    * hour lies either ON an observed point or strictly BETWEEN two
    * consecutive ones (the spine ends at observed extremes), so instead
    * of materializing the spine and running fill windows over it, each
    * observed point looks ONE row ahead (a single lead window over the
    * observed frame — ~gap-ratio× fewer rows than the spine) and emits
    * itself plus its trailing gap hours from one sequence explode. No
    * spine join, no IGNORE NULLS scans, one sort of the observed frame.
    * The hourly average divides an exact decimal sum, and the
    * interpolation arithmetic matches the oracle's operation order
    * exactly. */
  def interpLinear(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("user_id"),
        expr("unix_micros(date_trunc('HOUR', ts)) div 3600000000").as("hour"))
      .agg((sum(dec("value")).cast("double") / count(lit(1))).as("avg_v"))
    val w = Window.partitionBy("user_id").orderBy("hour")
    // one struct-valued lead: the next observation's (hour, value)
    val nxt = lead(struct(col("hour").as("h"), col("avg_v").as("v")), 1).over(w)
    hourly
      .withColumn("next", nxt)
      // each observed row covers [hour, next.h) of the spine: itself +
      // the gap hours up to (exclusive) the next observation; the last
      // observation per key covers just itself
      .select(col("user_id"), col("hour").as("ph"), col("avg_v").as("pv"),
        col("next"),
        explode(sequence(col("hour"),
          coalesce(col("next.h") - 1, col("hour")))).as("hour"))
      .select(col("user_id"), (col("hour") * 3600000000L).as("hour_us"),
        when(col("hour") === col("ph"), col("pv"))
          .otherwise(col("pv") + (col("next.v") - col("pv")) *
            ((col("hour") - col("ph")).cast("double") /
              (col("next.h") - col("ph")).cast("double"))).as("interp_v"),
        (col("hour") =!= col("ph")).cast("int").as("is_gap"))
  }

  /** #99 — CUSUM changepoint per key: the time t* maximizing the
    * centered cumulative-sum deviation |S_t| = |cum_t − t·mean| — the
    * classic single-changepoint location statistic. Engine-exact by
    * CLEARING DENOMINATORS: the argmax of |cum_t − t·(total/n)| equals
    * the argmax of |n·cum_t − t·total| over integers, so both engines
    * compare exact scaled-integer scores (values ×100 into DECIMAL(38,0)
    * here, HUGEINT in the oracle) and divide back to a double only ONCE
    * for the reported deviation. Ordering (ts, value) pins duplicate
    * timestamps; ties on the score break to the earliest t. One key
    * shuffle: the running sum, row number, and whole-partition totals
    * all share the (user_id) partitioning. */
  def changepoint(s: SparkSession, dir: String): DataFrame = {
    val wRun = Window.partitionBy("user_id").orderBy("ts", "value")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("user_id")
    val v100 = (dec("value") * 100).cast("decimal(38,0)")
    val scored = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("value"), v100.as("v100"))
      .withColumn("cum", sum("v100").over(wRun))
      .withColumn("t", row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "value")))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum("v100").over(wAll))
      .withColumn("score",
        abs(col("cum") * col("n") - col("t").cast("decimal(38,0)") * col("total")))
    scored.groupBy("user_id")
      .agg(max(struct(col("score"), (-col("t")).as("negt"),
        unix_micros(col("ts")).as("tus"), col("n").as("nn"))).as("best"))
      .select(col("user_id"), col("best.tus").as("cp_us"),
        (col("best.score").cast("double") / (lit(100.0) * col("best.nn"))).as("dev"))
  }

  /** #95 — seasonal profile: average value by (event_type,
    * hour-of-day) — the diurnal-pattern query every TSDB dashboard
    * serves. Decimal-exact sums with ONE double division at the end
    * (mirrored order in the oracle), a single map-side-combinable agg
    * to ≤ 24 rows per type. */
  def seasonalProfile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_value"))

  /** #90 — top movers: per key, the value change from its FIRST to its
    * LAST observation, top-10 by absolute move. First/last are single
    * struct-ordered aggregates — min/max over (ts, event_id, value)
    * tuples, so one map-side-combinable shuffle replaces the two
    * per-key rank windows a naive formulation pays, and the
    * (ts, event_id) tiebreak is total (event_id unique) so the oracle
    * picks identical endpoints. Top-10 is TakeOrderedAndProject with a
    * full deterministic sort key, never a global sort. */
  def topMovers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"), col("value"))).as("f"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("l"))
      .select(col("user_id"), col("f.value").as("first_v"),
        col("l.value").as("last_v"),
        (col("l.value") - col("f.value")).as("delta"))
      .orderBy(abs(col("delta")).desc, col("user_id"))
      .limit(10)

  /** #107 — lag-1 autocorrelation per key: how much a series predicts
    * its own next value — the persistence signal behind seasonality
    * detection and forecast-model selection (Holt vs naive). Consecutive
    * (value, next value) pairs come from ONE lead window on the
    * (ts, event_id)-ordered key shuffle (event_id tiebreak: same-ts rows
    * would otherwise pair nondeterministically — the ts_resets lesson);
    * the Pearson formula then runs on SIX exact sums — values scale to
    * integer cents through DECIMAL(18,2)·100 so every sum/product is
    * integer-exact — with ONE closed-form double expression ordered
    * identically in the oracle (the q_corr discipline). Zero-variance
    * keys emit NULL through the same exact-integer CASE both engines
    * evaluate. One shuffle, map-side-combinable sums, bounded state. */
  def autocorr(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("decimal(19,0)")
    val paired = Tables.events(s, dir)
      .withColumn("x", cents)
      .withColumn("y", lead(cents, 1).over(w))
      .filter(col("y").isNotNull)
    val n = count(lit(1)).cast("decimal(19,0)")
    val vx = n * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))
    val vy = n * sum(col("y") * col("y")) - sum(col("y")) * sum(col("y"))
    paired.groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        when(vx === 0 || vy === 0, lit(null).cast("double"))
          .otherwise((n * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y")))
            .cast("double") /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .as("acf1"))
  }

  /** #108 — OHLC downsampling per (key, hour): open/high/low/close +
    * count, the candlestick rollup every market/metrics TSDB serves.
    * Open/close are struct-ordered min/max over (ts, event_id, value) —
    * deterministic endpoint picks with NO rank window (the ts_top_movers
    * technique), so the whole operator is one map-side-combinable
    * aggregate on a single (key, hour) shuffle. */
  def ohlc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"),
        unix_micros(date_trunc("HOUR", col("ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("ts"), col("event_id"), col("value"))).as("f"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("l"),
        max(col("value")).as("high"),
        min(col("value")).as("low"))
      .select(col("user_id"), col("hour_us"), col("f.value").as("open"),
        col("high"), col("low"), col("l.value").as("close"), col("n_events"))

  /** #9 — batched multi-key point get (one shuffle for the whole batch;
    * reference does N sharded gets, src/db.rs:171-196). */
  def multiGet(s: SparkSession, dir: String): DataFrame = {
    val keys = Seq(7L, 42L, 99L, 123L)
    val ev = Tables.events(s, dir).filter(col("user_id").isin(keys: _*))
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
  }

  /** Cumulative histogram bucket bounds (PromQL `le` labels) for
    * #120; the last bound is the finite stand-in for +Inf (values cap
    * at ~490 in the testdata). */
  val HqBounds: Seq[Double] = Seq(5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0)

  /** #120 — PromQL-style `histogram_quantile(0.9, …)` over bucketed
    * counters: per event type, cumulative `le`-bucket counts (the shape
    * a scrape-time histogram metric actually stores) and the p90
    * linearly interpolated inside the first bucket whose cumulative
    * count reaches the 0.9 rank — Prometheus's estimator, which only
    * ever sees bucket counts, not raw samples (that is the point: at
    * 100 TB of metrics the raw stream is gone; the 7 counters per
    * series survive). ONE map-side-combinable conditional-count agg on
    * the type shuffle (7 integers per partition per type), then pure
    * 1-row-per-type arithmetic. Bucket selection compares integers
    * (10·cum ≥ 9·total); the interpolation division chain is mirrored
    * verbatim in the oracle. */
  def histogramQuantile(s: SparkSession, dir: String): DataFrame = {
    val n = HqBounds.length
    val cums = HqBounds.zipWithIndex.map { case (b, i) =>
      sum((col("value") <= b).cast("long")).as(s"c$i")
    }
    val aggCols = count(lit(1)).as("total") +: cums
    val agg = Tables.events(s, dir)
      .groupBy("event_type")
      .agg(aggCols.head, aggCols.tail: _*)
    // first bucket i with 10*cum_i >= 9*total; p90 = lo + ((0.9*total -
    // cumPrev) / bucketCount) * (hi - lo), written lowest-bucket-first
    // so the chained when() picks the same bucket as the oracle's
    // row_number over (i ASC)
    val pick = (0 until n).foldRight(lit(null).cast("double")) { (i, rest) =>
      val cum = col(s"c$i")
      val prev = if (i == 0) lit(0L) else col(s"c${i - 1}")
      val lo = if (i == 0) lit(0.0) else lit(HqBounds(i - 1))
      val hi = lit(HqBounds(i))
      val cnt = cum - prev
      when(cum * 10 >= col("total") * 9 && cnt > 0,
        lo + ((col("total") * 9 / lit(10.0) - prev.cast("double")) /
          cnt.cast("double")) * (hi - lo))
        .otherwise(rest)
    }
    agg.select(col("event_type") +: col("total") +:
      (0 until n).map(i => col(s"c$i")) :+ pick.as("p90"): _*)
  }

  /** #124 — SRE error-budget BURN RATE per day against a 99% SLO: the
    * alerting arithmetic of Google's SRE workbook (multiwindow burn
    * alerts — public) over the event stream. burn = err_ratio / (1 −
    * SLO); breach (burn > 1 ⇔ budget consumed faster than allotted)
    * compares INTEGERS (err·100 > total) so threshold days can't flip
    * across engines; the reported burn double divides in one mirrored
    * chain. ONE map-side-combinable conditional count on the day
    * shuffle. */
  /** #129 — ROBUST anomaly detection per key: |v − median| > 3·MAD
    * (median absolute deviation — the outlier rule that, unlike
    * z-scores (ts_zscore), is not itself dragged by the outliers). All
    * medians are EXACT and integer: values scale to cents, and each
    * median is kept DOUBLED (odd n → 2·middle, even n → lower+upper —
    * a conditional sum at the two middle ranks, no division), so
    * deviations (d = |2v − m2|) and the flag (2·d > 3·mad2 ⇔
    * |v−med| > 3·MAD) compare as integers end-to-end; the two
    * reported doubles divide once each, mirrored. Cost shape: MAD is
    * inherently two-pass (the deviation median needs the value median
    * first), so the plan is two rank-window passes keyed on user_id
    * plus joins of the tiny per-key median frames (AQE broadcasts
    * them at test scale; at fleet scale they become co-keyed shuffle
    * joins on the same user_id hashing). The fact scans stay
    * column-pruned to 4 columns. */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    // Windows-only: both medians come from full-partition conditional
    // sums at the two middle ranks, so the fact is scanned ONCE and
    // shuffled ONCE — each median pass adds a Sort within the same
    // user_id partitioning, never a join or a second exchange (a
    // groupBy+join-back formulation re-evaluated the base 3-4×).
    val byUser = Window.partitionBy("user_id")
    def doubledMedianCol(c: Column, rn: Column): Column =
      sum(when(rn === expr("(n + 1) div 2"), c)).over(byUser) +
        sum(when(rn === expr("(n + 2) div 2"), c)).over(byUser)
    val wv = byUser.orderBy(col("v100"), col("event_id"))
    val base = Tables.events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("value"),
      (dec("value") * 100).cast("long").as("v100"))
      .withColumn("rn", row_number().over(wv))
      .withColumn("n", count(lit(1)).over(byUser))
      .withColumn("m2", doubledMedianCol(col("v100"), col("rn")))
      .withColumn("d", abs(lit(2) * col("v100") - col("m2")))
    val wd = byUser.orderBy(col("d"), col("event_id"))
    base
      .withColumn("rn2", row_number().over(wd))
      .withColumn("mad2", doubledMedianCol(col("d"), col("rn2")))
      .filter(col("mad2") > 0 && lit(2) * col("d") > lit(3) * col("mad2"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        (col("d").cast("double") / 200.0).as("dev"),
        (col("mad2").cast("double") / 400.0).as("mad"))
  }

  /** Minimum run length for an error burst. */
  val BurstMin = 3

  /** #130 — ERROR-BURST detection per key: maximal runs of ≥
    * [[BurstMin]] consecutive error events (consecutive in the key's
    * own event order) — the incident-window extraction behind alert
    * grouping, reported with start/end timestamps and length. Island
    * detection via the lag + running-sum pair (the dedup_spans
    * technique): one lag window marks run breaks, a running sum labels
    * islands, and a final combinable agg per (key, island) emits the
    * bursts — all three operators share the single user_id shuffle,
    * and per-row state is one lag value (no key-history arrays).
    * Integer-only: timestamps epoch-µs, lengths counts. */
  def errorBursts(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("event_type") === "error").cast("int").as("is_err"))
      .withColumn("brk",
        when(col("is_err") === 1 &&
          coalesce(lag(col("is_err"), 1).over(w), lit(0)) === 1, 0)
          .otherwise(1))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("is_err") === 1)
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("burst_len"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .filter(col("burst_len") >= BurstMin)
      .select(col("user_id"), col("start_us"), col("end_us"), col("burst_len"))
  }

  def slaBurn(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("n_total"),
        sum((col("event_type") === "error").cast("long")).as("n_err"))
      .select(col("day_us"), col("n_total"), col("n_err"),
        ((col("n_err").cast("double") / col("n_total")) / 0.01).as("burn"),
        (col("n_err") * 100 > col("n_total")).cast("int").as("breach"))

  /** #148 — DAY-OVER-DAY / WEEK-OVER-WEEK deltas per event type (the
    * dashboard comparison every metrics page serves): per (type, day)
    * counts, then the delta vs the previous day and vs the same
    * weekday last week. Lags are BY DAY VALUE, not by row — missing
    * days must yield NULL deltas, not silently compare against an
    * older day — so the comparisons are two self-LEFT-joins of the
    * per-day frame against itself shifted by 1 and 7 days; the frame
    * is calendar-bounded (days × types) at any corpus size, so the
    * joins are trivial after the ONE corpus-scan aggregate. Pure
    * integer arithmetic. */
  def dodWow(s: SparkSession, dir: String): DataFrame = {
    val perDay = Tables.events(s, dir)
      .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // calendar-bounded; seeds three join sides
    val DayUs = 86400000000L
    val prev = perDay.select(col("event_type"),
      (col("day_us") + DayUs).as("day_us"), col("cnt").as("prev_cnt"))
    val lastWeek = perDay.select(col("event_type"),
      (col("day_us") + 7 * DayUs).as("day_us"), col("cnt").as("lw_cnt"))
    perDay
      .join(prev, Seq("event_type", "day_us"), "left")
      .join(lastWeek, Seq("event_type", "day_us"), "left")
      .select(col("event_type"), col("day_us"), col("cnt"),
        (col("cnt") - col("prev_cnt")).as("dod"),
        (col("cnt") - col("lw_cnt")).as("wow"))
  }

  /** #143 — CASCADING ROLLUP hour → day → month (the materialized
    * time-hierarchy every TSDB maintains — reference level.rs's
    * time-bucket folds, lifted to a multi-grain cascade): each coarser
    * grain aggregates the PREVIOUS grain's frame, never the raw corpus
    * — the point of the cascade at 100 TB is that the day rollup reads
    * hours×types rows (bounded by the calendar) instead of re-scanning
    * the events table, which is exactly how incremental rollup
    * maintenance runs in production. The hourly and daily frames are
    * localCheckpointed: they ARE the materialized rollups (tiny —
    * calendar-bounded), and each seeds two consumers (its own output
    * slice + the next grain). Decimal sums are associative-exact, so
    * every cascaded value equals the direct-at-grain aggregate the
    * oracle computes. One corpus scan total. */
  def rollupCascade(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(unix_micros(date_trunc("HOUR", col("ts"))).as("bucket_us"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .localCheckpoint()
    val daily = hourly
      .groupBy((expr("bucket_us div 86400000000") * lit(86400000000L))
        .as("bucket_us"), col("event_type"))
      .agg(sum("cnt").as("cnt"), sum("sv").as("sv"))
      .localCheckpoint()
    val monthly = daily
      .groupBy(unix_micros(date_trunc("MONTH", timestamp_micros(col("bucket_us"))))
        .as("bucket_us"), col("event_type"))
      .agg(sum("cnt").as("cnt"), sum("sv").as("sv"))
    hourly.withColumn("grain", lit("hour"))
      .unionByName(daily.withColumn("grain", lit("day")))
      .unionByName(monthly.withColumn("grain", lit("month")))
      .select(col("grain"), col("bucket_us"), col("event_type"),
        col("cnt"), col("sv").cast("double").as("sum_value"))
  }

  /** #158 — Holt one-step BACKTEST: walk-forward forecast-accuracy
    * report for the #80 smoother — per key, the mean absolute error of
    * the day-ahead forecast (level + trend BEFORE seeing the day)
    * against the day's exact decimal mean value. This is the
    * model-selection loop every forecasting TSDB runs before trusting a
    * smoother (SREs pick per-series models by exactly this walk-forward
    * error). Same bounded-state shape as ts_holt — per-day 6-double
    * affine fold, then ONE per-key chain fold that now also accumulates
    * |forecast − actual| sequentially (deterministic: the fold is
    * left-to-right over the day-sorted array on both engines, so plain
    * double accumulation is bit-identical — no cross-row sum exists).
    * Day 1's forecast comes from the (0,0) cold-start state, included
    * by design (both engines mirror it). One shuffle per level, state
    * bounded regardless of key length. */
  def holtBacktest(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("day", expr("tus div 86400000000"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"),
        (sum(dec("value")).cast("double") / count(lit(1))).as("mean_v"),
        sort_array(collect_list(struct(col("tus"), col("value")))).as("seq"))
      .select(col("user_id"), col("day"), col("n"), col("mean_v"),
        aggregate(col("seq"),
          struct(lit(1.0).as("p11"), lit(0.0).as("p12"), lit(0.0).as("p21"),
            lit(1.0).as("p22"), lit(0.0).as("q1"), lit(0.0).as("q2")),
          (acc, x) => {
            val v = x.getField("value")
            struct(
              (lit(0.8) * acc.getField("p11") +
                lit(0.8) * acc.getField("p21")).as("p11"),
              (lit(0.8) * acc.getField("p12") +
                lit(0.8) * acc.getField("p22")).as("p12"),
              (lit(-0.02) * acc.getField("p11") +
                lit(0.98) * acc.getField("p21")).as("p21"),
              (lit(-0.02) * acc.getField("p12") +
                lit(0.98) * acc.getField("p22")).as("p22"),
              (lit(0.8) * acc.getField("q1") + lit(0.8) * acc.getField("q2") +
                lit(0.2) * v).as("q1"),
              (lit(-0.02) * acc.getField("q1") + lit(0.98) * acc.getField("q2") +
                lit(0.02) * v).as("q2"))
          }).as("f"))
    parts.groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("f"), col("mean_v"))))
          .as("chain"))
      .select(col("user_id"), col("n_days"),
        aggregate(col("chain"),
          struct(lit(0.0).as("l"), lit(0.0).as("t"), lit(0.0).as("esum")),
          (acc, c) => {
            val f = c.getField("f")
            struct(
              (f.getField("p11") * acc.getField("l") +
                f.getField("p12") * acc.getField("t") + f.getField("q1")).as("l"),
              (f.getField("p21") * acc.getField("l") +
                f.getField("p22") * acc.getField("t") + f.getField("q2")).as("t"),
              (acc.getField("esum") +
                abs((acc.getField("l") + acc.getField("t")) -
                  c.getField("mean_v"))).as("esum"))
          }).as("st"))
      .select(col("user_id"), col("n_days"),
        (col("st.esum") / col("n_days")).as("mae"))
  }

  /** Fixed event-type basis for the mix-shift L1 fold (sorted — the
    * fold order is part of the cross-engine contract). */
  val MixTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** #186 — day-over-day MIX SHIFT: L1 distance between consecutive
    * days' event-type share vectors — the ingest-distribution drift
    * monitor every training-data pipeline runs daily (a feed silently
    * changing its mix shows here before any model metric moves; L1 is
    * total-variation ×2). ONE corpus scan folds to per-day conditional
    * counts (checkpointed); the shift is a day-VALUE self-join (the
    * ts_dod_wow discipline — a lag window would silently compare
    * across gaps) and the L1 folds over the FIXED sorted type basis in
    * one mirrored chain of share divisions, PLUS a residual "other"
    * component (n − Σcᵢ) appended last: an event type outside the
    * hardcoded basis (a newly introduced type — exactly the ingest
    * change this monitor exists to catch) contributes its mass to the
    * distance directly instead of showing up only as uniform
    * attenuation of the known types' shares. */
  def mixShift(s: SparkSession, dir: String): DataFrame = {
    val aggs = count(lit(1)).as("n") +: MixTypes.zipWithIndex.map {
      case (t, i) =>
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"c$i")
    }
    val per = Tables.events(s, dir)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint()
    val prev = per.select((col("d") + 1).as("d") +: col("n").as("pn") +:
      MixTypes.indices.map(i => col(s"c$i").as(s"p$i")): _*)
    val curOther = MixTypes.indices.map(i => col(s"c$i"))
      .foldLeft(col("n"))(_ - _)
    val prevOther = MixTypes.indices.map(i => col(s"p$i"))
      .foldLeft(col("pn"))(_ - _)
    val l1 = (MixTypes.indices.map(i =>
      abs(col(s"c$i").cast("double") / col("n") -
        col(s"p$i").cast("double") / col("pn"))) :+
      abs(curOther.cast("double") / col("n") -
        prevOther.cast("double") / col("pn"))).reduce(_ + _)
    per.join(prev, "d")
      .select((col("d") * 86400000000L).as("day_us"),
        col("n").as("n_events"), col("pn").as("n_prev"), l1.as("mix_shift"))
  }

  /** #182 — per-key VALUE BANDS: exact p10 / p90 envelope of each
    * series' values (integer cents, order-statistic selection — p10 =
    * first rank with 10·rn ≥ n, p90 with 10·rn ≥ 9·n, the
    * doc_len_percentiles discipline) — the per-series normal band an
    * anomaly UI shades behind the line, exact where a t-digest drifts.
    * ONE key shuffle shared by the rank window and both full-partition
    * conditional mins; partitions bounded per key. */
  def valueBands(s: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("user_id")
    val w = byKey.orderBy(col("c"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byKey))
      .withColumn("p10c",
        min(when(col("rn") * 10 >= col("n"), col("c"))).over(byKey))
      .withColumn("p90c",
        min(when(col("rn") * 10 >= col("n") * 9, col("c"))).over(byKey))
      .groupBy("user_id")
      .agg(max("n").as("n_events"),
        (max("p10c").cast("double") / 100.0).as("p10_value"),
        (max("p90c").cast("double") / 100.0).as("p90_value"))
  }

  /** Gap threshold (1 h) and staleness horizon (1 day) for #179. */
  val GapThreshUs = 3600000000L
  val StaleHorizonUs = 86400000000L

  /** #179 — per-series LIVENESS / GAP report: for every key, event
    * count, largest inter-event gap, count of gaps over 1 h, last seen
    * timestamp, and a stale flag (no event within 1 day of the
    * corpus's newest point) — the PromQL `absent()` class of check,
    * run across the whole key space to find silently-dead series
    * before dashboards do. ONE (ts, event_id)-ordered key shuffle
    * carries the lag and the rollup; the global horizon is a broadcast
    * 1-row max; all-integer comparisons. */
  def gapStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val gmax = ev.agg(max("ts_us").as("gmax"))
    ev.withColumn("g", col("ts_us") - lag("ts_us", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("g").as("max_gap_us"),
        sum(when(col("g") > GapThreshUs, 1L).otherwise(0L)).as("n_long_gaps"),
        max("ts_us").as("last_ts_us"))
      .crossJoin(broadcast(gmax))
      .select(col("user_id"), col("n_events"), col("max_gap_us"),
        col("n_long_gaps"), col("last_ts_us"),
        (col("last_ts_us") < col("gmax") - StaleHorizonUs).as("stale"))
  }

  /** #177 — WEEKLY seasonal profile: event counts + decimal-exact mean
    * value by (type, weekday, hour) — the weekly-rhythm companion to
    * the diurnal #95 (capacity planning and anomaly baselines need
    * both; a Monday-morning spike is invisible in an hour-only
    * profile). Weekday derives from pure integer epoch arithmetic
    * ((day + 3) mod 7, Monday = 0) so no engine calendar/locale
    * convention can disagree. ONE combinable aggregate to ≤
    * 7·24·n_types rows. */
  def weekdayProfile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 3) % 7").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"),
        (sum(dec("value")).cast("double") / count(lit(1))).as("avg_value"))

  /** Reviewer config for #166, in day units (outdate an integer
    * multiple of rick, as reference level.rs:543 documents). */
  val TierRickDays = 7L
  val TierOutdateDays = 21L

  /** #166 — LIFECYCLE TIERING simulation: replay the reference's
    * SimpleTimestampReviewer state machine (level.rs:571-592 — compact
    * when ts − last_compacted + 1 ≥ rick_range, advancing
    * last_compacted to ts+1; outdate emitting last_outdated +
    * rick_range − 1 and stepping last_outdated by rick_range) over the
    * workload's own observed write days, then classify every day
    * bucket: still in the RICK (row log), frozen into a numbered
    * SSTable LEVEL, or OUTDATED — "what would the store's lifecycle do
    * to this workload". Days rebase to the corpus's first day (the
    * reference counts logical time from 0). The sequential state
    * machine folds over ONE sorted array of distinct days
    * (calendar-bounded, never corpus-sized); classification is a
    * broadcast of the final (intervals, outdate bound) row against the
    * per-day frame — interval membership via a prefix count into the
    * sorted starts, integer-only end-to-end. */
  def lifecycleTiers(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val arr = days.agg(min(col("d")).as("d0"),
      sort_array(collect_list(col("d"))).as("ds"))
    val state = arr.select(col("d0"), aggregate(
      transform(col("ds"), d => d - col("d0")),
      struct(lit(0L).as("lc"), lit(0L).as("lo"),
        lit(null).cast("long").as("ob"),
        array().cast("array<long>").as("cs"),
        array().cast("array<long>").as("ce")),
      (acc, d) => {
        val comp = d - acc.getField("lc") + 1 >= TierRickDays
        val outd = d - acc.getField("lo") + 1 >= TierOutdateDays
        struct(
          when(comp, d + 1).otherwise(acc.getField("lc")).as("lc"),
          when(outd, acc.getField("lo") + TierRickDays)
            .otherwise(acc.getField("lo")).as("lo"),
          when(outd, acc.getField("lo") + TierRickDays - 1)
            .otherwise(acc.getField("ob")).as("ob"),
          when(comp, concat(acc.getField("cs"), array(acc.getField("lc"))))
            .otherwise(acc.getField("cs")).as("cs"),
          when(comp, concat(acc.getField("ce"), array(d)))
            .otherwise(acc.getField("ce")).as("ce"))
      }).as("st"))
    days.crossJoin(broadcast(state))
      .withColumn("dr", col("d") - col("d0"))
      .withColumn("nst", size(filter(col("st.cs"), s1 => s1 <= col("dr"))))
      .withColumn("ceAt",
        when(col("nst") >= 1, element_at(col("st.ce"), col("nst"))))
      .withColumn("lvl",
        when(col("nst") >= 1 && col("dr") <= col("ceAt"),
          col("nst").cast("long")))
      .select((col("d") * 86400000000L).as("day_us"), col("cnt"),
        when(col("st.ob").isNotNull && col("dr") <= col("st.ob"), "outdated")
          .when(col("lvl").isNotNull, "level")
          .otherwise("rick").as("tier"),
        col("lvl").as("level_id"))
  }

  /** #164 — MULTIWINDOW BURN-RATE paging alert (the SRE-workbook rule:
    * page when BOTH the short and the long window burn the error
    * budget faster than 14.4× — long window for significance, short so
    * the alert resets once the incident ends): service error ratio
    * (type = 'error' over all events) per 5-minute bucket, trailing
    * 1-hour window as 12 bucket rows. The corpus folds to the
    * calendar-bounded bucket frame in ONE combinable aggregate
    * (checkpointed — rows grow with wall time, not data volume);
    * missing buckets complete to zero via the aggregate's own spine so
    * ROWS-12 frames always mean one real hour; both threshold compares
    * are integer cross-products (1000·err > 144·total ⟺ burn > 14.4),
    * burn values divide in mirrored chains. The partitionless window is
    * bounded by the calendar (q_session_concurrency precedent). */
  def slaMultiwindow(s: SparkSession, dir: String): DataFrame = {
    val B = 300000000L // 5 minutes in epoch-µs
    val bucket = Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $B").as("b"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      .localCheckpoint()
    val spine = bucket
      .agg(min("b").as("lo"), max("b").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("b"))
    val full = spine.join(bucket, Seq("b"), "left")
      .select(col("b"), coalesce(col("total"), lit(0L)).as("total"),
        coalesce(col("err"), lit(0L)).as("err"))
    val w12 = Window.orderBy("b").rowsBetween(-11, 0)
    full
      .withColumn("err1h", sum("err").over(w12))
      .withColumn("tot1h", sum("total").over(w12))
      .filter(col("total") > 0 && col("tot1h") > 0 &&
        col("err") * 1000 > col("total") * 144 &&
        col("err1h") * 1000 > col("tot1h") * 144)
      .select((col("b") * B).as("bucket_us"), col("err"), col("total"),
        col("err1h"), col("tot1h"),
        ((col("err").cast("double") * 100) / col("total")).as("burn_5m"),
        ((col("err1h").cast("double") * 100) / col("tot1h")).as("burn_1h"))
  }

  /** #161 — per-key LINEAR TREND fit over daily event counts: ordinary
    * least squares slope/intercept in CLOSED FORM from five integer
    * sums (x = day index from the key's own first day, y = daily count
    * — both exact integers, so Σx, Σy, Σxy, Σx², n are
    * order-independent DECIMAL sums and the slope/intercept divisions
    * are single mirrored chains). This is the capacity-planning /
    * trend-alerting primitive ("is this series growing and how fast")
    * a TSDB serves across its whole key space: ONE corpus scan to the
    * per-(key, day) count frame, ONE key shuffle for the regression
    * sums — both map-side combinable; single-day keys yield NULL slope
    * through the same zero-variance guard as ts_autocorr. */
  def trendFit(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
    val perKey = daily
      .withColumn("d0", min("day").over(
        Window.partitionBy("user_id")))
      .select(col("user_id"),
        (col("day") - col("d0")).cast("decimal(19,0)").as("x"),
        col("y").cast("decimal(19,0)").as("y"))
    val n = count(lit(1)).cast("decimal(19,0)")
    val den = n * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))
    val num = n * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))
    perKey.groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(num.cast("double") / den.cast("double")).as("slope"),
        when(den === 0, lit(null).cast("double"))
          .otherwise((sum(col("y")) * sum(col("x") * col("x")) -
            sum(col("x")) * sum(col("x") * col("y"))).cast("double") /
            den.cast("double")).as("intercept"))
  }

  private val HourUs = 3600L * 1000000L

  /** #151 — cross-metric correlation search: Pearson between the hourly
    * count series of every event-type pair at lags 0 and 1 hour — the
    * "which metrics move together / lead each other" scan an observability
    * TSDB runs across its whole metric space. ONE corpus scan folds to
    * the per-(type, hour) count frame (map-side combinable); everything
    * after operates on the tiny aggregated series (types × hours rows):
    * the hour spine is generated from the aggregate's own min/max so
    * missing hours count as 0 for every type (a raw inner join would
    * silently misalign lagged series), the lag shift is an equi-join on
    * the shifted hour key, and the correlation is the ts_autocorr
    * closed form over exact integer (decimal) sums — bit-identical to
    * the oracle with no float accumulation anywhere. At 100 TB the only
    * corpus-sized stage is the first aggregate; the pair×lag work grows
    * with (n_types² × hours), not data volume. */
  def crossCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // localCheckpoint: spine bounds, the type list, and the completed
    // frame all derive from this tiny aggregate — materializing it once
    // keeps the corpus scan at exactly ONE (vs three lazy re-derivations)
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("HOUR", col("ts"))).as("hour_us"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val spine = hourly
      .agg(min("hour_us").as("lo"), max("hour_us").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(HourUs))).as("hour_us"))
    val types = hourly.select("event_type").distinct()
    val full = spine.crossJoin(broadcast(types))
      .join(hourly, Seq("event_type", "hour_us"), "left")
      .select(col("event_type"), col("hour_us"),
        coalesce(col("cnt"), lit(0L)).cast("decimal(19,0)").as("c"))
    val lags = Seq(0L, 1L).toDF("lag_h")
    val a = full.select(col("event_type").as("type_a"), col("hour_us"), col("c").as("x"))
      .crossJoin(broadcast(lags))
      .withColumn("jh", col("hour_us") - col("lag_h") * HourUs)
    val b = full.select(col("event_type").as("type_b"), col("hour_us").as("bh"), col("c").as("y"))
    val paired = a.join(b, col("bh") === col("jh"))
      .filter(col("type_a") < col("type_b"))
    val n = count(lit(1)).cast("decimal(19,0)")
    val vx = n * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))
    val vy = n * sum(col("y") * col("y")) - sum(col("y")) * sum(col("y"))
    paired.groupBy("type_a", "type_b", "lag_h")
      .agg(count(lit(1)).as("n_hours"),
        when(vx === 0 || vy === 0, lit(null).cast("double"))
          .otherwise((n * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y")))
            .cast("double") /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .as("xcorr"))
  }

  /** Per-(key, day) sample size for #213. */
  val ReservoirK = 3

  /** #213 — DETERMINISTIC per-key reservoir sample: keep the
    * [[ReservoirK]] events per (key, day) with the smallest content-
    * hash rank (md5 of event_id — the one hash both engines share;
    * event_id trails the order so ties are total). This is the
    * distributed, re-runnable form of reservoir sampling a TSDB uses
    * to keep exemplars per series per day: hash order is uniform,
    * stable under re-execution and partitioning, and the rank window's
    * partitions are scrape-bounded (key, day) groups — the
    * ts_downsample safety argument. Output is k rows per group at ANY
    * corpus size. */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day_us")
      .orderBy(col("hk"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("event_id"), col("value"))
      .withColumn("hk", md5(col("event_id").cast("string")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= ReservoirK)
      .select("user_id", "day_us", "rnk", "event_id", "value")
  }

  /** #241 — PromQL SUBQUERY: `max_over_time(rate(value[1h])[1d:1h])`.
    * The inner range vector is the per-(key, hour) per-second rate
    * (decimal sum / 3600 — ONE mirrored double division per bucket);
    * the outer aggregation takes each key's daily max of those hourly
    * points. BOTH grains are calendar-keyed combinable aggregates: the
    * corpus crosses ONE exchange at (key, day, hour); the day
    * regroup's second exchange moves only the hourly aggregate frame.
    * No window, no self-join: safe at any corpus size because
    * per-group state is one (max, count) pair. */
  def subqueryMaxRate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        unix_micros(date_trunc("HOUR", col("ts"))).as("hour_us"))
      .agg((sum(dec("value")).cast("double") / 3600.0d).as("hr_rate"))
      .groupBy("user_id", "day_us")
      .agg(max(col("hr_rate")).as("max_rate"),
        count(lit(1)).as("n_hours"))

  /** Staleness horizon of #242: series silent since this instant are
    * ABSENT (PromQL absent()/staleness marking). Fixed literal like
    * ts_scan_range's bounds — the corpus spans 2024-01-01..30, and a
    * one-day lookback marks a real slice absent at every SF (17 keys
    * at sf0.01, 156 at sf0.1). */
  val AbsentCutoff = "2024-01-30"
  /** The "now" the staleness age is measured against. */
  val AbsentNow = "2024-01-31"

  /** #242 — ABSENT/STALE series detection: keys that were alive before
    * [[AbsentCutoff]] but emitted NOTHING since — the alert PromQL's
    * absent() feeds and the first question an on-call asks of a TSDB
    * ("which hosts stopped reporting?"). ONE combinable per-key
    * aggregate (max ts + a conditional recent-count) on the key
    * shuffle; the age is an exact integer microsecond difference
    * floored to hours. Keys-bounded output at any corpus size; no
    * window, no join, no second scan. */
  def absentSeries(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_ts_us"),
        sum(when(col("ts") >= lit(AbsentCutoff).cast("timestamp"), 1L)
          .otherwise(0L)).as("recent_cnt"))
      .filter(col("recent_cnt") === 0L)
      // explicit floor: Spark truncates double→long casts while DuckDB
      // rounds them — floor() is the one form both engines agree on
      .select(col("user_id"), col("last_ts_us"),
        floor((unix_micros(lit(AbsentNow).cast("timestamp")) - col("last_ts_us"))
          / lit(3600000000.0d)).as("stale_hours"))

  /** #251 — COUNTER CORRECTION (PromQL's monotonize): rewrite each
    * key's series as the reset-corrected cumulative — every time the
    * raw value drops below its predecessor, the predecessor's value
    * joins a running offset, so the corrected series is the monotone
    * counter the raw samples would form had the process never
    * restarted. #82 counts the resets and #196 sums the positive
    * deltas; this emits the full corrected SERIES — what a recording
    * rule materializes before any rate/increase runs downstream. The
    * lag and the running offset sum share ONE (key) exchange with a
    * (ts, event_id) sort (the ts_delta_encode shape; partitions are
    * per-key series); all arithmetic is exact cents (longs), the one
    * emitted double is a single mirrored division. */
  def counterCorrect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), (dec("value") * 100).cast("long").as("cents"))
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .withColumn("comp",
        sum(when(col("prev") > col("cents"), col("prev")).otherwise(0L))
          .over(ws))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        (col("cents") + col("comp")).as("adj_cents"),
        ((col("cents") + col("comp")).cast("double") / 100.0d).as("adj"))
  }
}
