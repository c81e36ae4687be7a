package graft

import org.apache.spark.sql.execution.FormattedMode

/** Regression net for the plan properties the engine depends on at
  * scale — if one of these degrades, a future change broke pushdown,
  * broadcasting, or partial aggregation. */
class PlanSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, Sf).queryExecution.explainString(FormattedMode)

  test("ts_scan_range pushes the time range to the parquet scan as raw int64") {
    val p = plan("ts_scan_range")
    assert(p.contains("GreaterThanOrEqual(ts,"), "time lower bound must be pushed")
    assert(p.contains("LessThan(ts,"), "time upper bound must be pushed")
    assert(p.contains("GreaterThanOrEqual(user_id,10)"), "key bound must be pushed")
  }

  test("q1_pricing aggregates map-side before its single exchange") {
    val p = plan("q1_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final HashAggregate")
    assert("Exchange".r.findAllIn(plan("q1_pricing")).size <= 2, "one shuffle (+AQE read)")
  }

  test("q3_topk_revenue broadcasts dims and avoids a global sort for top-k") {
    val p = plan("q3_topk_revenue")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not globally sort")
  }

  test("q1 scan reads only the referenced columns") {
    val p = plan("q1_pricing")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_orderkey") && !read.contains("l_tax"),
      s"column pruning failed: $read")
  }

  test("dedup_embedding pairs join carries precomputed norms, not recomputed dots") {
    val p = plan("dedup_embedding")
    // 1 pair dot + 2 per-row norm dots = 3; the unfactored form had 3 per pair
    assert(p.contains("graft_dot"), "native dot product must be in the plan")
  }

  test("dedup_embedding generates candidates from LSH bands, not all pairs") {
    val p = plan("dedup_embedding")
    assert(p.contains("graft_band_codes"), "native band-code signature must be in the plan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must never be an all-pairs product")
  }

  test("ann_ivf_topk probes a stored index with partition pruning, no query-time build") {
    val p = plan("ann_ivf_topk")
    assert(p.contains("graft-stage"), "must read the staged IVF index, not rebuild it")
    assert(p.contains("dynamicpruningexpression"),
      "probe must partition-prune the assignment scan to the probed cells")
    assert(!p.contains("windowspecdefinition"),
      "no per-vector argmax window may survive in the probe path")
    assert(!p.contains("HashAggregate"),
      "the centroid aggregation must not run at query time — probe only")
  }

  test("knn_label_centroid assigns by broadcast fold, not a per-vector window") {
    val p = plan("knn_label_centroid")
    assert(!p.contains("windowspecdefinition"),
      "argmax must be a map-side fold over the broadcast centroid array")
  }

  test("ts_ema folds per (key, day) bucket first, never a key's whole history") {
    val p = plan("ts_ema")
    assert("Keys \\[2\\]: \\[user_id#\\d+L?, day#".r.findFirstIn(p).isDefined,
      s"first aggregate must group on (user_id, day) so no row holds a full key history")
  }

  test("q_percentiles windows only within histogram buckets, never a whole group") {
    val p = plan("q_percentiles")
    val windowSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.nonEmpty, "expected the prefix-sum and in-bucket rank windows")
    assert(windowSpecs.forall(_.contains("bucket")),
      s"every window must be keyed by bucket, got: ${windowSpecs.mkString("\n")}")
  }
}
