package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Co-located joins via bucketing: pre-bucketing both fact tables on
  * the join key eliminates the join shuffle entirely — the layout
  * strategy for repeated large-fact joins at 100 TB. */
class BucketedJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — the conf is static
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, Sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, Sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")

    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(plan) {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: ${shuffles.size}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
