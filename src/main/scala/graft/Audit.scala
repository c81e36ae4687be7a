package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape audit across the whole query inventory: prints exchange /
  * window / nested-loop counts per query so a shuffle regression or an
  * accidental all-pairs join stands out immediately. (A
  * BroadcastNestedLoopJoin with a 1-row or dim-size build side — query
  * vectors, centroid tables — is the intended broadcast pattern, not a
  * scale bug; the flag is a prompt to check the build side.) */
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).size
        val ex = c("Exchange hashpartitioning") + c("Exchange rangepartitioning") + c("Exchange SinglePartition")
        val warn = if (c("CartesianProduct") > 0 || c("BroadcastNestedLoopJoin") > 1) " !!NESTED-LOOP" else ""
        println(f"[audit] $name%-22s exch=$ex%2d win=${c("Window ")}%2d bnlj=${c("BroadcastNestedLoopJoin")}%d$warn")
      } catch { case e: Throwable => println(s"[audit] $name ERROR $e") }
    }
    spark.stop()
  }
}
