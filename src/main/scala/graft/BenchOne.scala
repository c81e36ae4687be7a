package graft
import org.apache.spark.sql.SparkSession

/** Micro-bench for ITERATING on individual queries without paying the
  * full Bench suite: `runMain graft.BenchOne <sfDir> <q1,q2,...> [runs]`
  * times each named query (staging untimed, one warmup pass, then
  * best-of-N with a cold data cache per run — the Bench discipline). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // experiment hook: SPARK_GRAFT_CONF="k=v;k=v" overlays session confs
    // so config candidates can be A/B-timed without editing Bench
    // NOTE: ';' is the entry separator unconditionally — a conf VALUE
    // containing ';' (e.g. extraJavaOptions) cannot ride this overlay
    // (measurement hook only; use a code-level config for such keys)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, dir).queryExecution.toRdd.count(): Unit // warmup + staging
      val times = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $n%-30s best ${times.min}%.2f s  runs ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
