package graft
import org.apache.spark.sql.SparkSession

/** Measures DRIVER-SIDE plan cost per query: time to build the DataFrame
  * (ensure + analysis) and to produce the executed plan (optimize +
  * physical planning), without running it. Identifies queries whose wall
  * time is planning-bound (wide expression trees).
  * `runMain graft.PlanTime <sfDir> <q1,...|topN> [reps]` */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names: Seq[String] =
      if (args(1).startsWith("top")) {
        val n = args(1).stripPrefix("top").toInt
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get("bench_full.json"))
        val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
        import scala.jdk.CollectionConverters._
        m.get("queries").properties().asScala
          .map(e => e.getKey -> e.getValue.get("sec").asDouble())
          .toSeq.sortBy(-_._2).take(n).map(_._1)
      } else args(1).split(",").toSeq
    println(f"${"query"}%-30s ${"build_ms"}%9s ${"plan_ms"}%9s")
    for (n <- names) {
      try {
        val fn = SparkEntry.queries(n)
        fn(spark, dir).queryExecution.executedPlan // warm staging + codegen caches
        val samples = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
        }
        val best = samples.minBy(s => s._1 + s._2)
        println(f"$n%-30s ${best._1}%9.1f ${best._2}%9.1f")
      } catch { case e: Throwable => println(s"$n FAILED ${e.toString.take(100)}") }
    }
    spark.stop()
  }
}
