package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the per-job / per-shuffle-stage fixed overhead of
  * this box's local-mode scheduler (guide §1: measure before tuning).
  * Times N repetitions of (a) a zero-shuffle job, (b) a one-shuffle
  * aggregate, (c) a two-shuffle agg+window — the deltas are the
  * marginal cost of one AQE-materialized stage. Overlay confs via
  * SPARK_GRAFT_CONF as in BenchOne. */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = if (args.nonEmpty) args(0).toInt else 40
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // NOTE: ';' is the entry separator unconditionally — a conf VALUE
    // containing ';' (e.g. extraJavaOptions) cannot ride this overlay
    // (measurement hook only; use a code-level config for such keys)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.range(200000).select(col("id").as("x"))
    def time(label: String)(f: () => Unit): Unit = {
      f() // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f(); i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[probe] $label%-28s ${ms}%8.1f ms/run")
    }
    time("0-shuffle map+count") { () =>
      base.select((col("x") * 2).as("y")).queryExecution.toRdd.count(): Unit
    }
    time("1-shuffle groupBy") { () =>
      base.groupBy(col("x") % 97).agg(sum("x")).queryExecution.toRdd.count(): Unit
    }
    time("2-shuffle agg+window") { () =>
      import org.apache.spark.sql.expressions.Window
      base.groupBy((col("x") % 97).as("g")).agg(sum("x").as("s"))
        .withColumn("r", row_number().over(Window.partitionBy(col("g") % 7).orderBy("s")))
        .queryExecution.toRdd.count(): Unit
    }
    time("3-shuffle") { () =>
      import org.apache.spark.sql.expressions.Window
      base.groupBy((col("x") % 97).as("g")).agg(sum("x").as("s"))
        .withColumn("r", row_number().over(Window.partitionBy(col("g") % 7).orderBy("s")))
        .groupBy(col("r")).agg(count(lit(1)))
        .queryExecution.toRdd.count(): Unit
    }
    // --- decomposition probes ---
    val tinyRdd = spark.sparkContext.parallelize(1 to 32, 32).cache()
    tinyRdd.count()
    time("raw job: cached 32-task RDD") { () => tinyRdd.count(): Unit }
    val tiny1 = spark.sparkContext.parallelize(1 to 4, 1).cache()
    tiny1.count()
    time("raw job: cached 1-task RDD") { () => tiny1.count(): Unit }
    val prebuilt = base.select((col("x") * 2).as("y"))
    val preRdd = prebuilt.queryExecution.toRdd
    time("prebuilt RDD re-count (no plan)") { () => preRdd.count(): Unit }
    time("plan only: toRdd, no action") { () =>
      base.select((col("x") * 2).as("y")).queryExecution.toRdd: Unit
    }
    val df32 = spark.range(0, 32, 1, 2).toDF("x")
    time("tiny localCheckpoint") { () =>
      df32.localCheckpoint(): Unit
    }
    time("tiny DF isEmpty") { () =>
      df32.filter(col("x") < 0).isEmpty: Unit
    }
    spark.stop()
  }
}
