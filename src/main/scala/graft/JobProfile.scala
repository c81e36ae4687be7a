package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement aid for optimization rounds (guide §1): per query, after
  * the Bench warmup discipline, reports wall seconds alongside the job /
  * stage / task counts and the summed task metrics — the split that says
  * whether a slow query is scheduling-bound (many tiny tasks and stages)
  * or compute-bound (task time ~ wall x cores).
  * `runMain graft.JobProfile <sfDir> <q1,q2,...|topN> [runs]` */
object JobProfile {
  private class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val inputB = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(): Unit }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputB.addAndGet(m.inputMetrics.bytesRead)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 2) args(2).toInt else 2
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
        // profile the N slowest from the committed bench_full.json
        val n = args(1).stripPrefix("top").toInt
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get("bench_full.json"))
        val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
        import scala.jdk.CollectionConverters._
        m.get("queries").properties().asScala
          .map(e => e.getKey -> e.getValue.get("sec").asDouble())
          .toSeq.sortBy(-_._2).take(n).map(_._1)
      } else args(1).split(",").toSeq
    println(f"${"query"}%-30s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%7s ${"gc_s"}%5s ${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"in_MB"}%7s")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      try {
        fn(spark, dir).queryExecution.toRdd.count(): Unit // warmup + staging
        val samples = (1 to runs).map { _ =>
          spark.catalog.clearCache()
          val acc = new Acc
          spark.sparkContext.addSparkListener(acc)
          val t0 = System.nanoTime()
          fn(spark, dir).queryExecution.toRdd.count()
          val wall = (System.nanoTime() - t0) / 1e9
          // drain the listener bus before reading counters (a fixed
          // sleep undercounted task metrics on a loaded box — r20 advice)
          org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(
            spark.sparkContext, 10000)
          spark.sparkContext.removeSparkListener(acc)
          (wall, acc)
        }
        val (wall, a) = samples.minBy(_._1)
        println(f"$n%-30s $wall%7.2f ${a.jobs.get}%5d ${a.stages.get}%7d ${a.tasks.get}%6d ${a.taskTimeMs.get / 1e3}%7.2f ${a.gcMs.get / 1e3}%5.2f ${a.shufReadB.get / 1e6}%9.2f ${a.shufWriteB.get / 1e6}%9.2f ${a.inputB.get / 1e6}%7.2f")
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.toString.take(120)}")
      }
    }
    spark.stop()
  }
}
