package graft

/** Partitioning-invariance of every registered result (verdict r18
  * #3): the classic 100×-scale failure is a result that silently
  * depends on partition count, merge order, or an AQE re-plan —
  * exactly what changes between local[32]/sf0.01 and a 1000-executor
  * cluster at 100 TB. Every query runs at sf0.01 under the shared
  * local[4] context in three SQL regimes — (baseline)
  * shuffle.partitions=4 + AQE on, (a) shuffle.partitions=7 + AQE on,
  * (b) shuffle.partitions=7 + AQE OFF + 2 MB scan splits (the read
  * side: more input partitions changes map-side combine grouping and
  * scan task count) — and the canonical result hash must be identical
  * in all three. Any divergence is a latent scale
  * bug: an aggregation whose double combine order leaks into the
  * output, a window whose tie order depends on partitioning, a limit
  * without a pinned order.
  *
  * (The baseline regime itself is pinned to the DuckDB oracle by the
  * driver's correctness gate at this very SF, so hash equality across
  * regimes extends the oracle match to every tested parallelism.) */
class PerturbationSpec extends SparkTestBase {

  private val Sf01 = "/root/testdata/sf0.01"

  private def canonHash(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    val rows = df.selectExpr(cols.map(c => s"`$c`"): _*)
      .collect().map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    s"${rows.length}:${md.digest().map("%02x".format(_)).mkString}"
  }

  test("every registered query's result hash is invariant under shuffle-partition and AQE perturbation") {
    // three sessions over the SAME local[4] context, differing only in
    // the partitioning-relevant SQL confs
    val base = spark.newSession()
    base.conf.set("spark.sql.shuffle.partitions", "4")
    base.conf.set("spark.sql.adaptive.enabled", "true")
    val shuf7 = spark.newSession()
    shuf7.conf.set("spark.sql.shuffle.partitions", "7")
    shuf7.conf.set("spark.sql.adaptive.enabled", "true")
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.shuffle.partitions", "7")
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    // also shrink the scan splits in this regime: more input partitions
    // changes map-side combine grouping and scan task count — the READ
    // side of the same invariance claim
    noAqe.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val fn = SparkEntry.queries(name)
        spark.catalog.clearCache()
        val h0 = canonHash(fn(base, Sf01))
        spark.catalog.clearCache()
        val h1 = canonHash(fn(shuf7, Sf01))
        spark.catalog.clearCache()
        val h2 = canonHash(fn(noAqe, Sf01))
        if (h1 != h0) offenders += s"$name: shuffle=7 hash $h1 != baseline $h0"
        if (h2 != h0) offenders += s"$name: AQE-off hash $h2 != baseline $h0"
      } catch { case e: Throwable =>
        errors += s"$name: ${e.toString.take(160)}"
      }
    }
    assert(errors.isEmpty,
      s"queries failed under perturbation:\n${errors.mkString("\n")}")
    assert(offenders.isEmpty,
      "results depend on partition count or AQE re-planning — a latent " +
        s"100×-scale bug:\n${offenders.mkString("\n")}")
  }
}
