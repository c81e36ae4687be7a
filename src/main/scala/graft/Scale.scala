package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-suite scale sweep: EVERY registered query timed at sf0.1 and at
  * a grown copy (events ×10, documents/embeddings/lineitem/orders ×4,
  * dims copied) — the measured evidence behind the 100× design claims.
  * Iterates `SparkEntry.queries` directly so the sweep can never fall
  * out of lockstep with the registry. Two passes per dir, min taken
  * (same discipline as Bench); per-query growth ratios land in
  * scale_sweep.json for SURVEY §6. */
object Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val scaled = "/tmp/scale"

    // ---- stage the grown copy -----------------------------------------
    // Built AT MOST ONCE (the _GRAFT_READY marker): the data is
    // deterministic, and a rewrite per run would change file mtimes,
    // re-key every staged artifact fingerprint, and grow
    // target/graft-stage without bound (three full store copies of the
    // 10x corpus per sweep). Delete /tmp/scale to force a rebuild.
    val readyMarker = java.nio.file.Paths.get(scaled, "_GRAFT_READY")
    if (!java.nio.file.Files.exists(readyMarker)) {
    // events x10 with disjoint user ids (uid range is 0..1499 → offset 10000)
    val ev = graft.core.Tables.events(spark, base)
    (0 until 10).map(i =>
        ev.withColumn("user_id", col("user_id") + lit(i * 10000L))
          .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
      .reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$scaled/events.parquet")
    // documents x4 (disjoint doc ids)
    val docs = graft.core.Tables.documents(spark, base)
    (0 until 4).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 100000L)))
      .reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$scaled/documents.parquet")
    // embeddings x4 — vec_id 0 stays unique so the ANN query set is
    // unchanged while the corpus quadruples
    val emb = graft.core.Tables.embeddings(spark, base)
    (0 until 4).map(i => emb
        .withColumn("vec_id", when(lit(i) === 0, col("vec_id"))
          .otherwise(col("vec_id") + lit(i * 100000L))))
      .reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
    // lineitem + orders x4 with the SAME disjoint order-key offsets so
    // fact/fact joins stay consistent; part/supp keys unchanged (same
    // catalogue, 4× the order volume — the realistic growth shape)
    val li = graft.core.Tables.lineitem(spark, base)
    (0 until 4).map(i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$scaled/lineitem.parquet")
    val ord = spark.read.parquet(s"$base/orders.parquet")
    (0 until 4).map(i =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
      .reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$scaled/orders.parquet")
    // dimensions copied verbatim
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$scaled/$t.parquet")
    java.nio.file.Files.writeString(readyMarker, "ok"): Unit
    }

    // ---- pre-build staged artifacts untimed (the Bench discipline) ----
    import graft.operators._
    for (dir <- Seq(base, scaled);
         build <- Seq[() => Any](
           () => DedupIndex.ensure(spark, dir),
           () => IvfIndex.ensure(spark, dir),
           () => PqIndex.ensure(spark, dir),
           () => IvfPqIndex.ensure(spark, dir),
           () => PhashIndex.ensure(spark, dir),
           () => KnnIndex.ensure(spark, dir),
           () => KcSeedIndex.ensure(spark, dir),
           () => HelixScan.ensure(spark, dir),
           () => HelixScan.ensurePoint(spark, dir),
           () => HelixScan.ensureLatest(spark, dir),
           () => HelixScan.ensureOutdated(spark, dir),
           () => HelixScan.ensureStream(spark, dir),
           () => TextIndex.ensure(spark, dir),
           () => BasketIndex.ensure(spark, dir)))
      try build() catch { case e: Throwable =>
        System.err.println(s"[scale] prebuild failed for $dir: ${e.toString.take(150)}")
      }

    // ---- sweep every registered query ---------------------------------
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[(String, String), Double]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    for (pass <- 1 to 2; dir <- Seq(base, scaled)) {
      println(s"--- pass $pass $dir")
      for (name <- names if !failed.contains(name)) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          val k = (name, dir)
          times(k) = math.min(times.getOrElse(k, Double.MaxValue), sec)
          println(f"SCALE $name%-26s $sec%7.2f s  ($dir)")
        } catch { case e: Throwable =>
          failed(name) = e.toString.take(150)
          System.err.println(s"[scale] $name FAILED on $dir: ${e.toString.take(200)}")
        }
      }
    }

    // ---- report ---------------------------------------------------------
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val rows = names.filterNot(failed.contains).map { n =>
      val b = times.getOrElse((n, base), 0.0)
      val s = times.getOrElse((n, scaled), 0.0)
      val r = if (b > 0.005) s / b else 0.0
      (n, b, s, r)
    }
    println("==== SCALE SWEEP (min of 2) ====")
    rows.sortBy(-_._4).foreach { case (n, b, s, r) =>
      println(f"$n%-26s base=$b%6.2f scaled=$s%6.2f ratio=$r%5.2f")
    }
    val json = rows.map { case (n, b, s, r) =>
      "\"" + n + "\":{\"base\":" + f2(b) + ",\"scaled\":" + f2(s) +
        ",\"ratio\":" + f2(r) + "}"
    }.mkString("{\"grown\":\"events x10, docs/emb/lineitem/orders x4\",\"queries\":{", ",", "}")
    // Bench.escJson maps ALL control chars (Spark exception messages
    // routinely contain newlines, which would invalidate the JSON)
    val errs = failed.map { case (k, v) =>
      "\"" + k + "\":\"" + Bench.escJson(v) + "\""
    }.mkString(",\"failed\":{", ",", "}}")
    // ---- the sweep GATE (verdict r17 #7): a >3x growth ratio is
    // allowed ONLY for the registry-flagged unbounded baselines and
    // the linear-in-docs codec set (docs grow DocGrowth x, so their
    // contract ceiling is DocGrowth x a noise margin); sub-second
    // bases are noise-exempt. Everything else crossing 3x FAILS the
    // sweep here, machine-checked, instead of hiding in prose.
    val DocGrowth = 4.0
    val violations = rows.filter { case (n, b, _, r) =>
      b >= 0.10 && r > 3.0 &&
        !SparkEntry.unboundedBaselineOf.contains(n) &&
        !(SparkEntry.linearInDocs(n) && r <= DocGrowth * 1.5)
    }
    val gateJson = violations.map { case (n, _, _, r) =>
      "\"" + n + "\":" + f2(r)
    }.mkString(",\"gate_violations\":{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scale_sweep.json"),
      json + gateJson + (if (failed.isEmpty) ",\"failed\":{}}" else errs))
    println(s"wrote scale_sweep.json (${rows.size} queries, ${failed.size} failed)")
    violations.foreach { case (n, b, s, r) =>
      System.err.println(f"[scale] GATE VIOLATION $n base=$b%.2f scaled=$s%.2f " +
        f"ratio=$r%.2f — unflagged super-3x growth")
    }
    spark.stop()
    if (violations.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
