package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-growth-point sweep (verdict r16 #7, coverage widened per
  * r17 #3): the ×10/×4 sweep cannot distinguish n·log n from n^1.3 —
  * one more point can. The pick set is the 25 most expensive queries
  * (by committed bench best times) UNION every query whose ×10/×4
  * sweep ratio in scale_sweep.json exceeds [[RatioPickBar]] — a cheap
  * query with a super-linear shape is exactly what cost-only picking
  * missed (q_decile_lift hid that way pre-r16). Each runs at the FIRST
  * grown copy (events ×10, docs/emb/facts ×4 — /tmp/scale, the Scale
  * layout) and at a SECOND (events ×30, docs/emb/facts ×8 —
  * /tmp/scale2), three passes each, min taken; the per-query two-point
  * exponent is ln(t2/t1) / ln(g2/g1) with (g1, g2) the growth pair of
  * the query's dominant table (events 10→30, everything else 4→8),
  * detected from the query's own plan (events.parquet scan or the
  * events-built helix store) rather than hand-classified. Exponent
  * ≤ ~1 = linear; > [[ExpGateBar]] FAILS the run unless the query
  * carries a named contract flag ([[SparkEntry.unboundedBaselineOf]] /
  * [[SparkEntry.linearInDocs]]). Results land in scale_sweep2.json. */
object Scale2 {

  /** Top-25 by bench_full.json best time at the r16 HEAD. */
  private val ExpensivePicks: Seq[String] = Seq(
    "dedup_ngram_jaccard_capped", "emb_kmeans_train", "dedup_lsh_recall",
    "dedup_ngram_jaccard", "dedup_containment_capped",
    "dedup_cluster_incremental", "ann_graph_recall", "q8_market_share",
    "text_bpe_train", "q_join_salted", "ann_graph_probe", "emb_dim_stats",
    "q_basket_rules", "mm_scene_cuts", "text_bpe_apply", "ts_above_p95",
    "dedup_containment", "text_ccnet_bucket", "q21_late_supplier",
    "q_market_basket", "dedup_cluster_survivor", "stream_cdc_incremental",
    "mm_cdc_incremental", "q_approx_distinct", "text_bpe_fertility")

  /** A ×10/×4 ratio above this adds the query to the exponent set. */
  val RatioPickBar = 1.5
  /** Two-point exponents above this fail the run unless flagged. */
  val ExpGateBar = 1.15

  /** ExpensivePicks ∪ {ratio > RatioPickBar in scale_sweep.json} —
    * derived from the artifact so the set can never silently shrink. */
  private def picksOf(): Seq[String] = {
    val p = java.nio.file.Paths.get("scale_sweep.json")
    val fromSweep: Seq[String] =
      if (!java.nio.file.Files.exists(p)) {
        System.err.println("[scale2] no scale_sweep.json — run graft.Scale first; " +
          "falling back to the expensive-25 set")
        Seq.empty
      } else {
        val txt = java.nio.file.Files.readString(p)
        // {"name":{"base":..,"scaled":..,"ratio":N.NN}, ...}
        val parsed =
          """"([A-Za-z0-9_]+)":\{"base":[0-9.]+,"scaled":[0-9.]+,"ratio":([0-9.]+)\}""".r
            .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toSeq
        // the file exists but the pattern matched NOTHING → the
        // serialization drifted; failing loudly beats silently
        // shrinking the exponent set back to the expensive-25
        require(parsed.nonEmpty,
          s"scale_sweep.json exists but no query entries matched the expected " +
            s"serialization — Scale's format drifted; update picksOf's pattern " +
            s"(first 200 chars: ${txt.take(200)})")
        parsed.collect { case (n, r) if r > RatioPickBar => n }
      }
    (ExpensivePicks ++ fromSweep).distinct.sorted
      .filter(SparkEntry.queries.contains)
  }

  /** Hand overrides for queries whose events provenance a plan scan
    * cannot see (the helix store stages rick/block dirs FROM events,
    * so its scans carry generation dir names, not events.parquet). */
  private val EventsDrivenOverride = Set(
    "helix_scan_range", "helix_get_point", "helix_multiget", "helix_latest",
    "helix_outdate_scan", "helix_stream_scan", "helix_scan_custom_order")

  /** Dominant growth pair from the query's own plan: any events.parquet
    * scan (or a helix-store override) rides the 10→30 pair, everything
    * else the 4→8 docs/emb/facts pair. */
  private def isEventsDriven(spark: SparkSession, name: String, dir: String): Boolean =
    EventsDrivenOverride.contains(name) || {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      // inspect the ANALYZED plan: cache substitution (a query that
      // .cache()s a fragment DURING construction — q_percentiles'
      // stats frame — swaps the events scan for an InMemoryRelation in
      // the optimized plan the moment it registers) happens in
      // withCachedData, which the analyzed plan precedes
      spark.catalog.clearCache()
      try {
        SparkEntry.queries(name)(spark, dir).queryExecution.analyzed.collect {
          case l: LogicalRelation => l.relation match {
            case h: HadoopFsRelation =>
              h.location.rootPaths.exists(_.toString.contains("events.parquet"))
            case _ => false
          }
        }.exists(identity)
      } catch { case _: Throwable => false }
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val s1 = "/tmp/scale"   // built by Scale (events ×10, rest ×4)
    val s2 = "/tmp/scale2"  // events ×30, rest ×8

    // ---- stage the second grown copy (same discipline as Scale) -------
    val readyMarker = java.nio.file.Paths.get(s2, "_GRAFT_READY")
    if (!java.nio.file.Files.exists(readyMarker)) {
      val ev = graft.core.Tables.events(spark, base)
      (0 until 30).map(i =>
          ev.withColumn("user_id", col("user_id") + lit(i * 10000L))
            .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
        .reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$s2/events.parquet")
      val docs = graft.core.Tables.documents(spark, base)
      (0 until 8).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 100000L)))
        .reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$s2/documents.parquet")
      val emb = graft.core.Tables.embeddings(spark, base)
      (0 until 8).map(i => emb
          .withColumn("vec_id", when(lit(i) === 0, col("vec_id"))
            .otherwise(col("vec_id") + lit(i * 100000L))))
        .reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$s2/embeddings.parquet")
      val li = graft.core.Tables.lineitem(spark, base)
      (0 until 8).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
        .reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$s2/lineitem.parquet")
      val ord = spark.read.parquet(s"$base/orders.parquet")
      (0 until 8).map(i =>
          ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
        .reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$s2/orders.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part"))
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$s2/$t.parquet")
      java.nio.file.Files.writeString(readyMarker, "ok"): Unit
    }

    // ---- pre-build staged artifacts untimed ----------------------------
    import graft.operators._
    for (dir <- Seq(s1, s2);
         build <- Seq[() => Any](
           () => DedupIndex.ensure(spark, dir),
           () => IvfIndex.ensure(spark, dir),
           () => PhashIndex.ensure(spark, dir),
           () => KnnIndex.ensure(spark, dir),
           () => KcSeedIndex.ensure(spark, dir),
           () => TextIndex.ensure(spark, dir),
           () => OldClusterIndex.ensure(spark, dir),
           () => CdcIndex.ensure(spark, dir),
           () => BasketIndex.ensure(spark, dir)))
      try build() catch { case e: Throwable =>
        System.err.println(s"[scale2] prebuild failed for $dir: ${e.toString.take(150)}")
      }

    val Picks = picksOf()
    println(s"[scale2] exponent set: ${Picks.size} queries " +
      s"(expensive-25 ∪ sweep ratio > $RatioPickBar)")

    // ---- three passes over both grown dirs, min per (query, dir) -------
    val times = scala.collection.mutable.Map[(String, String), Double]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    // min of 3 passes per dir: the box is co-tenant-contended and a
    // load spike spanning one grown-dir pass was measured inflating
    // two-point exponents past the gate (ts_heavy_hitters 0.69 → 1.84
    // min-of-2 under load); a third pass makes the min robust to a
    // single contended window
    for (pass <- 1 to 3; dir <- Seq(s1, s2)) {
      println(s"--- pass $pass $dir")
      for (name <- Picks if !failed.contains(name)) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          val k = (name, dir)
          times(k) = math.min(times.getOrElse(k, Double.MaxValue), sec)
          println(f"SCALE2 $name%-28s $sec%7.2f s  ($dir)")
        } catch { case e: Throwable =>
          failed(name) = e.toString.take(150)
          System.err.println(s"[scale2] $name FAILED on $dir: ${e.toString.take(200)}")
        }
      }
    }

    // ---- report + two-point exponents ----------------------------------
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // growth-pair classification is a pure plan property — compute once
    val gPair: Map[String, (Double, Double)] =
      Picks.filterNot(failed.contains).map(n =>
        n -> (if (isEventsDriven(spark, n, s1)) (10.0, 30.0) else (4.0, 8.0))).toMap
    def rowsOf(): Seq[(String, Double, Double, Double, Double, Double)] =
      Picks.filterNot(failed.contains).map { n =>
        val t1 = times.getOrElse((n, s1), 0.0)
        val t2 = times.getOrElse((n, s2), 0.0)
        val (g1, g2) = gPair(n)
        val expo = if (t1 > 0.005 && t2 > 0.0)
          math.log(t2 / t1) / math.log(g2 / g1) else 0.0
        (n, t1, t2, g1, g2, expo)
      }
    def violationsOf(rs: Seq[(String, Double, Double, Double, Double, Double)]) =
      rs.filter { case (n, t1, _, _, _, e) =>
        t1 >= 0.10 && e > ExpGateBar &&
          !SparkEntry.unboundedBaselineOf.contains(n) &&
          !SparkEntry.linearInDocs.contains(n)
      }
    // targeted re-adjudication (the Bench guard-retry discipline): a
    // gate offender gets extra timed passes for ITSELF alone — a
    // co-tenant load spike spanning one grown-dir pass was measured
    // inflating an exponent from 0.3 (quiet best-of) to 1.3; the min
    // over retries absorbs the spike without re-running the 88-query
    // sweep. A true super-linear shape survives every retry.
    var rows = rowsOf()
    var retries = 0
    while (violationsOf(rows).nonEmpty && retries < 2) {
      retries += 1
      for ((n, _, _, _, _, e) <- violationsOf(rows)) {
        println(f"[scale2] retry $retries for $n (exp=$e%.2f over gate)")
        for (dir <- Seq(s1, s2); _ <- 1 to 2) {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
            val sec = (System.nanoTime() - t0) / 1e9
            times((n, dir)) = math.min(times.getOrElse((n, dir), Double.MaxValue), sec)
            println(f"SCALE2-RETRY $n%-28s $sec%7.2f s  ($dir)")
          } catch { case e2: Throwable =>
            System.err.println(s"[scale2] retry $n FAILED on $dir: ${e2.toString.take(150)}")
          }
        }
      }
      rows = rowsOf()
    }
    println("==== SCALE2: two-point growth exponents (min of 3) ====")
    rows.sortBy(-_._6).foreach { case (n, t1, t2, g1, g2, e) =>
      println(f"$n%-28s t1=$t1%6.2f t2=$t2%6.2f g=$g1%.0f->$g2%.0f exp=$e%5.2f")
    }
    val json = rows.map { case (n, t1, t2, g1, g2, e) =>
      "\"" + n + "\":{\"t_g1\":" + f2(t1) + ",\"t_g2\":" + f2(t2) +
        ",\"g1\":" + f2(g1) + ",\"g2\":" + f2(g2) + ",\"exp\":" + f2(e) + "}"
    }.mkString(
      "{\"grown1\":\"events x10, docs/emb/facts x4\"," +
        "\"grown2\":\"events x30, docs/emb/facts x8\",\"queries\":{", ",", "}")
    // ---- the exponent GATE (r17 #3/#7): exponents above the bar fail
    // the run unless the query carries a named contract flag; t1 below
    // noise is exempt from the gate but still recorded.
    val violations = violationsOf(rows)
    val gateJson = violations.map { case (n, _, _, _, _, e) =>
      "\"" + n + "\":" + f2(e)
    }.mkString(",\"gate_violations\":{", ",", "}")
    val errs = failed.map { case (k, v) =>
      "\"" + k + "\":\"" + Bench.escJson(v) + "\""
    }.mkString(",\"failed\":{", ",", "}}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scale_sweep2.json"),
      json + gateJson + (if (failed.isEmpty) ",\"failed\":{}}" else errs))
    println(s"wrote scale_sweep2.json (${rows.size} queries, ${failed.size} failed)")
    violations.foreach { case (n, t1, t2, _, _, e) =>
      System.err.println(f"[scale2] GATE VIOLATION $n t1=$t1%.2f t2=$t2%.2f " +
        f"exp=$e%.2f — unflagged super-$ExpGateBar%.2f exponent")
    }
    spark.stop()
    if (violations.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
