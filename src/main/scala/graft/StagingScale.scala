package graft

import org.apache.spark.sql.SparkSession

/** Staging-BUILD scale gate (verdict r18 #2): Bench reports staging
  * once, untimed per query, and the Scale/Scale2 sweeps inherit
  * pre-staged indexes — so a super-linear index BUILD (a shingle
  * explode that quadruples with planted-dup density, a graph
  * construction with a hidden all-pairs leg) is invisible to every
  * query-side gate. This main COLD-builds every staged artifact at the
  * two grown copies (/tmp/scale: events ×10 docs/emb/facts ×4;
  * /tmp/scale2: events ×30 docs/emb/facts ×8 — the Scale2 layout) into
  * a THROWAWAY stage root, takes the per-artifact two-point exponent
  * ln(t2/t1)/ln(g2/g1) with the growth pair of the artifact's source
  * table, and FAILS on any exponent > [[Scale2.ExpGateBar]] unless the
  * artifact carries a named contract in [[Contracts]]. Results land in
  * staging_scale.json. Build order respects artifact dependencies
  * (SetGroupIndex ensures DedupIndex first, the IVF generations ensure
  * the sliced index), so each timed ensure measures its own increment.
  *
  * Offender re-adjudication follows Scale2's discipline: a gate
  * offender's two grown-copy builds are wiped and re-timed (min of
  * passes) before the verdict — a co-tenant load spike across one
  * 10-minute build otherwise fakes a super-linear shape. */
object StagingScale {

  /** (artifact name, dominant source table, builder). Order = the
    * dependency order; every builder is a [[graft.operators.Staging]]
    * ensure, cold under the throwaway root. */
  private def builders(spark: SparkSession, dir: String): Seq[(String, String, () => Any)] = {
    import graft.operators._
    Seq(
      ("DedupIndex", "documents", () => DedupIndex.ensure(spark, dir)),
      ("SetGroupIndex", "documents", () => SetGroupIndex.ensure(spark, dir)),
      ("OldClusterIndex", "documents", () => OldClusterIndex.ensure(spark, dir)),
      ("BloomIndex", "documents", () => BloomIndex.ensure(spark, dir)),
      ("DedupGen", "documents", () => DedupGen.ensureCommitted(spark, dir)),
      ("TextIndex", "documents", () => TextIndex.ensure(spark, dir)),
      ("PhashIndex", "documents", () => PhashIndex.ensure(spark, dir)),
      ("CdcIndex", "documents", () => CdcIndex.ensure(spark, dir)),
      ("IvfIndex", "embeddings", () => IvfIndex.ensure(spark, dir)),
      ("IvfIndex.indexed", "embeddings", () => IvfIndex.ensureIndexed(spark, dir)),
      ("IvfGen", "embeddings", () => IvfGen.ensureCommitted(spark, dir)),
      ("IvfGen.deleted", "embeddings", () => IvfGen.ensureCommittedDeleted(spark, dir)),
      ("PqIndex", "embeddings", () => PqIndex.ensure(spark, dir)),
      ("IvfPqIndex", "embeddings", () => IvfPqIndex.ensure(spark, dir)),
      ("KnnIndex", "embeddings", () => KnnIndex.ensure(spark, dir)),
      ("KcSeedIndex", "embeddings", () => KcSeedIndex.ensure(spark, dir)),
      ("BqIndex", "embeddings", () => BqIndex.ensure(spark, dir)),
      ("VecGroupIndex", "embeddings", () => VecGroupIndex.ensure(spark, dir)),
      ("BasketIndex", "lineitem", () => BasketIndex.ensure(spark, dir)),
      ("HelixScan.scan", "events", () => HelixScan.ensure(spark, dir)),
      ("HelixScan.point", "events", () => HelixScan.ensurePoint(spark, dir)),
      ("HelixScan.latest", "events", () => HelixScan.ensureLatest(spark, dir)),
      ("HelixScan.outdated", "events", () => HelixScan.ensureOutdated(spark, dir)),
      ("HelixScan.stream", "events", () => HelixScan.ensureStream(spark, dir)))
  }

  /** Named super-linear contracts: an artifact listed here may exceed
    * the gate, with the reason recorded in the artifact (mirrors
    * SparkEntry.unboundedBaselineOf / linearInDocs). Empty today —
    * every staged build is expected ~linear in its source. */
  val Contracts: Map[String, String] = Map.empty

  private def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    // the throwaway stage root MUST be installed before the Staging
    // object loads (its root is read once at class init)
    val tmpRoot = s"/tmp/graft-stage-scale-${ProcessHandle.current().pid()}"
    sys.props("graft.stage.dir") = tmpRoot

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/root/testdata/sf0.1"
    val s1 = "/tmp/scale"
    val s2 = "/tmp/scale2"
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(s1, "_GRAFT_READY"))
      && java.nio.file.Files.exists(java.nio.file.Paths.get(s2, "_GRAFT_READY")),
      "grown copies missing — run graft.Scale then graft.Scale2 first")

    val times = scala.collection.mutable.Map[(String, String), Double]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()

    def timePass(dirs: Seq[String], only: Option[Set[String]]): Unit =
      for (dir <- dirs; (name, _, build) <- builders(spark, dir)
           if only.forall(_.contains(name)) && !failed.contains(name)) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          build()
          val sec = (System.nanoTime() - t0) / 1e9
          val k = (name, dir)
          times(k) = math.min(times.getOrElse(k, Double.MaxValue), sec)
          println(f"STAGE $name%-20s $sec%8.2f s  ($dir)")
        } catch { case e: Throwable =>
          failed(name) = e.toString.take(150)
          System.err.println(s"[staging-scale] $name FAILED on $dir: ${e.toString.take(200)}")
        }
      }

    timePass(Seq(base, s1, s2), None)

    def rowsOf(): Seq[(String, String, Double, Double, Double, Double)] =
      builders(spark, base).collect { case (n, tbl, _) if !failed.contains(n) =>
        val t1 = times.getOrElse((n, s1), 0.0)
        val t2 = times.getOrElse((n, s2), 0.0)
        val (g1, g2) = if (tbl == "events") (10.0, 30.0) else (4.0, 8.0)
        val expo = if (t1 > 0.005 && t2 > 0.0)
          math.log(t2 / t1) / math.log(g2 / g1) else 0.0
        (n, tbl, t1, t2, times.getOrElse((n, base), 0.0), expo)
      }
    def violationsOf(rs: Seq[(String, String, Double, Double, Double, Double)]) =
      rs.filter { case (n, _, t1, _, _, e) =>
        t1 >= 0.10 && e > Scale2.ExpGateBar && !Contracts.contains(n) }

    // offender re-adjudication: wipe the offender's grown-copy
    // artifacts (whole stage root — dependencies rebuild in order) and
    // re-time only the offender chain, min over passes
    var rows = rowsOf()
    var retries = 0
    while (violationsOf(rows).nonEmpty && retries < 2) {
      retries += 1
      val offs = violationsOf(rows).map(_._1).toSet
      println(s"[staging-scale] retry $retries for ${offs.mkString(", ")}")
      graft.operators.Staging.clear()
      // dependencies of an offender must rebuild (untimed accuracy is
      // preserved because each ensure is timed for ITSELF; wiping all
      // and re-timing the full chain keeps increments honest)
      timePass(Seq(s1, s2), None)
      rows = rowsOf()
    }

    println("==== STAGING-SCALE: cold-build two-point exponents ====")
    rows.sortBy(-_._6).foreach { case (n, tbl, t1, t2, tb, e) =>
      println(f"$n%-20s base=$tb%7.2f t1=$t1%7.2f t2=$t2%7.2f ($tbl) exp=$e%5.2f")
    }
    val json = rows.map { case (n, tbl, t1, t2, tb, e) =>
      "\"" + n + "\":{\"table\":\"" + tbl + "\",\"t_base\":" + f2(tb) +
        ",\"t_g1\":" + f2(t1) + ",\"t_g2\":" + f2(t2) + ",\"exp\":" + f2(e) + "}"
    }.mkString(
      "{\"grown1\":\"events x10, docs/emb/facts x4\"," +
        "\"grown2\":\"events x30, docs/emb/facts x8\"," +
        "\"gate\":" + f2(Scale2.ExpGateBar) + ",\"builds\":{", ",", "}")
    val violations = violationsOf(rows)
    val gateJson = violations.map { case (n, _, _, _, _, e) =>
      "\"" + n + "\":" + f2(e) }.mkString(",\"gate_violations\":{", ",", "}")
    val errs = failed.map { case (k, v) =>
      "\"" + k + "\":\"" + Bench.escJson(v) + "\"" }
      .mkString(",\"failed\":{", ",", "}}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("staging_scale.json"),
      json + gateJson + (if (failed.isEmpty) ",\"failed\":{}}" else errs))
    println(s"wrote staging_scale.json (${rows.size} builds, ${failed.size} failed)")
    violations.foreach { case (n, _, t1, t2, _, e) =>
      System.err.println(f"[staging-scale] GATE VIOLATION $n t1=$t1%.2f " +
        f"t2=$t2%.2f exp=$e%.2f — unflagged super-${Scale2.ExpGateBar}%.2f build")
    }
    // drop the throwaway stage root — the real target/graft-stage was
    // never touched
    graft.operators.Staging.clear()
    spark.stop()
    if (violations.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
