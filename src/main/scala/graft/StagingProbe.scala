package graft

import org.apache.spark.sql.SparkSession

/** Measurement main (guide §1): cold-rebuild named staged artifacts in
  * the REAL stage root and print per-artifact wall seconds, so staging
  * optimizations are measured against the same records Bench sums into
  * its `staging_cold` phase. Usage:
  *
  *   runMain graft.StagingProbe <sfDir> <prefix> [<prefix> ...]
  *
  * Each <prefix> names a staged-dir prefix (e.g. `dedup`, `helixq2`);
  * its staged dirs keyed on the sf dir's fingerprints are deleted and
  * the owning ensure() re-runs. Prefixes not listed stay warm. Run in
  * a quiet window (load < 0.5) — the recorded `_GRAFT_BUILD_SECS` is
  * what Bench reports. */
object StagingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.tuned(SparkSession.builder()
        .appName("graft-staging-probe").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._
    // builder registry: prefix -> ensure() that stages it
    val builders: Seq[(String, () => Any)] = Seq(
      "dedup" -> (() => DedupIndex.ensure(spark, sfDir)),
      "gset" -> (() => SetGroupIndex.ensure(spark, sfDir)),
      "vgrp" -> (() => VecGroupIndex.ensure(spark, sfDir)),
      "clusold" -> (() => OldClusterIndex.ensure(spark, sfDir)),
      "bloom" -> (() => BloomIndex.ensure(spark, sfDir)),
      "dedupgen" -> (() => DedupGen.ensureCommitted(spark, sfDir)),
      "textidx" -> (() => TextIndex.ensure(spark, sfDir)),
      "phash" -> (() => PhashIndex.ensure(spark, sfDir)),
      "cdc" -> (() => CdcIndex.ensure(spark, sfDir)),
      "helixq2" -> (() => HelixScan.ensure(spark, sfDir)),
      "helixg2" -> (() => HelixScan.ensurePoint(spark, sfDir)),
      "helixl2" -> (() => HelixScan.ensureLatest(spark, sfDir)),
      "helixo2" -> (() => HelixScan.ensureOutdated(spark, sfDir)),
      "helixst2" -> (() => HelixScan.ensureStream(spark, sfDir)))
    val stageRoot = java.nio.file.Paths.get(
      sys.props("user.dir"), "target", "graft-stage")
    for ((prefix, build) <- builders if prefixes.isEmpty || prefixes(prefix)) {
      // drop this prefix's staged dirs for THIS sf dir only (every
      // fingerprint key of the sf's source tables begins differently;
      // deleting by prefix alone would nuke other SFs' records, so
      // match the dirs the ensure would touch by rebuilding after a
      // targeted delete of all `<prefix>-*` dirs whose key re-resolves)
      HelixScan.closeStores() // live handles would dangle across the delete
      val s = java.nio.file.Files.list(stageRoot)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(s"$prefix-"))
          .toSeq.foreach { p =>
            // rebuild cost is per-sf; only drop dirs this run would
            // re-ensure — probe the key by running ensure afterwards,
            // so conservatively delete all and let other SFs rebuild
            // on their next touch (records refresh, never go stale)
            Staging.deleteRecursively(p)
          }
      } finally s.close()
      val t0 = System.nanoTime()
      build()
      println(f"[staging-probe] $prefix ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
