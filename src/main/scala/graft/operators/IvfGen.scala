package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/**
 * Committed GENERATIONS of the IVF index — the swap that makes the
 * `ann_ivf_rebalance` report actionable. The rebalance query computes
 * the drift set and the re-homed assignment; THIS class commits that
 * exact post-state as a new index generation through the same
 * pointer-file protocol the row store uses (write new files → write
 * pointer tmp → atomic rename → bury superseded dirs → deferred
 * vacuum), so a reader always resolves ONE complete generation.
 *
 * Reference contract: level.rs:356 — compaction does not just plan the
 * rick → level move, it commits it atomically, and readers opened
 * before the swap keep a consistent view (db.rs:67 scan stability).
 * Here the analogue is the inverted-list generation: the committed
 * pointer names (centroids, base lists, dropped cells, delta lists)
 * and a probe reads base-minus-dropped ∪ delta.
 *
 * Scale shape: a commit writes (a) the K-row refreshed centroid table
 * and (b) delta lists sized by drifted-cell mass + the arrival slice —
 * the non-drifted base partitions are REFERENCED, never rewritten, so
 * commit I/O is ∝ drift, not corpus (at 100 TB the base lists are the
 * corpus; rewriting them per rebalance would be a full compaction).
 * Crash recovery (open-time orphan rollback) and deferred deletion
 * (graveyard + vacuum) follow [[graft.core.HelixStore]]'s crash-tested
 * discipline; IvfGenSpec injects a crash at every named step.
 *
 * Single-writer: commits run under [[Staging.ensure]]'s build lock (or
 * a test's single thread); readers on other JVMs only ever read the
 * committed pointer.
 */
final class IvfGen(rootDir: String) {
  import IvfGen._

  private val root = Paths.get(rootDir)
  private val pointerFile = root.resolve("_current")
  private val graveyardFile = root.resolve("_graveyard")

  /** Test hook: called between commit-protocol steps with the step
    * name; a throwing hook simulates a crash there (IvfGenSpec). */
  private[graft] var crashHook: String => Unit = _ => ()

  // ---- pointer ---------------------------------------------------------

  /** Resolve a pointer path: absolute = an external staged artifact,
    * relative = a dir this root owns. */
  private[graft] def resolve(p: String): String =
    if (p.startsWith("/")) p else root.resolve(p).toString

  /** Top-level `g-N` dir names a pointer's root-relative paths live in. */
  private def ownedDirs(p: Pointer): Set[String] =
    (Seq(p.centroids) ++ p.delta.toSeq)
      .filterNot(_.startsWith("/"))
      .map(_.split("/", 2).head).toSet

  private def readPointer(): Pointer = {
    val kv = new String(Files.readAllBytes(pointerFile)).split('\n')
      .map(_.trim).filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    Pointer(kv("gen").toLong, kv("centroids"), kv("base"),
      kv.get("dropped").filter(_.nonEmpty)
        .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq.empty),
      kv.get("delta").filter(_.nonEmpty))
  }

  /** Atomic commit: temp file, then rename over `_current`. */
  private def writePointer(p: Pointer): Unit = {
    val body = (Seq(s"gen=${p.gen}", s"centroids=${p.centroids}",
      s"base=${p.base}") ++
      (if (p.dropped.nonEmpty) Seq(s"dropped=${p.dropped.mkString(",")}") else Nil) ++
      p.delta.map(d => s"delta=$d"))
      .mkString("", "\n", "\n")
    val tmp = root.resolve("_current.tmp")
    Files.write(tmp, body.getBytes)
    crashHook("pointer:tmp-written")
    Files.move(tmp, pointerFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Current committed pointer (test/report visibility). */
  private[graft] def pointer(): Pointer = readPointer()

  // ---- graveyard + vacuum (deferred deletion, HelixStore discipline) ---

  private def readGraveyard(): Seq[(String, Long)] =
    if (!Files.exists(graveyardFile)) Seq.empty
    else new String(Files.readAllBytes(graveyardFile)).split('\n').toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map { l => val Array(n, s) = l.split(" ", 2); (n, s.toLong) }

  private def writeGraveyard(entries: Seq[(String, Long)]): Unit = {
    val tmp = root.resolve("_graveyard.tmp")
    Files.write(tmp,
      entries.map { case (n, s) => s"$n $s" }.mkString("", "\n", "\n").getBytes)
    Files.move(tmp, graveyardFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Physically delete graveyarded generation dirs older than
    * `olderThanMs` — safe once no reader plan can still reference them
    * (the snapshot-retention contract of log-structured formats). */
  def vacuum(olderThanMs: Long = 0L): Unit = synchronized {
    val now = System.currentTimeMillis()
    val (dead, live) = readGraveyard()
      .partition { case (_, since) => now - since >= olderThanMs }
    dead.foreach { case (n, _) => deleteRecursively(root.resolve(n)) }
    if (dead.nonEmpty || Files.exists(graveyardFile)) writeGraveyard(live)
  }

  // ---- open / recovery -------------------------------------------------

  /** Open the root: write the gen-1 pointer (referencing the external
    * staged base index) if none exists, else roll back any crashed
    * swap — un-referenced, un-graveyarded `g-N` dirs are a crashed
    * commit's half-written output and are deleted; a stale pointer tmp
    * is discarded. After open, the committed pointer names one
    * complete generation. */
  def open(centroidsPath: String, basePath: String): Pointer = synchronized {
    Files.createDirectories(root)
    if (!Files.exists(pointerFile)) {
      val p = Pointer(1L, centroidsPath, basePath, Seq.empty, None)
      writePointer(p)
      p
    } else {
      Files.deleteIfExists(root.resolve("_current.tmp"))
      val p = readPointer()
      val live = ownedDirs(p)
      val buried = readGraveyard().map(_._1).toSet
      listDir(root)
        .filter { d =>
          val n = d.getFileName.toString
          n.matches("^g-[0-9]+$") && !live.contains(n) && !buried.contains(n)
        }
        .foreach(deleteRecursively)
      p
    }
  }

  // ---- readers -----------------------------------------------------------

  /** The committed generation's centroid table (clabel, cv, cn). */
  def centroids(s: SparkSession): DataFrame =
    s.read.parquet(resolve(readPointer().centroids))

  /** The committed generation's inverted lists: base partitions minus
    * the dropped (re-homed) cells, union the delta lists. The dropped
    * set enters as a STATIC partition filter (plan literals) and the
    * delta is drift+arrival sized, so a probe's cell pruning works
    * identically on both legs. */
  def lists(s: SparkSession): DataFrame = {
    val p = readPointer()
    val cols = Seq(col("vec_id"), col("label"), col("v"), col("assigned_label"))
    val base = s.read.parquet(resolve(p.base)).select(cols: _*)
    val kept =
      if (p.dropped.isEmpty) base
      else base.filter(!col("assigned_label").isin(p.dropped: _*))
    p.delta match {
      case Some(d) => kept.unionAll(s.read.parquet(resolve(d)).select(cols: _*))
      case None => kept
    }
  }

  // ---- the commit --------------------------------------------------------

  /** Commit the rebalanced post-state as generation gen+1. The math is
    * the `ann_ivf_rebalance` contract verbatim (same incremental
    * refresh, same round-6 shift rank, same fold tie order — the
    * committed index IS the frame that report describes): arrivals
    * fold against the CURRENT centroids; the [[Similarity.RebDriftCells]]
    * most-shifted cells re-home (their current members + their
    * arrivals re-assign against the refreshed centroids); non-drifted
    * arrivals keep their fold cell. Writes: K-row centroids + delta
    * lists (drift+arrival mass). Protocol: files → pointer tmp →
    * atomic rename → bury superseded dirs (crash-hook named at each
    * step). Returns the committed pointer. */
  def commitRebalance(s: SparkSession, arrivals: DataFrame): Pointer =
    synchronized {
      import graft.operators.Similarity.{RebDriftCells, assignByFold, cosine, l2norm}
      val cur = readPointer()
      val newGen = cur.gen + 1
      val gname = s"g-$newGen"
      val gdir = root.resolve(gname)
      // a dir with this name can only be a crashed attempt's orphan
      // (committed generations are always pointer-referenced)
      deleteRecursively(gdir)
      Files.createDirectories(gdir)

      val curCents = centroids(s)
      val curLists = lists(s)
      val arrAssigned = assignByFold(arrivals, curCents)
        .select(col("vec_id"), col("label"), col("v"), col("assigned_label"))
        .localCheckpoint()
      // incremental centroid refresh — identical op order to the
      // rebalance report: (mean·n_old + arrival sums) / (n_old + n_arr)
      val dimSums = (0 until 64).map(j =>
        sum(element_at(col("v"), j + 1)).as(s"s$j"))
      val arrStats = arrAssigned.groupBy(col("assigned_label").as("clabel"))
        .agg(count(lit(1)).as("n_arr"), dimSums: _*)
        .select(col("clabel"), col("n_arr"),
          array((0 until 64).map(j => col(s"s$j")): _*).as("sa"))
      val oldCounts = curLists
        .groupBy(col("assigned_label").as("clabel"))
        .agg(count(lit(1)).as("n_old"))
      val nc = curCents.join(oldCounts, "clabel")
        .join(arrStats, Seq("clabel"), "left")
        .withColumn("n_arr", coalesce(col("n_arr"), lit(0L)))
        .withColumn("ncv", array((0 until 64).map(j =>
          (element_at(col("cv"), j + 1) * col("n_old")
            + coalesce(element_at(col("sa"), j + 1), lit(0.0)))
            / (col("n_old") + col("n_arr"))): _*))
        .withColumn("shift",
          round(lit(1.0) - cosine(col("cv"), col("ncv")), 6))
        .select("clabel", "ncv", "shift")
        .localCheckpoint()
      val driftedIds: Seq[Int] = nc.select(col("clabel"), col("shift"))
        .collect()
        .map(r => (r.getInt(0), r.getDouble(1)))
        .sortBy { case (l, sh) => (-sh, l) }
        .take(RebDriftCells).map(_._1).toSeq
      val inDrift = col("assigned_label").isin(driftedIds: _*)

      val newCents = nc.select(col("clabel"), col("ncv").as("cv"))
        .withColumn("cn", l2norm(col("cv")))
      newCents.coalesce(1).write.parquet(gdir.resolve("centroids").toString)
      val vcols = Seq(col("vec_id"), col("label"), col("v"))
      val rehomed = assignByFold(
        curLists.filter(inDrift).select(vcols: _*)
          .unionAll(arrAssigned.filter(inDrift).select(vcols: _*)),
        s.read.parquet(gdir.resolve("centroids").toString))
        .select(col("vec_id"), col("label"), col("v"), col("assigned_label"))
      // new delta = prior delta rows in kept cells + non-drifted
      // arrivals + the re-homed drift mass (drift+arrival sized — the
      // base partitions of kept cells are never rewritten)
      val keptOldDelta = cur.delta match {
        case Some(d) => s.read.parquet(resolve(d))
          .select(col("vec_id"), col("label"), col("v"), col("assigned_label"))
          .filter(!inDrift)
        case None => s.emptyDataFrame // never unioned (see below)
      }
      val deltaRows = {
        val fresh = arrAssigned.filter(!inDrift).unionAll(rehomed)
        if (cur.delta.isDefined) keptOldDelta.unionAll(fresh) else fresh
      }
      deltaRows
        .repartition(col("assigned_label"))
        .write.partitionBy("assigned_label")
        .parquet(gdir.resolve("delta").toString)
      crashHook("commit:staged")

      val next = Pointer(newGen, s"$gname/centroids", cur.base,
        (cur.dropped ++ driftedIds).distinct.sorted,
        Some(s"$gname/delta"))
      writePointer(next)
      crashHook("commit:pointer-durable")
      // bury the superseded generation's OWNED dirs (never the shared
      // external base); physical deletion is vacuum's, after retention
      val superseded = ownedDirs(cur) -- ownedDirs(next)
      if (superseded.nonEmpty) {
        val now = System.currentTimeMillis()
        writeGraveyard(readGraveyard() ++ superseded.toSeq.sorted.map(_ -> now))
      }
      crashHook("commit:buried")
      next
    }

  private def listDir(p: Path): Seq[Path] = {
    if (!Files.exists(p)) return Seq.empty
    val s = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    } finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p): Unit
  }
}

object IvfGen {
  /** One committed generation: `centroids` and `delta` are dirs the
    * root owns (root-relative) or external staged artifacts (absolute);
    * `base` is the original full inverted-list layout, `dropped` the
    * cells whose base lists are superseded by re-homed delta rows. */
  final case class Pointer(gen: Long, centroids: String, base: String,
      dropped: Seq[Int], delta: Option[String])

  /** The arrival slice of the commit's registered query — the same
    * not-yet-indexed 5% tail `ann_ivf_incremental` serves by brute
    * merge and `ann_ivf_rebalance` folds into its report. */
  def arrivalSlice(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(pmod(col("vec_id"), lit(IvfIndex.IncrMod)) === IvfIndex.IncrRem)
      .select(col("vec_id"), col("label"),
        Similarity.toDoubleVec(col("embedding")).as("v"))

  /** Staged committed generation for `dir`: gen-1 = the sliced index
    * (ann_ivf_incremental's state), then ONE rebalance commit absorbs
    * the arrival slice — built at most once per source fingerprint,
    * atomic via [[Staging.ensure]]. */
  def ensureCommitted(s: SparkSession, dir: String): IvfGen = {
    val (centPath, assignedPath) = IvfIndex.ensureIndexed(s, dir)
    val base = Staging.ensure("ivfgen",
      s"${Staging.fingerprint(dir, "embeddings.parquet")}-v1") { tmp =>
      val g = new IvfGen(tmp.toString)
      g.open(centPath, assignedPath)
      g.commitRebalance(s, arrivalSlice(s, dir)): Unit
    }
    val g = new IvfGen(base.toString)
    g.open(centPath, assignedPath)
    g
  }
}
