package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/**
 * Offline IVF index build, staged to parquet once per source dataset —
 * the inverted-file layout every real ANN system materializes ahead of
 * query time. The registered `ann_ivf_topk` query is the PROBE path
 * only: it reads the tiny centroid table, picks the nprobe nearest
 * cells, and scans just those cells' partitions of the assignment
 * table (cell = parquet partition column → partition pruning).
 *
 * Reference analogue: the coarse-quantizer + inverted lists an IVF
 * index persists; at 100 TB the assignment table is the stored,
 * cell-partitioned corpus and a probe touches nprobe/ncells of it.
 *
 * Staleness safety: the stage directory is keyed by a fingerprint of
 * the source parquet's file metadata (name, length, mtime), so a
 * regenerated source can never be served by a stale index. Builds are
 * atomic (write to a temp dir, rename into place) so concurrent JVMs
 * race benignly.
 */
object IvfIndex {

  /** Overridable (-Dgraft.stage.dir=...) and derived from the working
    * directory by default, so the index stages inside whatever checkout
    * or container runs the suite. */
  private val stageRoot = sys.props.getOrElse("graft.stage.dir",
    Paths.get(sys.props("user.dir"), "target", "graft-stage").toString)

  /** Fingerprint of the embeddings source files: any rewrite of the
    * source changes it, forcing a rebuild under a fresh path. */
  private def fingerprint(dir: String): String = {
    val src = Paths.get(dir, "embeddings.parquet")
    val entries: Seq[String] =
      if (Files.isDirectory(src)) {
        val s = Files.list(src)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map { p =>
            s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
          }.toSeq.sorted
        } finally s.close()
      } else Seq(s"f:${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(entries.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Ensure the index exists for `dir`; returns (centroidsPath,
    * assignedPath). Builds at most once per source fingerprint. */
  def ensure(s: SparkSession, dir: String): (String, String) = synchronized {
    val key = fingerprint(dir)
    val base = Paths.get(stageRoot, s"ivf-$key")
    val ready = base.resolve("_GRAFT_READY")
    if (!Files.exists(ready)) build(s, dir, base)
    (base.resolve("centroids").toString, base.resolve("assigned").toString)
  }

  private def build(s: SparkSession, dir: String, base: Path): Unit = {
    val tmp = base.getParent.resolve(s"${base.getFileName}.tmp-${java.util.UUID.randomUUID()}")
    Files.createDirectories(tmp)
    try {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), Similarity.toDoubleVec(col("embedding")).as("v"))
      val cents = Similarity.centroidsOf(e)
      cents.coalesce(1).write.parquet(tmp.resolve("centroids").toString)
      // Assignment is the fold-argmax projection — one pass over the
      // corpus, no row expansion, no per-vector window — written with
      // the cell as the partition column (the inverted lists).
      Similarity.assignByFold(e, s.read.parquet(tmp.resolve("centroids").toString))
        .select(col("vec_id"), col("v"), col("assigned_label"))
        .repartition(col("assigned_label"))
        .write.partitionBy("assigned_label")
        .parquet(tmp.resolve("assigned").toString)
      Files.writeString(tmp.resolve("_GRAFT_READY"), "ok")
      try Files.move(tmp, base, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException |
                   _: java.nio.file.DirectoryNotEmptyException =>
        // another builder won the race; its index is equivalent
        deleteRecursively(tmp)
      }
    } catch { case e: Throwable => deleteRecursively(tmp); throw e }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
  }

  /** Test hook: drop every staged index so a spec can measure a cold
    * build deterministically. */
  def clear(): Unit = synchronized {
    deleteRecursively(Paths.get(stageRoot))
  }
}
