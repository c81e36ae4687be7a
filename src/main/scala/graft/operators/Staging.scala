package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Shared machinery for OFFLINE staged artifacts (the IVF index, the
 * dedup signature store): a content fingerprint of the source parquet
 * keys the staged directory, builds are atomic (write to a temp dir,
 * rename into place) so concurrent JVMs race benignly, and a
 * regenerated source can never be served by a stale artifact.
 */
object Staging {

  /** Overridable (-Dgraft.stage.dir=...) and derived from the working
    * directory by default, so artifacts stage inside whatever checkout
    * or container runs the suite. */
  private val stageRoot = sys.props.getOrElse("graft.stage.dir",
    Paths.get(sys.props("user.dir"), "target", "graft-stage").toString)

  /** Fingerprint of a source table's files (name, length, mtime): any
    * rewrite of the source changes it, forcing a rebuild. */
  def fingerprint(dir: String, table: String): String = {
    val src = Paths.get(dir, table)
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

  /** Staged dirs this process has ensured (hit or built) — the basis
    * for [[coldBuildSecs]]. */
  private val touched = scala.collection.mutable.LinkedHashSet.empty[Path]

  /** Ensure the `<prefix>-<key>` staged dir exists, running `build`
    * into a temp dir at most once per key; returns the ready base.
    * The build's wall seconds are persisted INSIDE the artifact
    * (`_GRAFT_BUILD_SECS`), so a later fingerprint-cache HIT can still
    * report what the artifact cost to build cold. */
  def ensure(prefix: String, key: String)(build: Path => Unit): Path =
    synchronized {
      val base = Paths.get(stageRoot, s"$prefix-$key")
      val ready = base.resolve("_GRAFT_READY")
      if (!Files.exists(ready)) {
        val tmp = base.getParent.resolve(
          s"${base.getFileName}.tmp-${java.util.UUID.randomUUID()}")
        Files.createDirectories(tmp)
        try {
          val t0 = System.nanoTime()
          build(tmp)
          Files.writeString(tmp.resolve("_GRAFT_BUILD_SECS"),
            "%.3f".formatLocal(java.util.Locale.ROOT,
              (System.nanoTime() - t0) / 1e9))
          Files.writeString(tmp.resolve("_GRAFT_READY"), "ok")
          try Files.move(tmp, base, StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException |
                       _: java.nio.file.DirectoryNotEmptyException =>
            // another builder won the race; its artifact is equivalent
            deleteRecursively(tmp)
          }
        } catch { case e: Throwable => deleteRecursively(tmp); throw e }
      }
      touched += base
      base
    }

  /** Sum of recorded cold-build seconds across every staged artifact
    * this process has ensured — the honest "staging from nothing" cost
    * even when each ensure() was a cache hit (whose measured cost is
    * just a readiness probe). Artifacts staged before the build-secs
    * record existed contribute 0 — the sum is a floor, never a lie. */
  def coldBuildSecs: Double = synchronized {
    touched.toSeq.map { base =>
      val f = base.resolve("_GRAFT_BUILD_SECS")
      if (Files.exists(f))
        scala.util.Try(Files.readString(f).trim.toDouble).getOrElse(0.0)
      else 0.0
    }.sum
  }

  private[graft] def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
  }

  // Modules holding live handles into staged dirs (HelixScan's cached
  // open stores) register a hook so ANY module's clear() — they all
  // delegate here — releases the handles before the dirs vanish under
  // them.
  private val clearHooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  def registerClearHook(f: () => Unit): Unit = synchronized { clearHooks += f }

  /** Test hook: drop every staged artifact so a spec can measure a
    * cold build deterministically. */
  def clear(): Unit = synchronized {
    clearHooks.foreach(f => try f() catch { case _: Throwable => () })
    deleteRecursively(Paths.get(stageRoot))
  }
}
