package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Spark-native re-expression of the reference store
 * (reference: src/db.rs:33-80 — HelixDB::open/put/get/scan/close;
 * src/level.rs — rick/SSTable levels, TimestampReviewer compact+outdate).
 *
 * Logical model: (key: BINARY, ts: LONG) → value: BINARY, exactly the
 * reference's Entry (reference: src/types/entry.rs). Physical model:
 * parquet partitioned by
 *   shard  = pmod(xxhash64(key), numShards)   — the ShardingKeyFn
 *   bucket = ts div bucketSize                — the time level
 * so key point-reads prune to one shard directory and time-range scans
 * prune to the touched buckets — the Spark equivalent of the
 * reference's per-shard rick files and per-time-range SSTables.
 *
 * == Crash-safe layout ==
 * All state lives under one root:
 * {{{
 *   <path>/_current    commit pointer (atomic rename is the commit point)
 *   <path>/_seqs/<n>   one atomically-created file per claimed write seq
 *   <path>/r-<g>/...   rick (row) layer, generation g
 *   <path>/b-<g>/...   block ("SSTable") layer, generation g
 *   <path>/m-<g>/...   min/max-key manifest for the block layer
 * }}}
 * Compactions write complete NEW generation directories, then commit by
 * atomically replacing `_current` (rows, blocks and manifest flip
 * together), then delete the old generations. A crash at any point
 * leaves either the old pointer (new dirs are unreferenced orphans,
 * rolled back by `open()`) or the new pointer (old dirs are orphans,
 * likewise removed) — committed data is never lost mid-swap, matching
 * the reference's crash-recoverable level swap (src/level.rs).
 *
 * Freshly `put` data lands as small append files (the "rick" role);
 * `compact()` rewrites each partition into one file sorted by
 * (key, ts) with last-write-wins applied (the "SSTable" role);
 * `outdate()` drops whole bucket partitions (O(partitions) metadata, no
 * data rewrite) — the Outdate timestamp action.
 *
 * At cluster scale the same layout holds: shards spread writes across
 * executors, buckets bound the data any time-ranged query touches, and
 * compaction is an embarrassingly parallel per-partition rewrite whose
 * commit is one metadata rename.
 */
/** User-defined compress function (UDCF) over a block's value payload —
  * the reference's headline custom-compression surface (reference:
  * src/fn_registry.rs:12-16 CompressFn/DecompressFn). `encode` packs one
  * key's value run into a single blob at compaction; `decode` must
  * invert it exactly. Implementations must be Serializable: they run
  * inside executor-side compaction tasks. */
trait BlockCodec extends Serializable {
  def name: String
  def encode(vals: Array[Array[Byte]]): Array[Byte]
  def decode(blob: Array[Byte]): Array[Array[Byte]]
}

/** Built-in codec mirroring the reference's `noop` UDCF (fn_registry.rs
  * noop compress: concatenated values with a length footer): 4-byte
  * big-endian length prefix per value. */
object NoopCodec extends BlockCodec {
  val name = "noop"
  def encode(vals: Array[Array[Byte]]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(vals.map(_.length + 4).sum)
    vals.foreach { v => buf.putInt(v.length); buf.put(v) }
    buf.array()
  }
  def decode(blob: Array[Byte]): Array[Array[Byte]] = {
    val buf = java.nio.ByteBuffer.wrap(blob)
    val out = Array.newBuilder[Array[Byte]]
    while (buf.remaining() > 0) {
      val v = new Array[Byte](buf.getInt())
      buf.get(v)
      out += v
    }
    out.result()
  }
}

final case class StoreOptions(
    numShards: Int = 8,
    /** Timestamp units per bucket (the reference's rick_range). */
    bucketSize: Long = 86400L,
    /** User-registered sharding function over the key column — the
      * reference's ShardingKeyFn (fn_registry.rs:55). Must return a
      * value in [0, numShards). None = pmod(xxhash64(key), numShards). */
    shardingFn: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None,
    /** Named UDCF registry — reference register_udcf (fn_registry.rs:75).
      * Every codec a dispatch can name must be registered BEFORE data is
      * compacted with it and kept registered for as long as blocks
      * encoded with it exist. */
    codecs: Map[String, BlockCodec] = Map(NoopCodec.name -> NoopCodec),
    /** Per-key codec dispatch — reference register_dispatch_fn
      * (fn_registry.rs:88): maps a key to the name of the codec that
      * compresses its blocks. None = everything through `noop`. Must be
      * deterministic and Serializable (runs in compaction tasks). */
    codecDispatch: Option[Array[Byte] => String] = None,
    /** Age (ms) after which a superseded generation in the graveyard may
      * be physically deleted by vacuum(). Retention gives lazily-running
      * reader plans time to finish against swapped-out generations —
      * the snapshot-retention idea from log-structured table formats. */
    graveyardRetentionMs: Long = 10 * 60 * 1000L,
    /** Age (ms) after which a cross-process mutation lock is presumed
      * abandoned (holder crashed) and may be broken. */
    lockStaleMs: Long = 10 * 60 * 1000L,
    /** Point-read LRU capacity — the reference's kv_cache
      * (cache.rs CacheConfig.kv_cache_size, default 256). 0 disables.
      * Safe under concurrent writers: the cache epoch is (pointer,
      * max write-seq), and every mutation moves one of the two. */
    kvCacheSize: Int = 256,
    /** Largest VALUE (bytes) the kv cache will hold — the reference's
      * kv_cache_threshold (cache.rs:23, applied at cache.rs:104: an
      * entry at or above the threshold is served but not cached).
      * "Cache small and frequent is better" (cache.rs doc): without
      * the cap, kvCacheSize pathological values could pin
      * size × valueBytes of driver heap. */
    kvCacheThresholdBytes: Long = 1L << 20,
    /** Compressed-block LRU capacity — the reference's kc_cache
      * (cache.rs:17 kc_cache_size: key → compressed bytes). Caches a
      * key's UNDECODED blocks per (shard, bucket): a repeat point read
      * of the same key at a DIFFERENT timestamp (which the kv cache
      * misses) decodes driver-side instead of re-scanning the block
      * parquet. 0 disables. Epoch = the committed pointer: blocks only
      * change on compact/outdate/vacuum, so puts (rick-only mutations)
      * leave cached blocks valid. (The reference's kp_cache —
      * key → value-log position — has no Spark analogue: there is no
      * value log.) */
    kcCacheSize: Int = 256,
    /** Largest ENTRY (total bytes of one key's blocks in one (shard,
      * bucket)) the kc cache will hold — the reference's
      * kc_cache_threshold (cache.rs:25): oversized entries are served
      * but not cached, bounding worst-case driver heap at
      * kcCacheSize × this, entry count alone bounds nothing when one
      * key's blocks are huge. */
    kcCacheThresholdBytes: Long = 8L << 20,
    /** Manifest rows above which the driver-side collected prune map is
      * abandoned (the collect would not be driver-bounded); point reads
      * then prune through a filtered one-row probe of the manifest
      * parquet instead — proof of absence survives at any manifest
      * size, at the cost of one tiny scan per get. */
    manifestPruneMaxEntries: Long = 100000L,
    /** Ingest fan-out: writer tasks (≈ parquet files) each put spreads
      * one (shard, bucket) partition across — the tuning surface the
      * reference exposes as write-batch sizing (src/option.rs
      * Options.write_batch, src/level.rs:594 WriteBatchConfig). 1
      * (default) clusters every touched partition into a single file
      * per put: fewest files, write parallelism = #touched partitions.
      * n > 1 salts the pre-write shuffle so a hot partition's rows
      * spread over up to n writer tasks (wider ingest, more files).
      * 0 skips the pre-write shuffle entirely: every input task writes
      * its own file into each partition it holds — lowest ingest
      * latency, most files (the small-files trade the reference makes
      * with batch_size = 0). */
    putWritersPerPartition: Int = 1,
    /** Background-compaction requests that may sit QUEUED beyond the
      * running one — the reference's Options.task_buffer_size
      * (option.rs:119). Requests past the buffer coalesce into the
      * already-queued pass (which will see their data anyway); 1
      * (default) keeps at most one in-flight + one pending. */
    taskBufferSize: Int = 1,
    /** When set, a daemon timer calls scheduleBlockCompact() every
      * interval while un-blocked rick rows exist — the reference's
      * periodic compaction prompt (option.rs:124
      * compact_prompt_interval). None (default) = compactions run only
      * when the lifecycle or the caller asks. */
    compactPromptIntervalMs: Option[Long] = None)

/** Per-scan tuning — the reference's `ScanOption.prefetch_buf_size`
  * (src/option.rs:151). In a Spark scan "read-ahead" is governed by
  * input-split sizing and output parallelism rather than one ring
  * buffer, so the analogue is two knobs:
  *  - `maxPartitionBytes`: bytes per scan task for THIS scan only
  *    (smaller → more, smaller read units — the prefetch-buffer dial).
  *    Honored by planning the scan through a cloned session so the
  *    rest of the session's conf is untouched.
  *  - `targetPartitions`: output partition count of the scan (0 =
  *    leave to the optimizer/AQE). Ordered scans range-partition on
  *    (key, ts) into exactly this many partitions, preserving global
  *    order; unordered scans round-robin. */
final case class ScanOptions(
    targetPartitions: Int = 0,
    maxPartitionBytes: Option[Long] = None,
    comparator: Option[Column => Column] = None) {
  require(targetPartitions >= 0,
    s"targetPartitions must be >= 0: $targetPartitions")
  require(maxPartitionBytes.forall(_ > 0),
    s"maxPartitionBytes must be positive: $maxPartitionBytes")
}

object HelixStore {
  val EntryColumns: Seq[String] = Seq("key", "ts", "value")

  /** Unsigned-lexicographic byte-array ordering — exactly Spark SQL's
    * BinaryType comparison, so driver/executor Scala code (mapGroups
    * LWW) picks the same winner as the Catalyst orderBy sites. */
  private[core] object BytesOrdering extends Ordering[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** Compressed block: one key's run within one (shard, bucket), ts
    * delta-encoded from t0 with the max ts carried as t1 (so BOTH time
    * bounds of a ranged scan prune at the parquet scan before the
    * decode — the reference's SSTable block-meta time range), per-entry
    * seq preserved for LWW, values packed into one `payload` blob by
    * the named UDCF `codec` — the SSTable+UDCF unit (reference:
    * src/file/sstable.rs + fn_registry.rs compress_entries). */
  final case class BinBlock(key: Array[Byte], shard: Int, bucket: Long,
      t0: Long, t1: Long, deltas: Array[Long], seqs: Array[Long],
      codec: String, payload: Array[Byte])

  def open(spark: SparkSession, path: String,
      opts: StoreOptions = StoreOptions()): HelixStore =
    new HelixStore(spark, path, opts)
}

final class HelixStore private (
    val spark: SparkSession, val path: String, val opts: StoreOptions) {
  import HelixStore._

  require(opts.numShards > 0, s"numShards must be positive: ${opts.numShards}")
  require(opts.bucketSize > 0, s"bucketSize must be positive: ${opts.bucketSize}")
  require(opts.codecs.nonEmpty, "at least one codec must be registered")
  require(opts.putWritersPerPartition >= 0,
    s"putWritersPerPartition must be >= 0: ${opts.putWritersPerPartition}")
  // The heartbeat touches a held lock every max(250ms, lockStaleMs/3);
  // a staleness window at or below the heartbeat period would let a
  // LIVE lock be presumed stale between touches, silently voiding the
  // guarantee. Keep the window comfortably above the minimum period.
  require(opts.lockStaleMs > 1000L,
    s"lockStaleMs must exceed 1000ms (heartbeat floor is 250ms): ${opts.lockStaleMs}")
  require(opts.taskBufferSize >= 1,
    s"taskBufferSize must be >= 1: ${opts.taskBufferSize}")
  require(opts.compactPromptIntervalMs.forall(_ > 0),
    s"compactPromptIntervalMs must be positive: ${opts.compactPromptIntervalMs}")

  /** TEST-ONLY crash injection (StoreCrashSpec): invoked at named
    * points inside the commit protocol so a spec can simulate a
    * process death between any two protocol steps by throwing from
    * here. Production value is a no-op; the hook sits outside every
    * hot path (commit windows only). Declared BEFORE `ptr`: the
    * pointer initializer commits on first open and already fires it. */
  private[graft] var crashHook: String => Unit = _ => ()

  private val root: Path = Paths.get(path)
  private val seqsDir: Path = root.resolve("_seqs")
  private val pointerFile: Path = root.resolve("_current")
  private val mutexFile: Path = root.resolve("_mutex")
  private val graveyardFile: Path = root.resolve("_graveyard")
  /** Identifies this instance's cross-process lock ownership. */
  private val instanceId: String = java.util.UUID.randomUUID().toString

  // ---- cross-process mutation lock ------------------------------------
  // Every MUTATION (put, compact, blockCompact, outdate, vacuum, open-
  // time orphan cleanup) runs under an exclusive on-disk lock claimed by
  // atomically creating `_mutex` — so another process's put can never
  // interleave with this process's compaction swap (the lost-write and
  // deleted-uncommitted-output races). The lock is reentrant PER
  // INSTANCE (hold count), which is what lets a put proceed while this
  // same instance's background compaction holds the lock — intra-
  // instance interleaving is governed by the finer putGate below. A lock
  // whose file is older than opts.lockStaleMs is presumed abandoned by a
  // crashed process and broken. At cluster scale this role is played by
  // a catalog/metastore transaction lock; a lock FILE works for any
  // filesystem with atomic create (not S3 — document before porting).
  private val lockState = new Object
  private var lockHolds = 0

  /** Touches the held lock file periodically so a LIVE long mutation is
    * never presumed stale: without the heartbeat, any compaction longer
    * than lockStaleMs would have its lock broken mid-flight by a
    * waiting process and two mutators would interleave — the exact race
    * the lock exists to prevent. */
  private val lockHeartbeat =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-lock-heartbeat"); t.setDaemon(true); t
    })
  locally {
    val period = math.max(250L, opts.lockStaleMs / 3)
    lockHeartbeat.scheduleWithFixedDelay(() => lockState.synchronized {
      if (lockHolds > 0) {
        try {
          if (new String(Files.readAllBytes(mutexFile)) == instanceId)
            Files.setLastModifiedTime(mutexFile,
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis()))
        } catch { case _: java.io.IOException => () }
      }
    }, period, period, java.util.concurrent.TimeUnit.MILLISECONDS): Unit
  }

  // periodic compaction prompt (reference compact_prompt_interval,
  // option.rs:124): while un-blocked rick rows exist, nudge the deduped
  // background scheduler. DEDICATED daemon timer — the probe does a
  // pointer read + rick dir listing, which on a slow filesystem could
  // outlast the heartbeat period; sharing the heartbeat thread would
  // delay lock touches and let a waiter presume a LIVE lock stale. The
  // compaction itself runs on compactExec, never here.
  private val compactPrompt = opts.compactPromptIntervalMs.map { iv =>
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-compact-prompt"); t.setDaemon(true); t
    })
    ex.scheduleWithFixedDelay(() => {
      try { if (hasRickRows) scheduleBlockCompact() }
      catch { case _: Throwable => () } // a failed probe must not kill the timer
    }, iv, iv, java.util.concurrent.TimeUnit.MILLISECONDS): Unit
    ex
  }

  private def acquireMutex(): Unit = {
    // Cross-iteration stale-confirmation state: (lock bytes, mtime,
    // first-observed-at). Staleness is confirmed by TWO observations of
    // the SAME bytes+mtime at least one heartbeat period apart — a live
    // holder touches mtime every period. Carrying the first observation
    // across loop iterations means each waiter pays the confirm delay
    // AT MOST ONCE per distinct lock state: a waiter that just lost the
    // break race to another process sees the winner's FRESH bytes,
    // resets this, and goes back to fast 5 ms spins instead of
    // serializing one full confirm-sleep per waiter per retry.
    var staleObs: Option[(String, Long, Long)] = None
    while (true) {
      // re-checked EVERY iteration: if another thread of this instance
      // won the file while we spun, we must join its hold count — not
      // keep spinning until release (and never stale-break our own
      // instance's live lock)
      lockState.synchronized {
        if (lockHolds > 0) { lockHolds += 1; return }
      }
      try {
        Files.write(mutexFile, instanceId.getBytes,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        lockState.synchronized { lockHolds += 1 }
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // stale-break: holder crashed without releasing
          try {
            val staleContent =
              try Some(new String(Files.readAllBytes(mutexFile)))
              catch { case _: java.io.IOException => None }
            val staleMtime = Files.getLastModifiedTime(mutexFile).toMillis
            val age = System.currentTimeMillis() - staleMtime
            val ownedByUs = staleContent.contains(instanceId)
            // Staleness must survive a CONFIRMING re-observation one
            // heartbeat period later before anyone breaks the lock: a
            // live holder touches mtime every period, so the same
            // bytes+mtime seen across >= one period means the holder is
            // really gone (or frozen past its entire staleness budget).
            // This shrinks the misjudge window from "one delayed touch"
            // to "holder stalled for lockStaleMs + a full period". The
            // two observations are loop iterations against the cached
            // staleObs, not an inline sleep, so the wait interleaves
            // with the CREATE_NEW attempts above and resets the moment
            // the lock changes hands. The observe→move gap below is the
            // documented RESIDUAL race; the tombstone bytes+mtime check
            // and the restore loop handle a fresh lock captured inside
            // it.
            val confirmDelay = math.max(250L, opts.lockStaleMs / 3)
            val overAge = !ownedByUs && staleContent.isDefined &&
              age > opts.lockStaleMs
            val confirmedStale = overAge && {
              val cur = (staleContent.get, staleMtime)
              val now = System.currentTimeMillis()
              staleObs match {
                case Some((c, m, t0)) if (c, m) == cur =>
                  now - t0 >= confirmDelay
                case _ =>
                  staleObs = Some((cur._1, cur._2, now)); false
              }
            }
            if (!overAge) staleObs = None
            if (confirmedStale) {
              // ATOMIC break: rename the stale file to a tombstone only
              // one waiter can win. A bare delete races — two waiters
              // could both pass the age check, the first re-acquire,
              // and the second's delete would then remove the FRESH
              // lock, letting two mutators run concurrently.
              val tomb = root.resolve(s"_mutex.stale.$instanceId")
              try {
                Files.move(mutexFile, tomb,
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                // The age check and the move are still two steps:
                // another waiter may have broken the same stale lock
                // in between and its new owner re-created a FRESH
                // `_mutex` — which our move just captured. Only delete
                // the tombstone if it holds EXACTLY the bytes+mtime we
                // judged stale (rename preserves both); otherwise hand
                // the fresh lock back and keep waiting.
                val tombContent =
                  try Some(new String(Files.readAllBytes(tomb)))
                  catch { case _: java.io.IOException => None }
                val tombMtime =
                  try Files.getLastModifiedTime(tomb).toMillis
                  catch { case _: java.io.IOException => -1L }
                if (tombContent == staleContent && tombMtime == staleMtime) {
                  Files.deleteIfExists(tomb): Unit
                } else {
                  // captured a live lock — restore it. A third waiter
                  // could create `_mutex` inside this window; spin a
                  // bounded retry rather than deleting a live lock.
                  var restored = false
                  var attempts = 0
                  var overlapFlagged = false
                  while (!restored && attempts < 200) {
                    try {
                      Files.move(tomb, mutexFile,
                        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                      restored = true
                    } catch {
                      case _: java.nio.file.FileAlreadyExistsException =>
                        // a THIRD waiter acquired while the live lock sat
                        // captured in our tombstone — the captured owner
                        // and that waiter may have overlapped. Flag it
                        // for operator forensics; the restore still
                        // proceeds once the third waiter releases.
                        if (!overlapFlagged) {
                          overlapFlagged = true
                          System.err.println(
                            s"[helixstore] WARNING: lock break captured a live lock " +
                              s"and a third waiter acquired during the capture window " +
                              s"($mutexFile); mutator overlap possible in that window")
                        }
                        attempts += 1; Thread.sleep(5)
                      case _: java.io.IOException =>
                        restored = true // tombstone gone — nothing to restore
                    }
                  }
                  // Giving up silently would leave the captured owner
                  // believing it holds a lock that no longer exists on
                  // disk while another waiter acquired — the exact
                  // two-mutators outcome. FAIL LOUDLY: this waiter's
                  // mutation aborts, and the stranded tombstone keeps
                  // the evidence for operator forensics.
                  if (!restored)
                    throw new IllegalStateException(
                      s"lock break captured a live lock and could not restore it " +
                        s"(tombstone: $tomb); aborting rather than risking two mutators")
                }
              } catch { case _: java.io.IOException => () } // lost the break race
            }
            // Awaiting a stale confirmation, poll gently (the lock can
            // only change hands, which resets the observation); in live
            // contention, spin fast to win the release promptly.
            else Thread.sleep(if (overAge) math.min(confirmDelay, 250L) else 5)
          } catch { case _: java.nio.file.NoSuchFileException => () }
      }
    }
  }

  private def releaseMutex(): Unit = lockState.synchronized {
    lockHolds -= 1
    if (lockHolds == 0) {
      // Only keep the file on positive proof another process now owns
      // it (a stale-break while we overstayed — the heartbeat makes
      // that near-impossible). A file that is GONE means there is
      // nothing of ours to clean up — deleting after a breaker's
      // mid-move window could remove the breaker's re-created fresh
      // lock. Other read failures must still delete: leaking our own
      // lock would wedge this instance behind the full staleness
      // window with no escape (the stale-break guard never fires on a
      // file holding our own id).
      val stillOurs =
        try new String(Files.readAllBytes(mutexFile)) == instanceId
        catch {
          case _: java.nio.file.NoSuchFileException => false
          case _: java.io.IOException => true
        }
      if (stillOurs) {
        try Files.deleteIfExists(mutexFile): Unit
        catch { case _: java.io.IOException => () }
      }
    }
  }

  private def withMutex[T](f: => T): T = {
    acquireMutex()
    try f finally releaseMutex()
  }

  // ---- intra-instance put/compaction gate -----------------------------
  // Puts and a background compaction of the SAME instance overlap almost
  // entirely: the compaction reads a snapshot of the rick file list,
  // builds the new generation, and only its brief commit window excludes
  // puts — entries put meanwhile land in the old rick dir and are MOVED
  // into the new generation during that window (reference analogue: the
  // rick keeps accepting writes while level compaction runs off-path,
  // compact_sched.rs).
  private val putGate = new Object
  private var activePuts = 0
  private var commitPending = false

  private def beginPut(): Unit = putGate.synchronized {
    while (commitPending) putGate.wait()
    activePuts += 1
  }
  private def endPut(): Unit = putGate.synchronized {
    activePuts -= 1
    putGate.notifyAll()
  }
  /** Run `f` with puts drained and excluded (the commit window). */
  private def withPutsExcluded[T](f: => T): T = {
    putGate.synchronized {
      commitPending = true
      while (activePuts > 0) putGate.wait()
    }
    try f finally putGate.synchronized {
      commitPending = false
      putGate.notifyAll()
    }
  }

  /** The committed generation set. `gen` is the highest generation
    * number ever allocated (new dirs get gen+1 so names never clash
    * with orphans from a crashed swap). `seqhw` is the write-seq
    * high-water mark as of the commit (-1 = not recorded), so seq
    * recovery never under-reads even if `_seqs` files are lost. `minb`
    * is the retention cutoff: buckets below it are LOGICALLY deleted
    * (filtered out of every read) — outdate commits the cutoff instead
    * of deleting files under in-flight readers; physical reclaim
    * happens at the next compaction and via vacuum. */
  private final case class Pointer(
      gen: Long, rows: String, blocks: Option[String], manifest: Option[String],
      seqhw: Long = -1L, minb: Long = Long.MinValue)

  /** Driver-side manifest pruning state: either the collected index, or
    * a too-big marker (pruning skipped, reads stay correct). */
  private sealed trait ManifestState
  private final case class ManifestLoaded(
      m: Map[(Int, Long), (Array[Byte], Array[Byte])]) extends ManifestState
  private case object ManifestTooBig extends ManifestState

  @volatile private var ptr: Pointer = initPointer()
  @volatile private var manifestCache: Option[ManifestState] = None
  /** High-water mark of claimed write seqs; -1 = not yet initialized. */
  @volatile private var seqHw: Long = -1L

  // ---- pointer (commit) machinery -------------------------------------

  private def initPointer(): Pointer = {
    Files.createDirectories(root)
    Files.createDirectories(seqsDir)
    if (!Files.exists(pointerFile)) {
      val p = Pointer(0L, "r-0", None, None)
      Files.createDirectories(root.resolve(p.rows))
      writePointer(p)
      p
    } else withMutex {
      // Under the mutation lock no compaction is mid-flight, so any
      // unreferenced, un-graveyarded generation dir is a crashed swap's
      // half-written output — roll it back. Graveyarded dirs are
      // superseded-but-retained (lazily-running reader plans may still
      // reference them) and fall to age-based vacuum instead.
      val p = readPointer()
      val live = Set(Some(p.rows), p.blocks, p.manifest).flatten
      val buried = readGraveyard().map(_._1).toSet
      listDir(root)
        .filter { d =>
          val n = d.getFileName.toString
          n.matches("^[rbm]-[0-9]+$") && !live.contains(n) && !buried.contains(n)
        }
        .foreach(deleteRecursively)
      vacuumLocked(opts.graveyardRetentionMs)
      p
    }
  }

  // ---- graveyard (deferred generation deletion) -----------------------
  // Superseded generations are not deleted at commit: an in-flight
  // reader's plan may materialize long after the swap (Spark laziness).
  // They are recorded here with a burial time and physically deleted by
  // vacuum() once older than the retention window — the snapshot-
  // retention discipline of log-structured table formats.

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

  /** Record superseded generation dirs for deferred deletion (caller
    * holds the mutation lock). */
  private def bury(dirs: Seq[String]): Unit = {
    val now = System.currentTimeMillis()
    writeGraveyard(readGraveyard() ++ dirs.map(_ -> now))
  }

  /** Physically delete graveyarded generations older than `olderThanMs`.
    * Readers that might still reference a generation are only safe while
    * retention exceeds their plan's lifetime — the same contract as
    * VACUUM in log-structured table formats. */
  def vacuum(olderThanMs: Long = opts.graveyardRetentionMs): Unit =
    withMutex { vacuumLocked(olderThanMs) }

  private def vacuumLocked(olderThanMs: Long): Unit = {
    val now = System.currentTimeMillis()
    val (dead, live) = readGraveyard()
      .partition { case (_, since) => now - since >= olderThanMs }
    dead.foreach { case (n, _) => deleteRecursively(dirOf(n)) }
    if (dead.nonEmpty || Files.exists(graveyardFile)) writeGraveyard(live)
  }

  private def readPointer(): Pointer = {
    val kv = new String(Files.readAllBytes(pointerFile)).split('\n')
      .map(_.trim).filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    Pointer(kv("gen").toLong, kv("rows"),
      kv.get("blocks").filter(_.nonEmpty), kv.get("manifest").filter(_.nonEmpty),
      kv.get("seqhw").map(_.toLong).getOrElse(-1L),
      kv.get("minb").map(_.toLong).getOrElse(Long.MinValue))
  }

  /** Atomic commit: write a temp file, then rename over `_current`. */
  private def writePointer(p: Pointer): Unit = {
    val body = (Seq(s"gen=${p.gen}", s"rows=${p.rows}") ++
      p.blocks.map(b => s"blocks=$b") ++ p.manifest.map(m => s"manifest=$m") ++
      (if (p.seqhw >= 0L) Seq(s"seqhw=${p.seqhw}") else Nil) ++
      (if (p.minb != Long.MinValue) Seq(s"minb=${p.minb}") else Nil))
      .mkString("", "\n", "\n")
    val tmp = root.resolve("_current.tmp")
    Files.write(tmp, body.getBytes)
    crashHook("pointer:tmp-written")
    Files.move(tmp, pointerFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def commit(p: Pointer): Unit = {
    crashHook("commit:begin")
    // stamp the seq high-water mark into every commit: max over this
    // instance's counter and the `_seqs` ledger (another instance may
    // have minted higher), so a later recovery never mints a stale seq
    val hw = math.max(seqHw, scanSeqFiles())
    val stamped = p.copy(seqhw = math.max(p.seqhw, hw))
    writePointer(stamped)
    crashHook("commit:pointer-durable")
    ptr = stamped
    manifestCache = None
    // Prune the ledger below the stamp (recovery takes max over ledger,
    // stamp, and rick scan, so these files are redundant): unpruned, a
    // long-lived store lists one `_seqs` file per put EVER on every
    // cached point read's epoch check. The top file (== the stamp when
    // it is the max) survives so concurrent minters still see it.
    if (stamped.seqhw > 0L && Files.exists(seqsDir)) {
      listDir(seqsDir)
        .filter(f => scala.util.Try(f.getFileName.toString.toLong)
          .toOption.exists(_ < stamped.seqhw))
        .foreach { f =>
          try Files.deleteIfExists(f): Unit
          catch { case _: java.io.IOException => () }
        }
    }
  }

  /** Re-read the committed pointer if another instance on the same path
    * advanced it (e.g. a second writer's compaction): reads must never
    * serve a generation that has already been swapped out and deleted.
    * Cheap — one tiny driver-side file read per public operation. */
  private def refreshPointer(): Unit = synchronized {
    val onDisk = readPointer()
    if (onDisk != ptr) { ptr = onDisk; manifestCache = None }
  }

  /** First free generation number strictly above the committed one,
    * CLAIMED by atomically creating its r- directory (Files
    * .createDirectory throws if present), so two concurrent compactors
    * can never pick the same generation and overwrite each other's
    * uncommitted output. */
  private def allocGen(cur: Pointer): Long = {
    var g = cur.gen + 1
    while (true) {
      val taken = Seq("r", "b", "m")
        .exists(pfx => Files.exists(root.resolve(s"$pfx-$g")))
      if (!taken) {
        try { Files.createDirectory(root.resolve(s"r-$g")); return g }
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
      g += 1
    }
    throw new IllegalStateException("unreachable")
  }

  private def dirOf(name: String): Path = root.resolve(name)
  private def rowsPath: String = dirOf(ptr.rows).toString
  private[graft] def hasRickRows: Boolean = { refreshPointer(); hasRows }
  /** Parquet files currently in one rick (shard, bucket) partition —
    * the observable effect of [[StoreOptions.putWritersPerPartition]]. */
  private[graft] def rickFileCount(shard: Int, bucket: Long): Int = {
    refreshPointer()
    val dir = dirOf(ptr.rows).resolve(s"shard=$shard").resolve(s"bucket=$bucket")
    if (!Files.exists(dir)) 0
    else listDir(dir).count(_.getFileName.toString.endsWith(".parquet"))
  }
  private[graft] def hasBlockLayer: Boolean = { refreshPointer(); hasBlocks }
  private[graft] def hasManifestLayer: Boolean = { refreshPointer(); ptr.manifest.isDefined }

  // ---- write sequence (LWW total order) -------------------------------

  /** Highest seq claimed in `_seqs` (0 when none). */
  private def scanSeqFiles(): Long = {
    if (!Files.exists(seqsDir)) { Files.createDirectories(seqsDir); return 0L }
    listDir(seqsDir)
      .flatMap(p => scala.util.Try(p.getFileName.toString.toLong).toOption)
      .foldLeft(0L)(math.max)
  }

  /** Mint the next write sequence. Each seq is claimed by atomically
    * creating `_seqs/<n>` — safe across store INSTANCES on the same
    * path (e.g. a streamingPut sink plus a batch writer), unlike a
    * read-modify-write of one counter file, and crash-safe (a crash
    * merely skips a number). If `_seqs` was lost, the high-water mark
    * is recovered by scanning existing data for max(seq). */
  private def nextSeq(): Long = synchronized {
    if (seqHw < 0L) {
      // recovery takes the MAX over every surviving record of the high
      // water: the `_seqs` ledger, the pointer-stamped mark from the
      // last commit, and the rick layer's own max(seq). The rick scan
      // is what survives PARTIAL ledger loss (top files gone, lower
      // ones intact, no commit since): those seqs live only in rick
      // rows, and reminting one would let an old batch beat a newer
      // write at LWW. Blocks never need scanning — every commit stamps
      // seqhw at or above everything it absorbed. Cost: one max() over
      // the rick parquet, once per instance, at its first mint.
      val fromFiles = scanSeqFiles()
      val fromPtr = math.max(ptr.seqhw, 0L)
      val fromRick =
        if (!hasRows) 0L
        else {
          val r = spark.read.parquet(rowsPath).agg(max("seq")).head()
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
      seqHw = math.max(math.max(fromFiles, fromPtr), fromRick)
    }
    // Another instance may have minted and COMMITTED seqs above our
    // cached counter, then pruned the `_seqs` ledger below its stamp —
    // leaving no file to collide with. Re-read the committed pointer
    // and seed from its seqhw stamp too: any pruned seq is <= the
    // stamp, so this restores the no-duplicate-mint invariant for
    // multi-instance writers.
    refreshPointer()
    var hw = math.max(seqHw, math.max(ptr.seqhw, 0L))
    while (true) {
      val cand = hw + 1
      try {
        Files.createFile(seqsDir.resolve(cand.toString))
        seqHw = cand
        return cand
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          hw = math.max(scanSeqFiles(), cand) // another instance won the race
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-(shard, bucket) min/max key manifest for the block layer — the
    * reference's sstable index block (src/file/sstable.rs
    * IndexBlockBuilder): point reads consult it driver-side and skip
    * block partitions that cannot contain the key. */
  private def manifest: ManifestState = {
    manifestCache.getOrElse {
      val p0 = ptr // snapshot: a compaction can commit while we load
      val m: ManifestState = p0.manifest match {
        case None => ManifestLoaded(Map.empty)
        case Some(name) =>
          // size guard: an unbounded collect of a huge manifest would
          // not be driver-bounded; give up the collected map instead of
          // crashing. ONE scan: collect limit+1 rows and check the
          // overflow row, rather than a count() pass followed by a
          // collect() pass.
          val lim = math.min(opts.manifestPruneMaxEntries, Int.MaxValue - 2L).toInt
          val rows = spark.read.parquet(dirOf(name).toString)
            .limit(lim + 1).collect()
          if (rows.length > lim) ManifestTooBig
          else ManifestLoaded(rows.map { r =>
            (r.getAs[Number]("shard").intValue(), r.getAs[Number]("bucket").longValue()) ->
              ((r.getAs[Array[Byte]]("min_key"), r.getAs[Array[Byte]]("max_key")))
          }.toMap)
      }
      // only cache if the pointer didn't move during the load: a stale
      // manifest cached over a newer commit would prove FALSE absence
      // for keys the new generation holds (missed reads)
      if (ptr eq p0) manifestCache = Some(m)
      m
    }
  }

  /** Membership predicate for a batch of (shard, bucket) pairs with
    * BOUNDED expression depth: an OR-fold over the pairs builds a
    * Catalyst tree as deep as the batch, which plans slowly and can
    * overflow the stack on a large multiGet. Packing the pair into one
    * string and testing isInCollection keeps the tree depth constant
    * (Catalyst converts a large IN to a hash-set InSet), and because
    * the expression references only the two prune columns, partition
    * pruning still evaluates it exactly per partition.
    *
    * The packed expression is NOT source-translatable, so on a scan
    * where shard/bucket are DATA columns (the oversized-manifest probe
    * — the one consumer this path exists for at cluster scale) it
    * alone would forfeit parquet row-group stats skipping. The coarse
    * single-column IN terms below ARE pushable; ANDing them in keeps
    * pushdown on that scan (a false positive there only admits a row
    * group the exact packed term then drops) while partition-column
    * consumers are unaffected. */
  private def pairPredicate(pairs: Seq[(Long, Long)]): Column =
    if (pairs.isEmpty) lit(false)
    else col("shard").isInCollection(pairs.map(_._1).distinct) &&
      col("bucket").isInCollection(pairs.map(_._2).distinct) &&
      concat_ws(":", col("shard").cast("string"), col("bucket").cast("string"))
        .isInCollection(pairs.map { case (s, b) => s"$s:$b" })

  /** Batch form of [[blockMayContain]]: true when the block layer might
    * hold ANY of the probes. With a collected manifest this is the
    * in-memory check per probe; in ManifestTooBig mode it is ONE
    * filtered scan over the batch's (shard, bucket) pairs — never a
    * scan per probe, which would reintroduce the job-per-key cost
    * multiGet exists to amortize. */
  private def blockMayContainAny(probes: Seq[(Long, Long, Array[Byte])]): Boolean = {
    if (!hasBlocks) return false
    if (ptr.manifest.isEmpty) return true // no manifest: can't prune
    manifest match {
      case ManifestLoaded(_) =>
        probes.exists(p => blockMayContain(p._1, p._2, p._3))
      case ManifestTooBig =>
        val pairs = probes.map(p => (p._1, p._2)).distinct
        val ranges = spark.read.parquet(dirOf(ptr.manifest.get).toString)
          .filter(pairPredicate(pairs))
          .select("shard", "bucket", "min_key", "max_key")
          .collect() // bounded by the batch's distinct pair count
          .map(r => (r.getAs[Number]("shard").longValue(),
            r.getAs[Number]("bucket").longValue()) ->
            ((r.getAs[Array[Byte]]("min_key"), r.getAs[Array[Byte]]("max_key"))))
          .toMap
        probes.exists { case (s, b, k) =>
          ranges.get((s, b)).exists { case (lo, hi) =>
            java.util.Arrays.compareUnsigned(k, lo) >= 0 &&
              java.util.Arrays.compareUnsigned(k, hi) <= 0
          }
        }
    }
  }

  /** True when the block layer might hold `key` in (shard, bucket) —
    * false only on manifest proof of absence. */
  private def blockMayContain(shard: Long, bucket: Long, key: Array[Byte]): Boolean = {
    if (!hasBlocks) return false
    if (ptr.manifest.isEmpty) return true // no manifest: can't prune
    manifest match {
      // Too big to collect: probe the ONE (shard, bucket) manifest row
      // through a filtered scan instead — parquet stats prune the read,
      // the result is a single row, and proof of absence survives at
      // any manifest size (the cluster-scale path; the collected map
      // below is the cheap small-store path).
      case ManifestTooBig =>
        spark.read.parquet(dirOf(ptr.manifest.get).toString)
          .filter(col("shard") === shard && col("bucket") === bucket)
          .select("min_key", "max_key")
          .take(1).headOption match {
          case None => false // manifest is complete: partition absent = no data
          case Some(r) =>
            java.util.Arrays.compareUnsigned(key, r.getAs[Array[Byte]]("min_key")) >= 0 &&
              java.util.Arrays.compareUnsigned(key, r.getAs[Array[Byte]]("max_key")) <= 0
        }
      case ManifestLoaded(m) => m.get((shard.toInt, bucket)) match {
        case None => false // manifest is complete: partition absent = no data
        case Some((lo, hi)) =>
          java.util.Arrays.compareUnsigned(key, lo) >= 0 &&
            java.util.Arrays.compareUnsigned(key, hi) <= 0
      }
    }
  }

  /** List a directory with the stream closed (Files.list leaks an fd
    * per call otherwise — hasData runs on every read). */
  private def listDir(p: Path): List[Path] = {
    val st = Files.list(p)
    try st.iterator().asScala.toList finally st.close()
  }

  /** True when at least one (shard, bucket) partition actually exists —
    * outdate can leave empty shard dirs behind, which must not count. */
  private def hasDataDirs(r: Path): Boolean =
    Files.exists(r) && listDir(r).exists { d =>
      d.getFileName.toString.startsWith("shard=") &&
        listDir(d).exists(_.getFileName.toString.startsWith("bucket="))
    }
  private def hasRows: Boolean = hasDataDirs(dirOf(ptr.rows))
  private def hasBlocks: Boolean = ptr.blocks.exists(b => hasDataDirs(dirOf(b)))
  private def hasData: Boolean = hasRows || hasBlocks

  private def emptyEntriesWithMeta: DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("key", BinaryType), StructField("ts", LongType),
        StructField("value", BinaryType), StructField("seq", LongType),
        StructField("subseq", LongType),
        StructField("shard", IntegerType), StructField("bucket", LongType))))
  }

  /** Every raw entry (pre-LWW) from both layers: rick rows + decompressed
    * blocks, all carrying (key, ts, value, seq, shard, bucket). The
    * `decompress` flag mirrors the reference ReadOption: when false the
    * block layer is skipped (reference: src/option.rs:131). */
  private def rawEntries(decompress: Boolean = true,
      rowFilesSnapshot: Option[Seq[Path]] = None,
      partitionPrune: Option[Seq[(Long, Long)]] = None,
      reader: SparkSession = spark,
      pruneKey: Option[(Array[Byte], Array[Byte])] = None,
      pruneTsLt: Option[Long] = None,
      pruneTsGe: Option[Long] = None,
      pruneBucket: Option[(Long, Long)] = None): DataFrame = {
    val cols = Seq("key", "ts", "value", "seq", "subseq", "shard", "bucket")
    // Range pruning BEFORE the block-decode flatMap (r20, reference
    // analogue: SSTable block-meta pruning): Catalyst cannot push a
    // predicate through the typed flatMap, so without these a key- or
    // time-ranged scan decodes EVERY bucket-pruned block and discards
    // most entries after the fact — and orderBy's range-partitioner
    // sampling pass pays that decode a second time. A block holds one
    // key with ascending timestamps from t0 to t1, so [k0, k1) applies
    // to blocks exactly, `t0 < hi` is a sound upper prune (every entry
    // of a t0 ≥ hi block is ≥ hi) and `t1 ≥ lo` a sound lower prune
    // (every entry of a t1 < lo block is < lo). The rick side carries
    // raw entry rows, so the predicates push to its parquet scan as-is.
    // Sound
    // under the LWW window too: it partitions by (…, key, ts), and
    // pruning never removes a row of a surviving (key, ts) group.
    // `bucket` is a partition column on BOTH layers, but scan()'s
    // bucket-range filter cannot push through the flatMap — applied
    // here it prunes at the file index instead of decoding every
    // bucket and discarding.
    val bucketPred = pruneBucket.map { case (b0, b1) =>
      col("bucket").between(b0, b1) }.getOrElse(lit(true))
    def pruneRows(df: DataFrame): DataFrame = {
      val k = pruneKey.map { case (k0, k1) =>
        col("key") >= lit(k0) && col("key") < lit(k1) }.getOrElse(lit(true))
      val t = pruneTsLt.map(hi => col("ts") < hi).getOrElse(lit(true))
      val g = pruneTsGe.map(lo => col("ts") >= lo).getOrElse(lit(true))
      df.filter(k && t && g && bucketPred)
    }
    def pruneBlocks(df: DataFrame): DataFrame = {
      val k = pruneKey.map { case (k0, k1) =>
        col("key") >= lit(k0) && col("key") < lit(k1) }.getOrElse(lit(true))
      val t = pruneTsLt.map(hi => col("t0") < hi).getOrElse(lit(true))
      val g = pruneTsGe.map(lo => col("t1") >= lo).getOrElse(lit(true))
      df.filter(k && t && g && bucketPred)
    }
    // (shard, bucket) pruning must land ON THE PARQUET SCANS, before
    // the block-decompress flatMap: Catalyst cannot push a predicate
    // through a typed flatMap, so filtering afterwards would decode
    // EVERY block in the store for one point read. The packed-pair IN
    // predicate prunes partitions exactly (both columns are partition
    // columns and the expression references only them, so the file
    // index evaluates it per partition); multiGet passes the batch's
    // distinct pairs.
    def prune(df: DataFrame): DataFrame = partitionPrune match {
      case Some(pairs) => df.filter(pairPredicate(pairs))
      case None => df
    }
    val rows = rowFilesSnapshot match {
      // explicit file snapshot (compaction): read exactly these files so
      // concurrently-appended entries are excluded (they move to the new
      // generation at commit instead)
      case Some(files) =>
        if (files.isEmpty) None
        else Some(pruneRows(prune(reader.read.option("basePath", rowsPath)
          .parquet(files.map(_.toString): _*))).select(cols.map(col): _*))
      case None =>
        if (hasRows)
          Some(pruneRows(prune(reader.read.parquet(rowsPath))).select(cols.map(col): _*))
        else None
    }
    val blocks =
      if (decompress && hasBlocks) {
        import spark.implicits._
        // local vals only inside the closure: the task must never
        // capture the store instance (SparkSession isn't serializable)
        val codecsByName = opts.codecs
        // block entries are already LWW winners; their in-block position
        // serves as the subseq tiebreak
        Some(pruneBlocks(prune(reader.read.parquet(dirOf(ptr.blocks.get).toString)))
          .as[HelixStore.BinBlock]
          .flatMap { b =>
            val codec = codecsByName.getOrElse(b.codec, throw new IllegalArgumentException(
              s"block encoded with unregistered codec '${b.codec}' " +
                s"(registered: ${codecsByName.keys.mkString(", ")})"))
            val vals = codec.decode(b.payload)
            var t = b.t0
            (0 until b.deltas.length).iterator.map { i =>
              t += b.deltas(i)
              (b.key, t, vals(i), b.seqs(i), i.toLong, b.shard, b.bucket)
            }
          }.toDF(cols: _*))
      } else None
    val all = (rows ++ blocks).reduceOption(_.unionByName(_))
      .getOrElse(emptyEntriesWithMeta)
    // retention is LOGICAL: buckets below the committed cutoff are
    // invisible even while their files await vacuum (bucket is a
    // partition column, so this prunes rather than scans)
    if (ptr.minb == Long.MinValue) all else all.filter(col("bucket") >= ptr.minb)
  }

  /** Shard routing expression: custom ShardingKeyFn when registered. */
  private def shardExpr(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    opts.shardingFn match {
      case Some(f) => f(key).cast("int")
      case None => pmod(xxhash64(key), lit(opts.numShards)).cast("int")
    }

  /** Append a batch of entries (columns: key BINARY, ts LONG, value
    * BINARY). Routing = shard/bucket partition columns; one shuffle-free
    * partitioned write. Synchronized with compactions so a batch can't
    * land in a rows generation that is being swapped out.
    *
    * Within-batch (key, ts) ties: a DataFrame carries no defined row
    * order (partition assignment, AQE, and task retries all reorder),
    * so the reference's "later entry in the batch wins" is not
    * expressible here. The contract instead is DETERMINISTIC-ARBITRARY:
    * the row with the greatest (xxhash64(key, ts, value), value-bytes)
    * wins, the same winner on every run and every retry — residual
    * xxhash64 collisions between DISTINCT values break on the value
    * bytes themselves, so the contract is collision-proof. Callers that
    * need a specific winner must resolve ties before put() (one row per
    * (key, ts)) or split them across puts, whose seq order is total. */
  def put(entries: DataFrame): Unit =
    putWithShard(entries, shardExpr(col("key")))

  /** Shard-addressed write bypassing the sharding function — the
    * reference's `direct_put` (src/db.rs:49): every entry in the batch
    * lands in `shard`, whatever its key hashes to. Reads must then use
    * [[directGet]] with the same shard. */
  def directPut(shard: Int, entries: DataFrame): Unit = {
    require(shard >= 0 && shard < opts.numShards,
      s"shard $shard outside [0, ${opts.numShards})")
    putWithShard(entries, lit(shard).cast("int"))
  }

  private def putWithShard(entries: DataFrame,
      shardCol: org.apache.spark.sql.Column): Unit = withMutex {
    // mutex: excludes other PROCESSES' compaction swaps (reentrant under
    // this instance's own background compaction); putGate: excludes only
    // the brief commit window, during which the target rick generation
    // flips. The rowsPath must be resolved after both.
    beginPut()
    try {
      refreshPointer()
      val seq = nextSeq()
      val routed = entries
        .withColumn("shard", shardCol)
        .withColumn("bucket", expr(s"ts div ${opts.bucketSize}"))
        .withColumn("seq", lit(seq))
        // within-batch tiebreak: duplicate (key, ts) rows in ONE put would
        // otherwise tie on seq and resolve LWW nondeterministically (the
        // reference's rick append offset makes the later entry win). The
        // tiebreak hashes ROW CONTENT, not assignment order: an order-
        // dependent value (monotonically_increasing_id) could flip the
        // winner when a retried task recomputes a nondeterministic
        // source. Content-hash order is arbitrary but stable across
        // retries; rows identical in (key, ts, value) tie harmlessly.
        .withColumn("subseq", xxhash64(col("key"), col("ts"), col("value")))
      // Cluster rows by target partition before the write: without this,
      // EVERY input task emits a file into every (shard, bucket) it
      // happens to hold — the classic small-files explosion at scale.
      // putWritersPerPartition > 1 salts the clustering so a hot
      // partition's rows spread over up to that many writer tasks.
      val arranged = opts.putWritersPerPartition match {
        case 0 => routed
        case 1 => routed.repartition(col("shard"), col("bucket"))
        // Explicit partition count: the user sized the fan-out, so AQE
        // must not coalesce it away. Files per (shard, bucket) stay <= n
        // whatever the total count — salt has only n values per partition.
        // The salt hashes DETERMINISTIC columns: a retry-recomputed salt
        // (e.g. from monotonically_increasing_id) would reroute rows
        // between attempts and lose/duplicate them mid-shuffle.
        case n => routed.repartition(opts.numShards * n,
          col("shard"), col("bucket"),
          pmod(xxhash64(col("key"), col("ts")), lit(n.toLong)))
      }
      arranged.write.mode("append")
        .partitionBy("shard", "bucket")
        .parquet(rowsPath)
    } finally endPut()
  }

  /** All live entries (latest write wins per (key, ts)). */
  def toDF: DataFrame = toDFWithPartitions().select(EntryColumns.map(col): _*)

  /** Register the store as a temp view so plain `spark.sql` can query
    * it. The view is a SNAPSHOT: it pins the generation set and file
    * listing at registration (Spark caches the file index inside the
    * plan), so re-register after writes/compactions to see them —
    * the same REFRESH discipline as an external parquet table. */
  def createOrReplaceTempView(name: String): Unit =
    toDF.createOrReplaceTempView(name)

  /** Exact-timestamp point get (reference: src/db.rs:54). Prunes to one
    * shard + one bucket partition before touching any row group. */
  def get(key: Array[Byte], ts: Long, decompress: Boolean = true): Option[Array[Byte]] = {
    refreshPointer()
    if (!hasData) return None
    getInShard(routeShards(Seq(key)).head, key, ts, decompress)
  }

  /** Driver-side shard routing for a key batch. Default route: same
    * function Spark's xxhash64(col) computes in put() (seed 42),
    * evaluated driver-side — no job just to route a read. A custom
    * ShardingKeyFn is an arbitrary Column expression, so it's evaluated
    * through ONE small frame for the whole batch instead. */
  private def routeShards(keys: Seq[Array[Byte]]): Seq[Long] =
    opts.shardingFn match {
      case None => keys.map { key =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          key, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, key.length, 42L)
        ((h % opts.numShards) + opts.numShards) % opts.numShards
      }
      case Some(_) =>
        import spark.implicits._
        val byKey = keys.zipWithIndex.map { case (k, i) => (i, k) }
          .toDF("i", "key")
          .select(col("i"), shardExpr(col("key")).as("s"))
          .collect().map(r => r.getInt(0) -> r.getInt(1).toLong).toMap
        keys.indices.map(byKey)
    }

  /** BATCHED exact-timestamp point get — the reference client's get
    * loop amortized Spark-first: all probes route driver-side, the
    * union of touched (shard, bucket) partitions is pruned in ONE job
    * (never one job per key, the scale failure of looping [[get]]),
    * LWW resolves per (key, ts), and a broadcast join against the
    * probe set cuts the scan to exact hits. The batch-level manifest
    * check skips the block layer entirely when no probe's
    * (shard, bucket, key) can be present (per-key manifest pruning is
    * [[get]]'s job; a batch only needs the union decision). Results
    * align with the probe order; misses are None. */
  def multiGet(probes: Seq[(Array[Byte], Long)],
      decompress: Boolean = true): Seq[Option[Array[Byte]]] = {
    refreshPointer()
    if (probes.isEmpty) return Seq.empty
    if (!hasData) return probes.map(_ => None)
    val shards = routeShards(probes.map(_._1))
    val routed = probes.zip(shards).map { case ((k, ts), sh) =>
      (k, ts, sh, ts / opts.bucketSize)
    }
    // logical retention, as in getInShardUncached
    val live = routed.filter(_._4 >= ptr.minb)
    if (live.isEmpty) return probes.map(_ => None)
    val pairs = live.map(p => (p._3, p._4)).distinct
    val useBlocks = decompress &&
      blockMayContainAny(live.map(p => (p._3, p._4, p._1)))
    val src = rawEntries(useBlocks, partitionPrune = Some(pairs))
    // LWW only when the rick layer can contribute a duplicate (post-
    // compaction block entries are already unique per (key, ts) — the
    // toDFWithPartitions fast path)
    val resolved =
      if (!hasRows) src
      else {
        val w = Window.partitionBy("shard", "bucket", "key", "ts")
          .orderBy(col("seq").desc, col("subseq").desc, col("value").desc)
        src.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      }
    import spark.implicits._
    // the probe join carries the ROUTED shard: without it, an entry
    // written via directPut into a shard another probe pulled into the
    // pruned scan could satisfy a key routed elsewhere — get() would
    // miss it (the documented directPut/directGet contract), so the
    // batch must too, and a probe's result must never depend on which
    // other probes share its batch
    val probeDf = live.map(p => (p._1, p._2, p._3))
      .toDF("pk", "pts", "pshard")
    val hits = resolved
      .join(broadcast(probeDf),
        col("key") === col("pk") && col("ts") === col("pts") &&
          col("shard") === col("pshard"))
      .select("key", "ts", "value").collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getLong(1)) ->
        r.getAs[Array[Byte]](2)).toMap
    probes.map { case (k, ts) => hits.get((k.toSeq, ts)) }
  }

  /** Shard-addressed point get bypassing the sharding function — the
    * reference's `direct_get` (src/db.rs:57): reads exactly the named
    * shard, pairing with [[directPut]]. */
  def directGet(shard: Int, key: Array[Byte], ts: Long,
      decompress: Boolean = true): Option[Array[Byte]] = {
    require(shard >= 0 && shard < opts.numShards,
      s"shard $shard outside [0, ${opts.numShards})")
    refreshPointer()
    if (!hasData) return None
    getInShard(shard.toLong, key, ts, decompress)
  }

  // ---- KV point-read cache (reference cache.rs kv_cache analogue) -----
  // An exact-timestamp get costs a full Spark job; repeated point reads
  // are the reference's kv_cache sweet spot. Invalidation epoch =
  // (committed pointer, max minted write-seq): every mutation moves one
  // of the two — put/directPut mint a seq file, compact/blockCompact/
  // outdate commit the pointer — including mutations by OTHER instances,
  // so a hit can never serve a superseded value. Both epoch components
  // are driver-side metadata reads (`_current` is re-read by
  // refreshPointer already; `_seqs` is one dir listing).

  private final case class KvKey(shard: Long, key: Seq[Byte], ts: Long,
      decompress: Boolean)
  private val kvCache =
    new java.util.LinkedHashMap[KvKey, Option[Array[Byte]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[KvKey, Option[Array[Byte]]]): Boolean =
        size() > opts.kvCacheSize
    }
  private var kvEpoch: (Pointer, Long) = null

  private def getInShard(shard: Long, key: Array[Byte], ts: Long,
      decompress: Boolean): Option[Array[Byte]] = {
    if (opts.kvCacheSize <= 0) return getInShardUncached(shard, key, ts, decompress)
    val epoch = (ptr, scanSeqFiles())
    val k = KvKey(shard, key.toSeq, ts, decompress)
    kvCache.synchronized {
      if (kvEpoch != epoch) { kvCache.clear(); kvEpoch = epoch }
      val hit = kvCache.get(k)
      if (hit != null) return hit
    }
    val v = getInShardUncached(shard, key, ts, decompress)
    kvCache.synchronized {
      // drop the result if the store moved while the job ran; an
      // oversized value is served but never cached (reference
      // kv_cache_threshold, cache.rs:104)
      if (kvEpoch == epoch &&
          v.map(_.length.toLong).getOrElse(0L) < opts.kvCacheThresholdBytes)
        kvCache.put(k, v): Unit
    }
    v
  }

  private def getInShardUncached(shard: Long, key: Array[Byte], ts: Long,
      decompress: Boolean): Option[Array[Byte]] = {
    // Spark SQL `div` truncates toward zero; use the same semantics here
    // (floorDiv would floor, routing negative logical timestamps to a
    // different bucket than put() wrote)
    val bucket = ts / opts.bucketSize
    // logical retention: an outdated bucket is invisible in BOTH layers
    // (rawEntries applies the same cutoff; short-circuit saves the probe)
    if (bucket < ptr.minb) return None
    // manifest-proven absence in the block layer → read only rick rows
    val useBlocks = decompress && blockMayContain(shard, bucket, key)
    if (useBlocks && opts.kcCacheSize > 0) {
      // kc path: blocks from the compressed-block cache (decoded driver-
      // side), rick rows from a Spark probe that skips the block layer;
      // LWW-merge the two candidates with the same (seq, subseq, value)
      // ordering the unioned path sorts by.
      val blockHit = blockPointLookup(kcGet(shard, bucket, key), ts)
      val rickHit = rawEntries(decompress = false,
          partitionPrune = Some(Seq((shard, bucket))))
        .filter(col("key") === lit(key) && col("ts") === ts)
        .orderBy(col("seq").desc, col("subseq").desc, col("value").desc)
        .select("seq", "subseq", "value")
        .take(1).headOption
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2)))
      (blockHit ++ rickHit)
        .reduceOption((a, b) => if (cmpLww(a, b) >= 0) a else b)
        .map(_._3)
    } else {
      // (shard, bucket) prune INSIDE rawEntries so it reaches the parquet
      // scans below the block-decompress flatMap
      val rows = rawEntries(useBlocks, partitionPrune = Some(Seq((shard, bucket))))
        .filter(col("key") === lit(key) && col("ts") === ts)
        .orderBy(col("seq").desc, col("subseq").desc, col("value").desc)
        .select("value")
        .take(1)
      rows.headOption.map(_.getAs[Array[Byte]](0))
    }
  }

  // ---- KC compressed-block cache (reference cache.rs kc_cache) --------
  // (shard, bucket, key) → that key's undecoded blocks in the committed
  // block layer. Valid for the lifetime of one committed pointer: puts
  // mint seqs but never touch blocks, so only compact/outdate/vacuum
  // (pointer commits) invalidate — strictly fewer invalidations than the
  // kv epoch. Entries are whole compressed blocks, decoded on each hit
  // (the reference's kc cache holds compressed bytes too).

  private final case class KcKey(shard: Long, bucket: Long, key: Seq[Byte])
  private val kcCache =
    new java.util.LinkedHashMap[KcKey, Seq[BinBlock]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[KcKey, Seq[BinBlock]]): Boolean =
        size() > opts.kcCacheSize
    }
  private var kcPtr: Pointer = null
  /** kc-cache hits (test observability). */
  val kcHits = new java.util.concurrent.atomic.AtomicLong(0)

  private def kcGet(shard: Long, bucket: Long, key: Array[Byte]): Seq[BinBlock] = {
    val p = ptr
    val k = KcKey(shard, bucket, key.toSeq)
    kcCache.synchronized {
      if (kcPtr != p) { kcCache.clear(); kcPtr = p }
      val hit = kcCache.get(k)
      if (hit != null) { kcHits.incrementAndGet(); return hit }
    }
    import spark.implicits._
    // `p` was captured after the caller's blockMayContain check; a
    // concurrent pointer commit to a generation WITHOUT a block layer
    // can land in that window. No blocks in this snapshot = no block
    // candidates — same graceful degradation as the uncached path
    // (rawEntries re-checks hasBlocks), not an exception.
    val v = p.blocks match {
      case None => Seq.empty[BinBlock]
      case Some(g) =>
        spark.read.parquet(dirOf(g).toString)
          .filter(col("shard") === shard && col("bucket") === bucket &&
            col("key") === lit(key))
          .as[BinBlock].collect().toSeq
    }
    kcCache.synchronized {
      // drop the result if a compaction committed while the probe ran;
      // an oversized entry is served but never cached (reference
      // kc_cache_threshold, cache.rs:25)
      if (kcPtr == p && kcEntryBytes(v) < opts.kcCacheThresholdBytes)
        kcCache.put(k, v): Unit
    }
    v
  }

  /** Heap footprint of one kc entry: payloads + the two long arrays +
    * the key bytes, per block. */
  private def kcEntryBytes(v: Seq[BinBlock]): Long =
    v.foldLeft(0L)((acc, b) => acc + b.payload.length + b.key.length +
      8L * (b.deltas.length + b.seqs.length))

  /** Best (seq, subseq, value) for an exact-ts match across a key's
    * cached blocks. Walks the delta-encoded timestamps first and decodes
    * a block's payload only when it actually contains `ts`. */
  private def blockPointLookup(blocks: Seq[BinBlock],
      ts: Long): Option[(Long, Long, Array[Byte])] = {
    var best: (Long, Long, Array[Byte]) = null
    blocks.foreach { b =>
      var vals: Seq[Array[Byte]] = null
      var t = b.t0
      var i = 0
      while (i < b.deltas.length) {
        t += b.deltas(i)
        if (t == ts) {
          if (vals == null) {
            val codec = opts.codecs.getOrElse(b.codec,
              throw new IllegalArgumentException(
                s"block encoded with unregistered codec '${b.codec}' " +
                  s"(registered: ${opts.codecs.keys.mkString(", ")})"))
            vals = codec.decode(b.payload)
          }
          // in-block position is the subseq tiebreak, as in rawEntries
          val cand = (b.seqs(i), i.toLong, vals(i))
          if (best == null || cmpLww(cand, best) > 0) best = cand
        }
        i += 1
      }
    }
    Option(best)
  }

  /** The LWW ordering the Spark point-read path sorts by — (seq desc,
    * subseq desc, value desc) — as a driver-side comparator. */
  private def cmpLww(a: (Long, Long, Array[Byte]),
      b: (Long, Long, Array[Byte])): Int = {
    val c1 = java.lang.Long.compare(a._1, b._1)
    if (c1 != 0) return c1
    val c2 = java.lang.Long.compare(a._2, b._2)
    if (c2 != 0) return c2
    BytesOrdering.compare(a._3, b._3)
  }

  /** Time-range × key-range scan, globally ordered by (key, ts) —
    * the reference's mux-merged iterator (src/db.rs:67, iterator.rs),
    * expressed as a range-partitioned sort. Bounds follow the reference
    * TimeRange semantics: [start, end) on ts, [low, high) on key.
    *
    * User-defined ordering — the reference's `Comparator` trait
    * (src/util.rs:21; LexicalComparator and NoOrderComparator are the
    * two it ships) re-expressed Spark-first: instead of a pairwise
    * cmp callback (which would force every comparison through a
    * non-codegen UDF), [[ScanOptions.comparator]] supplies the SORT
    * KEY as a Column transform of the entry key, and the scan sorts by
    * (sortKey, key, ts) — any deterministic expression, evaluated
    * inside whole-stage codegen, with the lexical (key, ts) fallback
    * keeping the order total under sort-key ties. comparator=None +
    * ordered=true is LexicalComparator; ordered=false is
    * NoOrderComparator (a comparator is meaningless there and is
    * rejected loudly rather than silently ignored). */
  def scan(tsRange: (Long, Long), keyRange: (Array[Byte], Array[Byte]),
      ordered: Boolean = true,
      scanOpts: ScanOptions = ScanOptions()): DataFrame = {
    require(ordered || scanOpts.comparator.isEmpty,
      "comparator requires ordered=true (ordered=false IS the NoOrderComparator scan)")
    refreshPointer()
    if (!hasData) return toDF // empty frame with the entry schema
    val (t0, t1) = tsRange
    val (k0, k1) = keyRange
    // truncating division matches put()'s `ts div bucketSize` and is
    // monotone, so [bucket(t0), bucket(t1-1)] covers the range exactly
    val b0 = t0 / opts.bucketSize
    val b1 = (t1 - 1) / opts.bucketSize
    // per-scan split sizing (ScanOption.prefetch_buf_size analogue):
    // the parquet relations must be BUILT under a session carrying the
    // override — split planning reads the conf of the session that
    // created the relation, so a clone scopes it to this scan only
    val reader = scanOpts.maxPartitionBytes match {
      case Some(b) =>
        val s = spark.newSession()
        // newSession starts from the CONTEXT conf only — copy the
        // parent's runtime conf first (shuffle partitions, timezone,
        // AQE toggles set via spark.conf.set after startup), so the
        // clone differs from every other read in exactly one knob.
        // Static/immutable entries refuse the set; skip them.
        spark.conf.getAll.foreach { case (k, v) =>
          try s.conf.set(k, v) catch { case _: Exception => () }
        }
        s.conf.set("spark.sql.files.maxPartitionBytes", b.toString)
        s
      case None => spark
    }
    // key range + BOTH ts bounds also prune BELOW the block-decode
    // flatMap (see rawEntries: t0 < hi on the block start, t1 >= lo on
    // the block max written at compaction) — the per-entry filters
    // here stay for the entries a surviving block carries outside the
    // range
    val filtered = toDFWithPartitions(reader,
        pruneKey = Some((k0, k1)), pruneTsLt = Some(t1),
        pruneTsGe = Some(t0), pruneBucket = Some((b0, b1)))
      .filter(col("bucket").between(b0, b1))
      .filter(col("ts") >= t0 && col("ts") < t1)
      .filter(col("key") >= lit(k0) && col("key") < lit(k1))
      .select(EntryColumns.map(col): _*)
    // ordered=false is the reference's NoOrderComparator scan (util.rs):
    // skip the global sort when the consumer doesn't need key order.
    // A user comparator prepends its sort-key expression; (key, ts)
    // stays as the tiebreak so the order is total either way.
    val sortCols = scanOpts.comparator match {
      case Some(sortKeyOf) => Seq(sortKeyOf(col("key")), col("key"), col("ts"))
      case None => Seq(col("key"), col("ts"))
    }
    (ordered, scanOpts.targetPartitions) match {
      case (true, 0) => filtered.orderBy(sortCols: _*)
      // explicit parallelism, order preserved: range-partition on the
      // sort key into exactly n partitions, then sort within each —
      // the same physical shape orderBy plans, with the count pinned
      case (true, n) => filtered
        .repartitionByRange(n, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
      case (false, 0) => filtered
      case (false, n) => filtered.repartition(n)
    }
  }

  /** Continuous ingestion: attach a streaming entries source (key BINARY,
    * ts LONG, value BINARY) and route every micro-batch through put() —
    * the reference's always-on write path (io_worker.rs) as a
    * foreachBatch sink. Caller manages the returned query's lifecycle. */
  def streamingPut(entries: DataFrame,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    entries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => put(batch) }
      .start()

  private def toDFWithPartitions(reader: SparkSession = spark,
      pruneKey: Option[(Array[Byte], Array[Byte])] = None,
      pruneTsLt: Option[Long] = None,
      pruneTsGe: Option[Long] = None,
      pruneBucket: Option[(Long, Long)] = None): DataFrame = {
    refreshPointer()
    // Post-compaction fast path: with the rick empty, the block layer is
    // the only source and blockCompact already resolved LWW per
    // (key, ts) — same key → same shard, same ts → same bucket, so
    // uniqueness is global. Skipping the rank window removes a full
    // shuffle from every read of a compacted store (the common state —
    // at 100 TB the read-amplification win is the whole point of
    // compacting).
    if (!hasRows && hasBlocks)
      rawEntries(reader = reader, pruneKey = pruneKey, pruneTsLt = pruneTsLt,
        pruneTsGe = pruneTsGe, pruneBucket = pruneBucket)
    else {
      // LWW scoped per shard (like the reference, whose shards are
      // independent trees): for routed writes key determines shard so
      // this equals a global (key, ts) rank, and for shard-addressed
      // directPut data each shard keeps its own winner — exactly what
      // the compacted fast path above yields, so both paths agree.
      // `bucket` is redundant in the keys (a pure function of ts) but
      // REQUIRED for pruning: scan()'s bucket-range filter can only
      // push below the window when bucket is a partition column, and
      // without it a time-range scan would shuffle the entire store
      // for the rank before cutting the range.
      val w = Window.partitionBy("shard", "bucket", "key", "ts")
        .orderBy(col("seq").desc, col("subseq").desc, col("value").desc)
      rawEntries(reader = reader, pruneKey = pruneKey, pruneTsLt = pruneTsLt,
          pruneTsGe = pruneTsGe, pruneBucket = pruneBucket)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    }
  }

  /** Latest value per key at or before `asOf` (TimeIterator newest-wins). */
  def latest(asOf: Long): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("ts").desc)
    // asOf prunes below the block decode too (t0 ≤ asOf blocks only —
    // sound: the per-key window only ever KEEPS entries with ts ≤ asOf,
    // and those live in blocks with t0 ≤ ts ≤ asOf)
    toDFWithPartitions(
        pruneTsLt = if (asOf == Long.MaxValue) None else Some(asOf + 1))
      .select(EntryColumns.map(col): _*)
      .filter(col("ts") <= asOf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(EntryColumns.map(col): _*)
  }

  /** All parquet part files under a generation dir (sorted for
    * deterministic snapshots). */
  private def listParquetFiles(dir: Path): Seq[Path] =
    if (!Files.exists(dir)) Seq.empty
    else {
      val st = Files.walk(dir)
      try st.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList.sortBy(_.toString)
      finally st.close()
    }

  /** COPY every parquet file under `from` that is NOT in `snapshot` into
    * the same relative location under `to` — the entries put while a
    * compaction was building its new generation. Runs inside the commit
    * window (no put in flight), so the leftover set is stable.
    *
    * Copy, NOT move (crash atomicity — StoreCrashSpec): the target
    * generation is still UNCOMMITTED here, and reopen-after-crash rolls
    * back unreferenced, un-graveyarded generation dirs. A move would
    * strand acknowledged puts inside the rolled-back dir — a crash in
    * the window between the move and the pointer commit would LOSE
    * them. With a copy the old generation keeps the originals until it
    * is buried (which happens only after the commit), so a crash at any
    * step leaves one complete generation; the duplicate copies are
    * never visible twice because the pointer selects exactly one dir. */
  private def copyLeftovers(from: Path, snapshot: Set[Path], to: Path): Unit =
    listParquetFiles(from).filterNot(snapshot).foreach { f =>
      val dest = to.resolve(from.relativize(f))
      Files.createDirectories(dest.getParent)
      Files.copy(f, dest, StandardCopyOption.REPLACE_EXISTING)
    }

  /** Serializes this instance's compactions (the cross-process mutex is
    * instance-reentrant, so it alone wouldn't stop two threads of ONE
    * instance compacting concurrently). */
  private val compactionMutex = new Object

  /** Rewrite the rick layer into one file per partition sorted by
    * (key, ts) with last-write-wins applied — the rick → SSTable
    * compaction (reference: src/level.rs:356-470). Parallel per
    * partition; the swap commits via one atomic pointer rename, so a
    * crash leaves either the old or the new generation intact. Puts of
    * this instance proceed concurrently: the rewrite works off a file
    * snapshot, and entries appended meanwhile are moved into the new
    * generation inside the brief put-excluded commit window. */
  def compact(): Unit = compactionMutex.synchronized { withMutex {
    refreshPointer()
    val snapshot0 =
      if (hasRows) listParquetFiles(dirOf(ptr.rows)) else Seq.empty[Path]
    // bucket dirs can exist with zero part files (e.g. post-outdate);
    // a zero-path read would fail schema inference — nothing to do
    if (snapshot0.nonEmpty) {
      val cur = ptr
      val g = allocGen(cur)
      val newRows = s"r-$g"
      val snapshot = snapshot0
      val raw0 = spark.read.option("basePath", dirOf(cur.rows).toString)
        .parquet(snapshot.map(_.toString): _*)
      // physical reclaim of logically-outdated buckets happens here —
      // the LSM discipline: retention marks, compaction drops
      val raw = if (cur.minb == Long.MinValue) raw0
        else raw0.filter(col("bucket") >= cur.minb)
      // per-shard LWW, matching toDFWithPartitions and blockCompact
      val w = Window.partitionBy("shard", "key", "ts")
        .orderBy(col("seq").desc, col("subseq").desc, col("value").desc)
      raw.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .repartition(col("shard"), col("bucket"))
        .sortWithinPartitions("key", "ts")
        .write.mode("overwrite").partitionBy("shard", "bucket")
        .parquet(dirOf(newRows).toString)
      crashHook("compact:staged")
      withPutsExcluded {
        copyLeftovers(dirOf(cur.rows), snapshot.toSet, dirOf(newRows))
        crashHook("compact:leftovers-copied")
        commit(cur.copy(gen = g, rows = newRows))
      }
      crashHook("compact:committed")
      bury(Seq(cur.rows)) // deferred deletion: in-flight readers drain first
    }
  }}

  /** Fold BOTH layers into fresh compressed block ("SSTable") files —
    * per (key, shard, bucket) one delta-encoded block (reference:
    * src/level.rs:356-470 + fn_registry.rs compress_entries) — plus a
    * rebuilt min/max-key manifest and an empty rick generation. All
    * three flip in ONE atomic pointer commit; the absorbed old
    * generations are deleted only after the commit, so a crash
    * mid-compaction never loses committed entries. One groupByKey
    * shuffle; block size is bounded by the bucket. */
  def blockCompact(): Unit = compactionMutex.synchronized { withMutex {
    compactionsRun.incrementAndGet()
    refreshPointer()
    if (hasData) {
    import spark.implicits._
    val cur = ptr
    val g = allocGen(cur)
    val newBlocks = s"b-$g"
    val newManifest = s"m-$g"
    val newRows = s"r-$g"
    // snapshot the rick file list: entries put while this compaction
    // builds its output land in files outside the snapshot and are moved
    // into the fresh rick generation at commit
    val rickSnapshot = listParquetFiles(dirOf(cur.rows))
    // UDCF dispatch: registry + fn pulled into locals so the task
    // closure captures plain Serializable values, not `this`. A dispatch
    // to an unregistered codec name fails the compaction loudly
    // (reference FnRegistry::udcf errors, fn_registry.rs:96).
    val codecsByName = opts.codecs
    val dispatch = opts.codecDispatch.getOrElse((_: Array[Byte]) => NoopCodec.name)
    val blocks = rawEntries(rowFilesSnapshot = Some(rickSnapshot))
      .select(col("key"), col("ts"), col("value"), col("seq"), col("subseq"),
        col("shard"), col("bucket"))
      .as[(Array[Byte], Long, Array[Byte], Long, Long, Int, Long)]
      .groupByKey(r => (r._1.toSeq, r._6, r._7))
      .mapGroups { (k: (Seq[Byte], Int, Long), it: Iterator[(Array[Byte], Long, Array[Byte], Long, Long, Int, Long)]) =>
        // LWW inside the block: max (seq, subseq, value-bytes) entry per
        // ts — the value tiebreak uses the SAME unsigned-lexicographic
        // order as Spark's BinaryType, so this path picks the identical
        // winner as the window/orderBy LWW sites
        val byTs = it.toArray.groupBy(_._2).valuesIterator
          .map(_.maxBy(r => (r._4, r._5, r._3))(
            Ordering.Tuple3(Ordering.Long, Ordering.Long, HelixStore.BytesOrdering)))
          .toArray.sortBy(_._2)
        val t0 = byTs.head._2
        val deltas = new Array[Long](byTs.length)
        var prev = t0
        var i = 0
        while (i < byTs.length) {
          deltas(i) = byTs(i)._2 - prev; prev = byTs(i)._2; i += 1
        }
        val keyBytes = k._1.toArray
        val codecName = dispatch(keyBytes)
        val codec = codecsByName.getOrElse(codecName, throw new IllegalArgumentException(
          s"codec dispatch returned unregistered name '$codecName' " +
            s"(registered: ${codecsByName.keys.mkString(", ")})"))
        HelixStore.BinBlock(keyBytes, k._2, k._3, t0, byTs.last._2, deltas,
          byTs.map(_._4), codecName, codec.encode(byTs.map(_._3)))
      }
      .toDF()
    blocks.repartition(col("shard"), col("bucket"))
      .write.mode("overwrite").partitionBy("shard", "bucket")
      .parquet(dirOf(newBlocks).toString)
    // a fully-outdated store compacts to ZERO blocks (logical retention
    // filtered everything): commit an empty store rather than reading a
    // fileless dir for the manifest
    val wroteBlocks = listParquetFiles(dirOf(newBlocks)).nonEmpty
    if (wroteBlocks) {
      // manifest derives from the freshly-written (still uncommitted) blocks
      spark.read.parquet(dirOf(newBlocks).toString)
        .groupBy("shard", "bucket")
        .agg(min("key").as("min_key"), max("key").as("max_key"),
          count(lit(1)).as("n_blocks"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dirOf(newManifest).toString)
    }
    // allocGen already claimed r-<g> as the fresh rick layer; entries
    // put during the build move into it inside the commit window
    crashHook("blockCompact:staged")
    withPutsExcluded {
      copyLeftovers(dirOf(cur.rows), rickSnapshot.toSet, dirOf(newRows))
      crashHook("blockCompact:leftovers-copied")
      commit(Pointer(g, newRows,
        if (wroteBlocks) Some(newBlocks) else None,
        if (wroteBlocks) Some(newManifest) else None,
        minb = cur.minb))
    }
    crashHook("blockCompact:committed")
    // deferred deletion of the absorbed generations: in-flight readers
    // keep resolving against them until vacuum's retention expires
    bury(Seq(cur.rows) ++ cur.blocks ++ cur.manifest)
    if (!wroteBlocks) deleteRecursively(dirOf(newBlocks)) // fileless, uncommitted
    }
  }}

  /** Drop all buckets strictly older than `ts` (reference Outdate,
    * src/level.rs:337) — LOGICALLY: one pointer commit raises the
    * retention cutoff (`minb`), making the buckets invisible to every
    * read immediately, while their files stay on disk for in-flight
    * reader plans. Physical reclaim is deferred: the dropped bucket
    * dirs are graveyarded for age-based vacuum, and the next compaction
    * rewrites without them (the LSM mark-then-compact discipline). No
    * data rewrite here — metadata only. Takes the compaction mutex so
    * the cutoff can't move under a running compaction's snapshot. */
  def outdate(ts: Long): Unit = compactionMutex.synchronized { withMutex {
    refreshPointer()
    if (!hasData) return
    val cutoff = ts / opts.bucketSize // truncating, matching put()
    // the commit (gen bump + cutoff) is the visibility point: other
    // instances' reads and kv-cache epochs observe it on their next
    // pointer refresh
    commit(ptr.copy(gen = ptr.gen + 1,
      minb = math.max(ptr.minb, cutoff)))
    crashHook("outdate:committed")
    // graveyard the now-invisible bucket dirs (relative paths) so vacuum
    // reclaims them once retention has drained in-flight readers
    val dataRoots = Seq(ptr.rows).filter(_ => hasRows) ++
      ptr.blocks.filter(_ => hasBlocks)
    val dropped = dataRoots.flatMap { root0 =>
      val r = dirOf(root0)
      listDir(r)
        .filter(_.getFileName.toString.startsWith("shard="))
        .flatMap { shardDir =>
          listDir(shardDir)
            .filter { p =>
              val n = p.getFileName.toString
              n.startsWith("bucket=") && n.stripPrefix("bucket=").toLong < cutoff
            }
            .map(p => s"$root0/${shardDir.getFileName}/${p.getFileName}")
        }
    }
    if (dropped.nonEmpty) bury(dropped)
  }}

  // ---- background compaction scheduling -------------------------------
  // The reference runs compactions off the write path through a deduped
  // task queue (compact_sched.rs:1-143): a put that trips a rick_range
  // boundary must not stall ingestion for a full compaction. Same shape
  // here: one lazily-started daemon worker per store, and a pending flag
  // that coalesces schedule requests arriving while one is already
  // queued (requests arriving DURING a run schedule a follow-up — the
  // running pass may already have missed their data).

  /** Total blockCompact invocations (test observability). */
  private[graft] val compactionsRun = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var compactError: Option[Throwable] = None
  // queued-but-not-started runs, bounded by opts.taskBufferSize (the
  // reference's task_buffer_size) — excess requests coalesce
  private val compactQueued = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var compactExecStarted = false
  private lazy val compactExec = java.util.concurrent.Executors.newSingleThreadExecutor(
    (r: Runnable) => {
      val t = new Thread(r, s"helixstore-compact-${root.getFileName}")
      t.setDaemon(true)
      t
    })

  /** Queue a block compaction off the write path. Deduped: while the
    * queue holds opts.taskBufferSize pending runs, further requests
    * coalesce into them. Failures surface on the next
    * [[awaitCompactions]] (and are never silently dropped). */
  def scheduleBlockCompact(): Unit = {
    val claimed = {
      var ok = false
      var done = false
      while (!done) {
        val q = compactQueued.get()
        if (q >= opts.taskBufferSize) { done = true }
        else if (compactQueued.compareAndSet(q, q + 1)) { ok = true; done = true }
      }
      ok
    }
    if (claimed) {
      compactExecStarted = true
      compactExec.execute { () =>
        compactQueued.decrementAndGet() // before running: see coalescing note
        try {
          // job-group properties are inheritable thread-locals: without
          // this reset, a worker created from inside a streaming
          // foreachBatch inherits the QUERY's job group and the
          // streaming stop() cancels the background compaction mid-swap
          spark.sparkContext.setJobGroup(
            s"helixstore-compact-${root.getFileName}",
            "background blockCompact", interruptOnCancel = false)
          blockCompact()
        }
        catch { case t: Throwable => compactError = Some(t) }
      }
    }
  }

  /** Barrier: wait for every scheduled compaction to finish; rethrows
    * the first background failure. */
  def awaitCompactions(): Unit = {
    if (compactExecStarted)
      compactExec.submit(new Runnable { def run(): Unit = () }).get()
    compactError.foreach { t => compactError = None; throw t }
  }

  def close(): Unit = {
    // The compact prompt stops FIRST, and close() waits until the
    // prompt has FULLY terminated before draining: a probe still
    // in flight when awaitCompactions() runs could enqueue a compaction
    // AFTER the drain, and that compaction would run during shutdown —
    // after the heartbeat stops, so it would hold _mutex with no
    // touches and, past lockStaleMs, another instance could
    // stale-break it mid-swap (the exact two-mutators hazard the
    // heartbeat exists to prevent). A probe is one cheap rick-rows
    // existence check, so the loop normally exits on its first wait;
    // it warns each minute if a probe is wedged on a slow filesystem
    // rather than silently accepting that hazard. Residual window: a
    // close() interrupted mid-wait gives up the guarantee (flagged
    // loudly below) — the caller chose to abandon the wait.
    compactPrompt.foreach { ex =>
      ex.shutdown()
      var terminated = false
      var interrupted = false
      while (!terminated && !interrupted) {
        try {
          terminated = ex.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
          if (!terminated)
            System.err.println("[helixstore] WARNING: compact prompt still " +
              s"stopping after 60s ($root); waiting so no compaction can " +
              "outlive the lock heartbeat")
        } catch {
          case _: InterruptedException =>
            Thread.currentThread().interrupt()
            interrupted = true
            if (!ex.isTerminated)
              System.err.println("[helixstore] WARNING: close() interrupted " +
                s"before the compact prompt stopped ($root); an in-flight " +
                "probe may enqueue a compaction that outlives the heartbeat")
        }
      }
    }
    // shutdown in finally: awaitCompactions rethrows a background
    // compaction failure, and that must not leak the executor thread
    // (or the lock heartbeat) in a long-lived driver
    try awaitCompactions()
    finally {
      if (compactExecStarted) compactExec.shutdown()
      // heartbeat stops LAST: every compaction the prompt could have
      // queued has drained above, and the heartbeat must keep touching
      // the lock for as long as any of them could hold it
      lockHeartbeat.shutdown()
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
