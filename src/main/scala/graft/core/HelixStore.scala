package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
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
 * Freshly `put` data lands as small append files (the "rick" role);
 * `compact()` rewrites each partition into one file sorted by
 * (key, ts) with last-write-wins applied (the "SSTable" role);
 * `outdate()` drops whole bucket partitions (O(partitions) metadata, no
 * data rewrite) — the Outdate timestamp action.
 *
 * At cluster scale the same layout holds: shards spread writes across
 * executors, buckets bound the data any time-ranged query touches, and
 * compaction is an embarrassingly parallel per-partition rewrite.
 */
final case class StoreOptions(
    numShards: Int = 8,
    /** Timestamp units per bucket (the reference's rick_range). */
    bucketSize: Long = 86400L,
    /** User-registered sharding function over the key column — the
      * reference's ShardingKeyFn (fn_registry.rs:55). Must return a
      * value in [0, numShards). None = pmod(xxhash64(key), numShards). */
    shardingFn: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None)

object HelixStore {
  val EntryColumns: Seq[String] = Seq("key", "ts", "value")

  /** Compressed block: one key's run within one (shard, bucket), ts
    * delta-encoded from t0, per-entry seq preserved for LWW — the
    * SSTable+UDCF unit (reference: src/file/sstable.rs +
    * fn_registry.rs compress_entries). */
  final case class BinBlock(key: Array[Byte], shard: Int, bucket: Long,
      t0: Long, deltas: Array[Long], seqs: Array[Long],
      vals: Array[Array[Byte]])

  def open(spark: SparkSession, path: String,
      opts: StoreOptions = StoreOptions()): HelixStore =
    new HelixStore(spark, path, opts)
}

final class HelixStore private (
    val spark: SparkSession, val path: String, val opts: StoreOptions) {
  import HelixStore._

  private val root: Path = Paths.get(path)
  Files.createDirectories(root)
  /** Monotonic write sequence for last-write-wins (the role the rick
    * append offset plays in the reference, src/file/rick.rs). */
  private val seqFile = root.resolve("_seq")

  private def nextSeq(): Long = synchronized {
    val cur = if (Files.exists(seqFile)) new String(Files.readAllBytes(seqFile)).trim.toLong else 0L
    Files.write(seqFile, (cur + 1).toString.getBytes)
    cur + 1
  }

  /** Block ("SSTable") files live in a sibling directory so row reads of
    * `path` never see them (and Spark's file index skips underscore
    * paths entirely, even as a read root). */
  private val blocksRoot: Path = Paths.get(path + ".blocks")

  /** Per-(shard, bucket) min/max key manifest for the block layer — the
    * reference's sstable index block (src/file/sstable.rs
    * IndexBlockBuilder): point reads consult it driver-side and skip
    * block partitions that cannot contain the key. */
  private val manifestRoot: Path = Paths.get(path + ".manifest")
  @volatile private var manifestCache:
      Option[Map[(Int, Long), (Array[Byte], Array[Byte])]] = None

  private def manifest: Map[(Int, Long), (Array[Byte], Array[Byte])] = {
    manifestCache.getOrElse {
      val m =
        if (!Files.exists(manifestRoot)) Map.empty[(Int, Long), (Array[Byte], Array[Byte])]
        else spark.read.parquet(manifestRoot.toString).collect().map { r =>
          (r.getAs[Number]("shard").intValue(), r.getAs[Number]("bucket").longValue()) ->
            ((r.getAs[Array[Byte]]("min_key"), r.getAs[Array[Byte]]("max_key")))
        }.toMap
      manifestCache = Some(m)
      m
    }
  }

  /** True when the block layer might hold `key` in (shard, bucket) —
    * false only on manifest proof of absence. */
  private def blockMayContain(shard: Long, bucket: Long, key: Array[Byte]): Boolean = {
    if (!hasBlocks) return false
    if (!Files.exists(manifestRoot)) return true // no manifest: can't prune
    manifest.get((shard.toInt, bucket)) match {
      case None => false // manifest is complete: partition absent = no data
      case Some((lo, hi)) =>
        java.util.Arrays.compareUnsigned(key, lo) >= 0 &&
          java.util.Arrays.compareUnsigned(key, hi) <= 0
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
  private def hasRows: Boolean = hasDataDirs(root)
  private def hasBlocks: Boolean = hasDataDirs(blocksRoot)
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
  private def rawEntries(decompress: Boolean = true): DataFrame = {
    val cols = Seq("key", "ts", "value", "seq", "subseq", "shard", "bucket")
    val rows =
      if (hasRows) Some(spark.read.parquet(path).select(cols.map(col): _*))
      else None
    val blocks =
      if (decompress && hasBlocks) {
        import spark.implicits._
        // block entries are already LWW winners; their in-block position
        // serves as the subseq tiebreak
        Some(spark.read.parquet(blocksRoot.toString).as[HelixStore.BinBlock]
          .flatMap { b =>
            var t = b.t0
            (0 until b.deltas.length).iterator.map { i =>
              t += b.deltas(i)
              (b.key, t, b.vals(i), b.seqs(i), i.toLong, b.shard, b.bucket)
            }
          }.toDF(cols: _*))
      } else None
    (rows ++ blocks).reduceOption(_.unionByName(_)).getOrElse(emptyEntriesWithMeta)
  }

  /** Append a batch of entries (columns: key BINARY, ts LONG, value
    * BINARY). Routing = shard/bucket partition columns; one shuffle-free
    * partitioned write. */
  /** Shard routing expression: custom ShardingKeyFn when registered. */
  private def shardExpr(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    opts.shardingFn match {
      case Some(f) => f(key).cast("int")
      case None => pmod(xxhash64(key), lit(opts.numShards)).cast("int")
    }

  def put(entries: DataFrame, coalescePartitions: Boolean = true): Unit = {
    val seq = nextSeq()
    val routed = entries
      .withColumn("shard", shardExpr(col("key")))
      .withColumn("bucket", expr(s"ts div ${opts.bucketSize}"))
      .withColumn("seq", lit(seq))
      // within-batch tiebreak: duplicate (key, ts) rows in ONE put would
      // otherwise tie on seq and resolve LWW nondeterministically (the
      // reference's rick append offset makes the later entry win)
      .withColumn("subseq", monotonically_increasing_id())
    // Cluster rows by target partition before the write: without this,
    // EVERY input task emits a file into every (shard, bucket) it
    // happens to hold — the classic small-files explosion at scale.
    val arranged =
      if (coalescePartitions) routed.repartition(col("shard"), col("bucket"))
      else routed
    arranged.write.mode("append")
      .partitionBy("shard", "bucket")
      .parquet(path)
  }

  /** All live entries (latest write wins per (key, ts)). */
  def toDF: DataFrame = toDFWithPartitions.select(EntryColumns.map(col): _*)

  /** Exact-timestamp point get (reference: src/db.rs:54). Prunes to one
    * shard + one bucket partition before touching any row group. */
  def get(key: Array[Byte], ts: Long, decompress: Boolean = true): Option[Array[Byte]] = {
    if (!hasData) return None
    // default route: same function Spark's xxhash64(col) computes in
    // put() (seed 42), evaluated driver-side — no job just to route the
    // read. A custom ShardingKeyFn is an arbitrary Column expression, so
    // it's evaluated through a one-row frame instead.
    val shard = opts.shardingFn match {
      case None =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          key, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, key.length, 42L)
        ((h % opts.numShards) + opts.numShards) % opts.numShards
      case Some(_) =>
        spark.range(1).select(shardExpr(lit(key)).as("s")).head().getInt(0).toLong
    }
    // Spark SQL `div` truncates toward zero; use the same semantics here
    // (floorDiv would floor, routing negative logical timestamps to a
    // different bucket than put() wrote)
    val bucket = ts / opts.bucketSize
    // manifest-proven absence in the block layer → read only rick rows
    val useBlocks = decompress && blockMayContain(shard, bucket, key)
    val rows = rawEntries(useBlocks)
      .filter(col("shard") === shard && col("bucket") === bucket)
      .filter(col("key") === lit(key) && col("ts") === ts)
      .orderBy(col("seq").desc, col("subseq").desc)
      .select("value")
      .take(1)
    rows.headOption.map(_.getAs[Array[Byte]](0))
  }

  /** Time-range × key-range scan, globally ordered by (key, ts) —
    * the reference's mux-merged iterator (src/db.rs:67, iterator.rs),
    * expressed as a range-partitioned sort. Bounds follow the reference
    * TimeRange semantics: [start, end) on ts, [low, high) on key. */
  def scan(tsRange: (Long, Long), keyRange: (Array[Byte], Array[Byte]),
      ordered: Boolean = true): DataFrame = {
    if (!hasData) return toDF // empty frame with the entry schema
    val (t0, t1) = tsRange
    val (k0, k1) = keyRange
    // truncating division matches put()'s `ts div bucketSize` and is
    // monotone, so [bucket(t0), bucket(t1-1)] covers the range exactly
    val b0 = t0 / opts.bucketSize
    val b1 = (t1 - 1) / opts.bucketSize
    val filtered = toDFWithPartitions
      .filter(col("bucket").between(b0, b1))
      .filter(col("ts") >= t0 && col("ts") < t1)
      .filter(col("key") >= lit(k0) && col("key") < lit(k1))
      .select(EntryColumns.map(col): _*)
    // ordered=false is the reference's NoOrderComparator scan (util.rs):
    // skip the global sort when the consumer doesn't need key order.
    if (ordered) filtered.orderBy("key", "ts") else filtered
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

  private def toDFWithPartitions: DataFrame = {
    val w = Window.partitionBy("key", "ts")
      .orderBy(col("seq").desc, col("subseq").desc)
    rawEntries().withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
  }

  /** Latest value per key at or before `asOf` (TimeIterator newest-wins). */
  def latest(asOf: Long): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("ts").desc)
    toDF.filter(col("ts") <= asOf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(EntryColumns.map(col): _*)
  }

  /** Rewrite every partition into one file sorted by (key, ts) with
    * last-write-wins applied — the rick → SSTable compaction
    * (reference: src/level.rs:356-470). Parallel per partition; no
    * global shuffle beyond the LWW window. */
  def compact(): Unit = {
    if (!hasRows) return
    val tmp = path + ".compact"
    val raw = spark.read.parquet(path)
    val w = Window.partitionBy("key", "ts")
      .orderBy(col("seq").desc, col("subseq").desc)
    raw.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
      .repartition(col("shard"), col("bucket"))
      .sortWithinPartitions("key", "ts")
      .write.mode("overwrite").partitionBy("shard", "bucket").parquet(tmp)
    // atomic-ish swap: keep _seq, replace data dirs
    listDir(root)
      .filter(_.getFileName.toString.startsWith("shard="))
      .foreach(deleteRecursively)
    listDir(Paths.get(tmp)).foreach { p =>
      if (p.getFileName.toString.startsWith("shard="))
        Files.move(p, root.resolve(p.getFileName))
    }
    deleteRecursively(Paths.get(tmp))
  }

  /** Compact the row ("rick") layer into compressed block ("SSTable")
    * files: per (key, shard, bucket) one delta-encoded block, merged
    * with any existing blocks, written under _blocks, then the row dirs
    * are dropped — the reference's level compaction applying the codec
    * (reference: src/level.rs:356-470 + fn_registry.rs compress_entries).
    * One groupByKey shuffle; block size is bounded by the bucket. */
  def blockCompact(): Unit = {
    if (!hasData) return
    import spark.implicits._
    val tmp = path + ".blockcompact"
    val blocks = rawEntries()
      .select(col("key"), col("ts"), col("value"), col("seq"), col("subseq"),
        col("shard"), col("bucket"))
      .as[(Array[Byte], Long, Array[Byte], Long, Long, Int, Long)]
      .groupByKey(r => (r._1.toSeq, r._6, r._7))
      .mapGroups { (k: (Seq[Byte], Int, Long), it: Iterator[(Array[Byte], Long, Array[Byte], Long, Long, Int, Long)]) =>
        // LWW inside the block: max (seq, subseq) entry per ts
        val byTs = it.toArray.groupBy(_._2).valuesIterator
          .map(_.maxBy(r => (r._4, r._5))).toArray.sortBy(_._2)
        val t0 = byTs.head._2
        val deltas = new Array[Long](byTs.length)
        var prev = t0
        var i = 0
        while (i < byTs.length) {
          deltas(i) = byTs(i)._2 - prev; prev = byTs(i)._2; i += 1
        }
        HelixStore.BinBlock(k._1.toArray, k._2, k._3, t0, deltas,
          byTs.map(_._4), byTs.map(_._3))
      }
      .toDF()
    blocks.repartition(col("shard"), col("bucket"))
      .write.mode("overwrite").partitionBy("shard", "bucket").parquet(tmp)
    // swap: new blocks replace old blocks AND the row layer they absorbed
    if (Files.exists(blocksRoot)) deleteRecursively(blocksRoot)
    Files.createDirectories(blocksRoot)
    listDir(Paths.get(tmp)).foreach { p =>
      if (p.getFileName.toString.startsWith("shard="))
        Files.move(p, blocksRoot.resolve(p.getFileName))
    }
    deleteRecursively(Paths.get(tmp))
    listDir(root)
      .filter(_.getFileName.toString.startsWith("shard="))
      .foreach(deleteRecursively)
    // rebuild the min/max-key manifest from the freshly-written blocks
    val tmpM = path + ".manifest.tmp"
    spark.read.parquet(blocksRoot.toString)
      .groupBy("shard", "bucket")
      .agg(min("key").as("min_key"), max("key").as("max_key"),
        count(lit(1)).as("n_blocks"))
      .coalesce(1)
      .write.mode("overwrite").parquet(tmpM)
    if (Files.exists(manifestRoot)) deleteRecursively(manifestRoot)
    Files.move(Paths.get(tmpM), manifestRoot)
    manifestCache = None
  }

  /** Drop all buckets strictly older than `ts` — pure partition-metadata
    * deletion, no data rewrite (reference Outdate, src/level.rs:337). */
  def outdate(ts: Long): Unit = {
    if (!hasData) return
    val cutoff = ts / opts.bucketSize // truncating, matching put()
    val dataRoots = Seq(root).filter(_ => hasRows) ++
      Seq(blocksRoot).filter(_ => hasBlocks)
    dataRoots.foreach { r =>
      listDir(r)
        .filter(_.getFileName.toString.startsWith("shard="))
        .foreach { shardDir =>
          listDir(shardDir)
            .filter { p =>
              val n = p.getFileName.toString
              n.startsWith("bucket=") && n.stripPrefix("bucket=").toLong < cutoff
            }
            .foreach(deleteRecursively)
        }
    }
  }

  def close(): Unit = ()

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
