package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

import graft.core.{HelixStore, StoreOptions}

/** Store-level benchmark mirroring the reference's own workload shape
  * (benchmarks/src/{load,read,scan}.rs: fill numKey × numTimestamp,
  * point-read, full scan). Prints one JSON line. */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val numKeys = sys.env.getOrElse("SPARK_GRAFT_NUM_KEYS", "1000").toInt
    val numTs = sys.env.getOrElse("SPARK_GRAFT_NUM_TS", "1000").toInt
    val dir = java.nio.file.Files.createTempDirectory("storebench").toString
    val store = HelixStore.open(spark, dir, StoreOptions(numShards = 8, bucketSize = numTs / 10 + 1))

    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("ts", LongType),
      StructField("value", BinaryType)))
    import org.apache.spark.sql.functions._
    val entries = spark.range(numKeys.toLong * numTs)
      .select(
        expr(s"cast(concat('key', lpad(cast(id % $numKeys as string), 8, '0')) as binary)").as("key"),
        expr(s"id div $numKeys").as("ts"),
        expr("cast(concat('value-', cast(id as string)) as binary)").as("value"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tPut) = time(store.put(entries))
    val gets = (0 until 50).map { i =>
      val k = f"key${(i * 37) % numKeys}%08d".getBytes
      time(store.get(k, (i * 13) % numTs))._2
    }
    // repeat the same point reads: served by the kv cache (cache.rs
    // kv_cache analogue) without a Spark job
    val cachedGets = (0 until 50).map { i =>
      val k = f"key${(i * 37) % numKeys}%08d".getBytes
      time(store.get(k, (i * 13) % numTs))._2
    }
    val (nScan, tScan) = time(
      store.scan((0L, numTs.toLong), ("key".getBytes, "kez".getBytes)).count())
    val (_, tCompact) = time(store.blockCompact())
    val (nScan2, tScan2) = time(
      store.scan((0L, numTs.toLong), ("key".getBytes, "kez".getBytes)).count())
    require(nScan == numKeys.toLong * numTs && nScan2 == nScan,
      s"scan count mismatch: $nScan / $nScan2")
    // point reads against the BLOCK layer (distinct keys → kv cache
    // misses): measures that the (shard, bucket) prune reaches the
    // scan below the block-decompress flatMap
    val blockGets = (50 until 100).map { i =>
      val k = f"key${(i * 37) % numKeys}%08d".getBytes
      time(store.get(k, (i * 13) % numTs))._2
    }
    // batched multiget: fresh keys (kv-cache cold) in ONE pruned job —
    // the per-batch cost the looped gets above pay per key
    val mgProbes: Seq[(Array[Byte], Long)] = (100 until 150).map { i =>
      (f"key${(i * 37) % numKeys}%08d".getBytes: Array[Byte],
        ((i * 13) % numTs).toLong)
    }
    val (mgHits, tMultiget) = time(store.multiGet(mgProbes))
    require(mgHits.forall(_.isDefined), "multiget must hit every probe")

    val rows = numKeys.toLong * numTs

    // Codec cost/benefit on a float workload — the reference's
    // benchmarks/src/load.rs measures fill/read WITH compression in the
    // loop. Same fill twice: once noop-dispatched, once with every key
    // through the Gorilla XOR codec; smooth per-key series so the codec
    // has something to compress. Reports compact/scan/point-get times
    // and the on-disk block bytes for both.
    import spark.implicits._
    val floatEntries = spark.range(rows).map { id =>
      val key = s"key${"%08d".format(id % numKeys)}".getBytes
      val ts = id / numKeys
      val v = java.nio.ByteBuffer.allocate(8).putLong(
        java.lang.Double.doubleToRawLongBits(100.0 + (ts % 100) * 0.25)).array()
      (key, ts, v)
    }.toDF("key", "ts", "value")

    def codecWorkload(tag: String, gorilla: Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory(s"storebench-$tag").toString
      val st = HelixStore.open(spark, d, StoreOptions(
        numShards = 8, bucketSize = numTs / 10 + 1,
        codecs = Map(
          graft.core.NoopCodec.name -> graft.core.NoopCodec,
          graft.core.GorillaCodec.name -> graft.core.GorillaCodec),
        codecDispatch =
          if (gorilla) Some((_: Array[Byte]) => graft.core.GorillaCodec.name)
          else None))
      val (_, tFill) = time(st.put(floatEntries))
      val (_, tComp) = time(st.blockCompact())
      val (n, tSc) = time(
        st.scan((0L, numTs.toLong), ("key".getBytes, "kez".getBytes)).count())
      require(n == rows, s"$tag scan count mismatch: $n")
      val g = (0 until 25).map { i =>
        val k = f"key${(i * 41) % numKeys}%08d".getBytes
        time(st.get(k, (i * 17) % numTs))._2
      }
      val blockBytes = new java.io.File(d).listFiles()
        .filter(_.getName.startsWith("b-"))
        .map { f =>
          val walk = java.nio.file.Files.walk(f.toPath)
          try walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum
          finally walk.close()
        }.sum
      st.close()
      f""""$tag":{"fill_s":$tFill%.2f,"block_compact_s":$tComp%.2f,""" +
        f""""scan_s":$tSc%.2f,"get_block_avg_ms":${g.sum / g.size * 1000}%.0f,""" +
        f""""block_bytes":$blockBytes}"""
    }
    val noopFloat = codecWorkload("noop_float", gorilla = false)
    val gorillaFloat = codecWorkload("gorilla_float", gorilla = true)

    println(f"""{"rows":$rows,"put_s":$tPut%.2f,"put_rows_per_s":${rows / tPut}%.0f,""" +
      f""""get_avg_ms":${gets.sum / gets.size * 1000}%.0f,""" +
      f""""get_cached_avg_us":${cachedGets.sum / cachedGets.size * 1e6}%.0f,""" +
      f""""get_block_avg_ms":${blockGets.sum / blockGets.size * 1000}%.0f,""" +
      f""""multiget50_s":$tMultiget%.2f,"multiget_avg_ms":${tMultiget / mgProbes.size * 1000}%.0f,"scan_s":$tScan%.2f,""" +
      f""""scan_rows_per_s":${rows / tScan}%.0f,"block_compact_s":$tCompact%.2f,""" +
      f""""scan_after_compact_s":$tScan2%.2f,""" +
      noopFloat + "," + gorillaFloat + "}")
    store.close()
    spark.stop()
  }
}
