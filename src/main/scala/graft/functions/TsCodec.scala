package graft.functions

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Time-series block codec — the Spark-native answer to the reference's
 * UDCF ("user defined compress function", reference:
 * src/fn_registry.rs:12-16,127-198): at compaction each key's
 * (ts, value) run within a level is folded into one compressed block;
 * reads decompress back to points.
 *
 * Encoding: per (key, bucket) block, timestamps are delta-encoded from
 * the block's first timestamp (monotone small ints — the classic TS
 * trick the reference's pluggable codecs exist for); values ride along
 * uncompressed (parquet's own encodings handle them on disk).
 *
 * Typed Dataset API: groupByKey shuffles once on (key, bucket) — block
 * size is bounded by the bucket duration, so memory per group is
 * bounded at any total scale.
 */
object TsCodec {
  final case class TsPoint(key: Long, ts_us: Long, value: Double)
  /** `xvals` are Gorilla-style XOR-chained IEEE754 bits: xvals(0) is
    * value(0) raw, xvals(i) = bits(v_i) XOR bits(v_{i-1}) — long runs of
    * similar floats become mostly-zero words parquet compresses hard. */
  final case class TsBlock(key: Long, bucket: Long, t0: Long,
      deltas: Array[Long], xvals: Array[Long])

  /** XOR-chain encode doubles (exact, order-preserving). */
  def xorEncode(vs: Array[Double]): Array[Long] = {
    val out = new Array[Long](vs.length)
    var prev = 0L
    var i = 0
    while (i < vs.length) {
      val bits = java.lang.Double.doubleToRawLongBits(vs(i))
      out(i) = bits ^ prev
      prev = bits
      i += 1
    }
    out
  }

  /** Inverse of [[xorEncode]]. */
  def xorDecode(xs: Array[Long]): Array[Double] = {
    val out = new Array[Double](xs.length)
    var prev = 0L
    var i = 0
    while (i < xs.length) {
      prev = xs(i) ^ prev
      out(i) = java.lang.Double.longBitsToDouble(prev)
      i += 1
    }
    out
  }

  /** Shared per-(key, bucket) run layout: (ts, value)-sorted points,
    * base timestamp, delta chain. BOTH compression paths build runs
    * through this one function so tie ordering and delta semantics
    * cannot drift between the plain and dispatched codecs. */
  private def buildRun(it: Iterator[TsPoint]): (Array[TsPoint], Long, Array[Long]) = {
    val pts = it.toArray.sortBy(p => (p.ts_us, p.value))
    val t0 = pts.head.ts_us
    val deltas = new Array[Long](pts.length)
    var prev = t0
    var i = 0
    while (i < pts.length) {
      deltas(i) = pts(i).ts_us - prev; prev = pts(i).ts_us; i += 1
    }
    (pts, t0, deltas)
  }

  def compress(points: Dataset[TsPoint], bucketUs: Long)
      (implicit s: SparkSession): Dataset[TsBlock] = {
    import s.implicits._
    points
      .groupByKey(p => (p.key, Math.floorDiv(p.ts_us, bucketUs)))
      .mapGroups { (kb: (Long, Long), it: Iterator[TsPoint]) =>
        val (key, bucket) = kb
        val (pts, t0, deltas) = buildRun(it)
        TsBlock(key, bucket, t0, deltas, xorEncode(pts.map(_.value)))
      }
  }

  def decompress(blocks: Dataset[TsBlock])
      (implicit s: SparkSession): Dataset[TsPoint] = {
    import s.implicits._
    blocks.flatMap { b =>
      var t = b.t0
      b.deltas.iterator.zip(xorDecode(b.xvals).iterator).map { case (d, v) =>
        t += d
        TsPoint(b.key, t, v)
      }
    }
  }

  /** Block whose value payload went through a NAMED registry codec; the
    * codec name rides in the block so reads dispatch the inverse without
    * consulting the routing function (the reference stores the same
    * association — fn_registry.rs register_dispatch_fn routes writes,
    * blocks decode by their recorded codec). */
  final case class TsBlockD(key: Long, bucket: Long, t0: Long,
      deltas: Array[Long], codec: String, payload: Array[Byte])

  private def doubleBytes(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .putLong(java.lang.Double.doubleToRawLongBits(v)).array()

  /** Per-key UDCF dispatch at the block level (reference
    * register_dispatch_fn, fn_registry.rs:88): each (key, bucket) run's
    * values are packed through the [[graft.core.BlockCodec]] that
    * `dispatch` names for the key. Same single (key, bucket) shuffle as
    * [[compress]]; the codec map and routing fn ship to executors, so
    * both must be Serializable. */
  def compressDispatch(points: Dataset[TsPoint], bucketUs: Long,
      codecs: Map[String, graft.core.BlockCodec], dispatch: Long => String)
      (implicit s: SparkSession): Dataset[TsBlockD] = {
    import s.implicits._
    points
      .groupByKey(p => (p.key, Math.floorDiv(p.ts_us, bucketUs)))
      .mapGroups { (kb: (Long, Long), it: Iterator[TsPoint]) =>
        val (key, bucket) = kb
        val (pts, t0, deltas) = buildRun(it)
        val name = dispatch(key)
        val codec = codecs.getOrElse(name, throw new IllegalArgumentException(
          s"dispatch named unregistered codec '$name' for key $key"))
        TsBlockD(key, bucket, t0, deltas, name,
          codec.encode(pts.map(p => doubleBytes(p.value))))
      }
  }

  /** Inverse of [[compressDispatch]]: every block decodes through the
    * codec RECORDED IN THE BLOCK, not a re-evaluation of the routing
    * function — so re-routing keys later can never corrupt old blocks. */
  def decompressDispatch(blocks: Dataset[TsBlockD],
      codecs: Map[String, graft.core.BlockCodec])
      (implicit s: SparkSession): Dataset[TsPoint] = {
    import s.implicits._
    blocks.flatMap { b =>
      val codec = codecs.getOrElse(b.codec, throw new IllegalArgumentException(
        s"block encoded with unregistered codec '${b.codec}'"))
      val vals = codec.decode(b.payload).map(bs =>
        java.lang.Double.longBitsToDouble(java.nio.ByteBuffer.wrap(bs).getLong))
      var t = b.t0
      b.deltas.iterator.zip(vals.iterator).map { case (d, v) =>
        t += d
        TsPoint(b.key, t, v)
      }
    }
  }
}
