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

  def compress(points: Dataset[TsPoint], bucketUs: Long)
      (implicit s: SparkSession): Dataset[TsBlock] = {
    import s.implicits._
    points
      .groupByKey(p => (p.key, Math.floorDiv(p.ts_us, bucketUs)))
      .mapGroups { (kb: (Long, Long), it: Iterator[TsPoint]) =>
        val (key, bucket) = kb
        val pts = it.toArray.sortBy(p => (p.ts_us, p.value))
        val t0 = pts.head.ts_us
        val deltas = new Array[Long](pts.length)
        var prev = t0
        var i = 0
        while (i < pts.length) {
          deltas(i) = pts(i).ts_us - prev; prev = pts(i).ts_us; i += 1
        }
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
}
