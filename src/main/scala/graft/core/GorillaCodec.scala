package graft.core

/**
 * Gorilla-style float value codec (Pelkonen et al., "Gorilla: A Fast,
 * Scalable, In-Memory Time Series Database", VLDB 2015, §4.1.2) — the
 * float-compression UDCF the reference's registry exists to host
 * (reference: src/fn_registry.rs:12-16 CompressFn registered per key).
 *
 * Each 8-byte value is read as IEEE-754 bits and XOR-chained with its
 * predecessor; the XOR is bit-packed as:
 *  - `0`                        — identical to the previous value;
 *  - `10` + meaningful bits     — nonzero, fits the previous value's
 *                                 (leading, trailing) zero window;
 *  - `11` + 5-bit leading-zero count + 6-bit (length-1) + meaningful
 *                                 bits — new window.
 * Slowly-drifting series (the common TSDB case) pack to a few bits per
 * point. Blocks whose values are not all exactly 8 bytes fall back to
 * the length-prefixed noop layout behind a marker byte, so a dispatch
 * that routes a mixed-payload key here stays lossless.
 */
object GorillaCodec extends BlockCodec {
  val name = "gorilla"

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def result(): Array[Byte] =
      (if (nbits > 0) buf :+ (cur << (8 - nbits)).toByte else buf).toArray
  }

  private final class BitReader(bytes: Array[Byte], private var pos: Int) {
    private var bit = 0
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(pos) >> (7 - bit)) & 1).toLong
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  def encode(vals: Array[Array[Byte]]): Array[Byte] = {
    if (vals.exists(_.length != 8)) {
      val inner = NoopCodec.encode(vals)
      val out = new Array[Byte](inner.length + 1)
      out(0) = 0
      System.arraycopy(inner, 0, out, 1, inner.length)
      return out
    }
    val w = new BitWriter
    var prev = 0L
    var prevLead = -1
    var prevTrail = -1
    var i = 0
    while (i < vals.length) {
      val v = java.nio.ByteBuffer.wrap(vals(i)).getLong
      if (i == 0) w.writeBits(v, 64)
      else {
        val x = v ^ prev
        if (x == 0L) w.writeBits(0L, 1)
        else {
          w.writeBits(1L, 1)
          val lead = math.min(java.lang.Long.numberOfLeadingZeros(x), 31)
          val trail = java.lang.Long.numberOfTrailingZeros(x)
          if (prevLead >= 0 && lead >= prevLead && trail >= prevTrail) {
            w.writeBits(0L, 1)
            w.writeBits(x >>> prevTrail, 64 - prevLead - prevTrail)
          } else {
            w.writeBits(1L, 1)
            w.writeBits(lead.toLong, 5)
            val meaningful = 64 - lead - trail
            w.writeBits((meaningful - 1).toLong, 6)
            w.writeBits(x >>> trail, meaningful)
            prevLead = lead
            prevTrail = trail
          }
        }
      }
      prev = v
      i += 1
    }
    val bits = w.result()
    java.nio.ByteBuffer.allocate(5 + bits.length)
      .put(1.toByte).putInt(vals.length).put(bits).array()
  }

  def decode(blob: Array[Byte]): Array[Array[Byte]] = {
    if (blob.isEmpty) return Array.empty
    if (blob(0) == 0) {
      val inner = new Array[Byte](blob.length - 1)
      System.arraycopy(blob, 1, inner, 0, inner.length)
      return NoopCodec.decode(inner)
    }
    val n = java.nio.ByteBuffer.wrap(blob, 1, 4).getInt
    val r = new BitReader(blob, 5)
    val out = new Array[Array[Byte]](n)
    var prev = 0L
    var prevLead = 0
    var prevTrail = 0
    var i = 0
    while (i < n) {
      val v =
        if (i == 0) r.readBits(64)
        else if (r.readBits(1) == 0L) prev
        else if (r.readBits(1) == 0L)
          prev ^ (r.readBits(64 - prevLead - prevTrail) << prevTrail)
        else {
          val lead = r.readBits(5).toInt
          val meaningful = r.readBits(6).toInt + 1
          val trail = 64 - lead - meaningful
          prevLead = lead
          prevTrail = trail
          prev ^ (r.readBits(meaningful) << trail)
        }
      out(i) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
      prev = v
      i += 1
    }
    out
  }
}
