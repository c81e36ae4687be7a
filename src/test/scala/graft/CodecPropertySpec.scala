package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GorillaCodec, NoopCodec}
import graft.functions.PlaneWeights

/** Pure-JVM property checks for the codec and LSH building blocks (no
  * SparkSession — these invariants must hold for every input, not just
  * the fixtures the integration specs use). Inputs are generated from a
  * FIXED seed so failures reproduce exactly. */
class CodecPropertySpec extends AnyFunSuite {

  private def randomBatches(seed: Long, rounds: Int): Seq[Array[Array[Byte]]] = {
    val rnd = new scala.util.Random(seed)
    (0 until rounds).map { _ =>
      Array.fill(rnd.nextInt(16)) {
        val v = new Array[Byte](rnd.nextInt(64))
        rnd.nextBytes(v)
        v
      }
    }
  }

  test("NoopCodec roundtrips any value batch byte-exactly (500 random batches)") {
    for (batch <- randomBatches(seed = 42L, rounds = 500)) {
      val out = NoopCodec.decode(NoopCodec.encode(batch))
      assert(out.length == batch.length)
      assert(out.zip(batch).forall { case (a, b) => a.sameElements(b) })
    }
  }

  test("XorCodec roundtrips any value batch byte-exactly (500 random batches)") {
    for (batch <- randomBatches(seed = 7L, rounds = 500)) {
      val out = XorCodec.decode(XorCodec.encode(batch))
      assert(out.length == batch.length)
      assert(out.zip(batch).forall { case (a, b) => a.sameElements(b) })
    }
  }

  private def doubleBytes(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .putLong(java.lang.Double.doubleToRawLongBits(v)).array()

  test("GorillaCodec roundtrips random-walk doubles bit-exactly (500 walks)") {
    val rnd = new scala.util.Random(11L)
    for (_ <- 0 until 500) {
      var v = rnd.nextDouble() * 100.0
      val walk = Array.fill(rnd.nextInt(200)) {
        v += (rnd.nextDouble() - 0.5); v
      }
      val batch = walk.map(doubleBytes)
      val out = GorillaCodec.decode(GorillaCodec.encode(batch))
      assert(out.length == batch.length)
      assert(out.zip(batch).forall { case (a, b) => a.sameElements(b) },
        "XOR bit-packing must be lossless on every walk")
    }
  }

  test("GorillaCodec roundtrips adversarial 8-byte batches (raw long bits)") {
    val rnd = new scala.util.Random(13L)
    val special = Array(0L, -1L, Long.MinValue, Long.MaxValue, 1L,
      java.lang.Double.doubleToRawLongBits(Double.NaN),
      java.lang.Double.doubleToRawLongBits(Double.PositiveInfinity))
    for (_ <- 0 until 200) {
      val batch = Array.fill(rnd.nextInt(64)) {
        val bits = if (rnd.nextBoolean()) special(rnd.nextInt(special.length))
                   else rnd.nextLong()
        java.nio.ByteBuffer.allocate(8).putLong(bits).array()
      }
      val out = GorillaCodec.decode(GorillaCodec.encode(batch))
      assert(out.length == batch.length)
      assert(out.zip(batch).forall { case (a, b) => a.sameElements(b) })
    }
  }

  test("GorillaCodec falls back losslessly when values are not 8 bytes") {
    for (batch <- randomBatches(seed = 17L, rounds = 200)) {
      val out = GorillaCodec.decode(GorillaCodec.encode(batch))
      assert(out.length == batch.length)
      assert(out.zip(batch).forall { case (a, b) => a.sameElements(b) })
    }
  }

  test("GorillaCodec actually compresses a slowly-drifting series") {
    // quantized drift: the XOR of consecutive values has few meaningful
    // bits, the shape Gorilla's windowed packing exists for
    val walk = (0 until 1000).map(i => 100.0 + (i % 7) * 0.25).toArray
    val batch = walk.map(doubleBytes)
    val packed = GorillaCodec.encode(batch).length
    assert(packed < batch.length * 8 / 2,
      s"expected <2x raw ($packed vs ${batch.length * 8})")
  }

  test("PlaneWeights yields distinct hyperplanes at every scale used") {
    val planes = PlaneWeights.table(96, 64).map(_.toSeq)
    assert(planes.distinct.length == planes.length,
      "weight family must not collapse (the linear (p*73+j*131)%7 form did)")
    assert(planes.flatten.forall(w => w >= -3 && w <= 3))
  }

  test("prefix length formula keeps at least one shingle and never exceeds n") {
    import graft.operators.Dedup.{ThreshDen, ThreshNum}
    for (n <- (1L to 1000L) ++ Seq(12345L, 999999L, 100000000L)) {
      val prefixLen = n - ((n * ThreshNum + ThreshDen - 1) / ThreshDen) + 1
      assert(prefixLen >= 1 && prefixLen <= n,
        s"prefix length $prefixLen out of [1, $n]")
    }
  }
}
