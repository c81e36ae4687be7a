package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.NoopCodec
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
