package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TsCodec
import graft.operators.Dedup

/** Property-based coverage of the codec and hashing kernels — the pieces
  * where an off-by-one corrupts data silently rather than failing.
  * (ScalaCheck generators driven directly with fixed seeds; the
  * scalatest-plus bridge artifact isn't on the offline classpath.) */
class CodecPropertySpec extends SparkTestBase {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("xor encode/decode is an exact identity for any doubles") {
    val gen = Gen.listOf(Gen.chooseNum(Double.MinValue, Double.MaxValue))
    for (vs0 <- samples(gen, 50)) {
      val vs = vs0.toArray
      val rt = TsCodec.xorDecode(TsCodec.xorEncode(vs))
      assert(rt.length == vs.length &&
        rt.zip(vs).forall { case (a, b) =>
          java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b)
        })
    }
  }

  test("full codec roundtrips arbitrary point sets exactly") {
    implicit val s = spark
    import s.implicits._
    val ptGen = for {
      key <- Gen.chooseNum(0L, 5L)
      ts <- Gen.chooseNum(-100000L, 100000L)
      v <- Gen.chooseNum(-1e9, 1e9)
    } yield TsCodec.TsPoint(key, ts, v)
    for (pts0 <- samples(Gen.listOfN(60, ptGen), 5)) {
      // codec keys points by (key, ts): dedupe like a store would
      val pts = pts0.groupBy(p => (p.key, p.ts_us)).values.map(_.head).toSeq
      val ds = spark.createDataset(pts)
      val rt = TsCodec.decompress(TsCodec.compress(ds, 1000L)).collect()
      assert(rt.map(p => (p.key, p.ts_us, p.value)).toSet ==
        pts.map(p => (p.key, p.ts_us, p.value)).toSet)
    }
  }

  test("minhash permutations stay within [0, P) and respect containment") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 32) - 1))
    for (hs <- samples(gen, 30)) {
      val sigs = (0 until Dedup.NumHashes).map { i =>
        hs.map(h => (Dedup.mhA(i) * h + Dedup.mhB(i)) % Dedup.MinhashP).min
      }
      assert(sigs.forall(v => v >= 0 && v < Dedup.MinhashP))
      // adding an element can only lower (or keep) each min
      val sigsSuper = (0 until Dedup.NumHashes).map { i =>
        (hs :+ 12345L).map(h => (Dedup.mhA(i) * h + Dedup.mhB(i)) % Dedup.MinhashP).min
      }
      assert(sigs.zip(sigsSuper).forall { case (a, b) => b <= a })
    }
  }
}
