package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.core.{HelixStore, StoreOptions}

/** Model-based randomized store test: a seeded random sequence of
  * put / compact / blockCompact / outdate / reopen operations runs
  * against the store AND an in-memory last-write-wins model; after
  * every mutation the full visible state must match. This is the
  * reference's scan scaffold (src/db.rs) generalized to arbitrary
  * interleavings — compaction and retention must be invisible to
  * readers except through the outdate cutoff. */
class StoreModelSpec extends SparkTestBase {

  private val entrySchema = StructType(Seq(
    StructField("key", BinaryType), StructField("ts", LongType),
    StructField("value", BinaryType)))

  private def entriesDF(rows: Seq[(String, Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, t, v) => Row(k.getBytes, t, v.getBytes) }, 2),
      entrySchema)

  /** Full visible store state as (key, ts, value) triples. */
  private def stateOf(st: HelixStore): Set[(String, Long, String)] =
    st.toDF.collect().map { r =>
      (new String(r.getAs[Array[Byte]]("key")), r.getAs[Long]("ts"),
        new String(r.getAs[Array[Byte]]("value")))
    }.toSet

  /** Put a random batch through `st` and mirror it into `model`,
    * de-duped driver-side: the model has no within-batch order, the
    * store resolves (key, ts) ties by subseq — ONE place defines the
    * convention for every scenario. */
  private def putRandomBatch(st: HelixStore, rnd: scala.util.Random,
      keys: IndexedSeq[String], tsRange: Int, step: Int,
      model: mutable.Map[(String, Long), String]): Unit = {
    val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
      (keys(rnd.nextInt(keys.length)), rnd.nextInt(tsRange).toLong,
        s"v$step-${rnd.nextInt(1000)}")
    }
    val lastPer = batch.groupBy(e => (e._1, e._2)).map(_._2.last).toSeq
    st.put(entriesDF(lastPer))
    lastPer.foreach { case (k, t, v) => model((k, t)) = v }
  }

  private def runScenario(seed: Int, bucketSize: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = tmpDir(s"hs-model-$seed")
    val opts = StoreOptions(numShards = 2, bucketSize = bucketSize)
    var store = HelixStore.open(spark, dir, opts)
    // model: (key, ts) -> value, plus the outdate bucket cutoff.
    // outdate on a store with no data yet is a no-op (db.rs outdate
    // drops EXISTING levels; it is not a watermark on future writes),
    // so the model only honors cutoffs once something was written.
    val model = mutable.Map[(String, Long), String]()
    var minBucket = Long.MinValue
    var everPut = false
    val keys = (0 until 6).map(i => s"k$i")

    def visible: Set[(String, Long, String)] =
      model.iterator
        .filter { case ((_, ts), _) => ts / bucketSize >= minBucket }
        .map { case ((k, ts), v) => (k, ts, v) }.toSet

    def storeState: Set[(String, Long, String)] = stateOf(store)

    for (step <- 0 until 12) {
      rnd.nextInt(10) match {
        case n if n <= 4 => // put a small batch (dup (key,ts) overwrites)
          putRandomBatch(store, rnd, keys, tsRange = 100, step, model)
          everPut = true
        case 5 | 6 => store.compact()
        case 7 => store.blockCompact()
        case 8 =>
          val cut = rnd.nextInt(100).toLong
          store.outdate(cut)
          if (everPut) minBucket = math.max(minBucket, cut / bucketSize)
        case 9 => // reopen: a fresh instance must see identical state
          store.close()
          store = HelixStore.open(spark, dir, opts)
      }
      assert(storeState == visible,
        s"seed=$seed step=$step: store diverged from model " +
          s"(${storeState.size} vs ${visible.size} entries)")
      // batched-read parity through every store state (rick/blocks mix,
      // retention cutoffs, reopens): a random probe batch of present
      // and absent (key, ts) pairs must match the model exactly
      val probes: Seq[(Array[Byte], Long)] =
        keys.take(3).map(k =>
          (k.getBytes: Array[Byte], rnd.nextInt(100).toLong)) :+
          (("zz".getBytes: Array[Byte], 0L))
      store.multiGet(probes).zip(probes).foreach { case (got, (kb, ts)) =>
        val exp = model.get((new String(kb), ts))
          .filter(_ => ts / bucketSize >= minBucket)
        assert(got.map(new String(_)) == exp,
          s"seed=$seed step=$step: multiGet diverged at (${new String(kb)}, $ts)")
      }
    }
    store.close()
  }

  /** Two live instances on one path, mutating in random alternation —
    * the multi-writer scenario the seq ledger, pointer stamps, and
    * cross-process lock exist for. Both instances must agree with the
    * one model at every step: a duplicated seq (e.g. re-minting after
    * another instance's commit pruned the ledger) or a stale pointer
    * read shows up as an LWW inversion here. */
  private def runTwoInstanceScenario(seed: Int, bucketSize: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = tmpDir(s"hs-model2-$seed")
    val opts = StoreOptions(numShards = 2, bucketSize = bucketSize)
    val a = HelixStore.open(spark, dir, opts)
    val b = HelixStore.open(spark, dir, opts)
    val model = mutable.Map[(String, Long), String]()
    val keys = (0 until 5).map(i => s"m$i")

    for (step <- 0 until 12) {
      val actor = if (rnd.nextBoolean()) a else b
      rnd.nextInt(8) match {
        case n if n <= 4 => // put through a random instance
          putRandomBatch(actor, rnd, keys, tsRange = 60, step, model)
        case 5 => actor.compact()
        case 6 | 7 => actor.blockCompact()
      }
      val expected = model.iterator
        .map { case ((k, ts), v) => (k, ts, v) }.toSet
      assert(stateOf(a) == expected,
        s"seed=$seed step=$step: instance A diverged from model")
      assert(stateOf(b) == expected,
        s"seed=$seed step=$step: instance B diverged from model")
    }
    a.close(); b.close()
  }

  test("random op sequences keep the store equal to the LWW model (seed 101)") {
    runScenario(101, bucketSize = 10)
  }

  test("random op sequences keep the store equal to the LWW model (seed 202)") {
    runScenario(202, bucketSize = 25)
  }

  test("random op sequences keep the store equal to the LWW model (seed 303, tiny buckets)") {
    runScenario(303, bucketSize = 3)
  }

  test("two instances in random alternation agree with one LWW model (seed 404)") {
    runTwoInstanceScenario(404, bucketSize = 10)
  }

  test("two instances in random alternation agree with one LWW model (seed 505, tiny buckets)") {
    runTwoInstanceScenario(505, bucketSize = 4)
  }
}
