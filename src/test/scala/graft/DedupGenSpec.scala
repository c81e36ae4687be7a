package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupGen}

/** The dedup index generation lifecycle (verdict r18 #4): the staged
  * signature store must absorb an arrival slice as a COMMITTED delta
  * generation — base referenced, never rewritten — through the IvfGen
  * pointer protocol (crash-injected at every named step), and the
  * capped miner served from base ∪ delta must be BIT-EQUAL to the
  * from-scratch rebuild. */
class DedupGenSpec extends SparkTestBase {

  private case class Boom(point: String)
    extends RuntimeException(s"injected crash at $point")

  private val isNew = col("doc_id") % Dedup.IncrMod === Dedup.IncrRem

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  // ---- the committed generation IS the from-scratch store ---------------

  test("dedup_index_commit == the from-scratch capped miner, bit-equal") {
    val committed = rows(DedupGen.dedupIndexCommit(spark, Sf))
    val scratch = rows(Dedup.minhashLshCapped(spark, Sf))
    assert(committed == scratch,
      s"committed capped pairs diverge from the from-scratch rebuild: " +
        s"only-committed=${(committed -- scratch).take(3)} " +
        s"only-scratch=${(scratch -- committed).take(3)}")
  }

  test("commit I/O ∝ arrivals: base is referenced (not rewritten) and the delta is arrival-sized") {
    val g = DedupGen.ensureCommitted(spark, Sf)
    val p = g.pointer()
    assert(p.gen == 2L && p.base == "base" && p.delta.contains("g-2"))
    val root = Paths.get(g.resolve(""))
    // the delta's hset covers exactly the arrival slice
    val deltaIds = spark.read
      .parquet(root.resolve("g-2/hset").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val arrivalIds = graft.core.Tables.documents(spark, Sf)
      .filter(isNew).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deltaIds == arrivalIds,
      "the delta generation must hold the arrival slice's signatures exactly")
    // base holds the historical slice only — the commit never
    // re-shingled or rewrote it
    val baseIds = spark.read.parquet(root.resolve("base/hset").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(baseIds.intersect(arrivalIds).isEmpty,
      "base must stay the historical slice — a commit may never rewrite it")
    // every fresh rep pair touches at least one NEW rep (old × old is
    // base state, never re-mined)
    val newReps = spark.read.parquet(root.resolve("g-2/gset").toString)
      .filter(col("cgen") === 2L && col("doc_id") === col("rep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    spark.read.parquet(root.resolve("g-2/reppairs").toString)
      .collect().foreach { r =>
        assert(newReps.contains(r.getLong(0)) || newReps.contains(r.getLong(1)),
          s"delta pair (${r.getLong(0)}, ${r.getLong(1)}) re-mined base state")
      }
  }

  // ---- crash injection at every commit step ------------------------------

  test("crash at each commit step: reopen always serves one complete generation") {
    // the base store once, outside the crash loop (build ≠ commit)
    val baseSrc = Paths.get(DedupGen.ensureCommitted(spark, Sf)
      .resolve("base"))
    val expectedAfter = rows(DedupGen.dedupIndexCommit(spark, Sf))
    for (point <- Seq("commit:staged", "pointer:tmp-written",
        "commit:pointer-durable", "commit:buried")) {
      val root = tmpDir("dedupgen-crash")
      val g = new DedupGen(root)
      g.open(baseSrc.toString) // external absolute base
      val before = rows(g.cappedPairs(spark))
      g.crashHook = n => if (n == point) throw Boom(point)
      intercept[Boom] { g.commitArrivals(spark, Sf, isNew) }
      val g2 = new DedupGen(root)
      val p = g2.open(baseSrc.toString)
      val served = rows(g2.cappedPairs(spark))
      val durable = point == "commit:pointer-durable" || point == "commit:buried"
      if (durable) {
        assert(p.gen == 2L, s"$point: pointer was durable, gen must be 2")
        assert(served == expectedAfter, s"$point: must serve the new generation")
      } else {
        assert(p.gen == 1L, s"$point: pointer not durable, gen must stay 1")
        assert(served == before, s"$point: must serve the old generation")
        assert(!Files.exists(Paths.get(root, "g-2")),
          s"$point: recovery must roll back the crashed swap's orphan dir")
        // the rolled-back root must accept a clean retry
        g2.commitArrivals(spark, Sf, isNew)
        assert(rows(g2.cappedPairs(spark)) == expectedAfter,
          s"$point: retry after rollback must commit the same generation")
      }
      assert(!Files.exists(Paths.get(root, "_current.tmp")),
        s"$point: recovery must discard a stale pointer tmp")
    }
  }

  test("commit report: per-leg counts match a driver-side model of the commit") {
    val g = DedupGen.ensureCommitted(spark, Sf)
    val rep = DedupGen.dedupIndexCommitReport(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rep.keySet == Set("base", "delta"))
    // model the group/mint split from the staged hsets directly
    val root = Paths.get(g.resolve(""))
    def keysOf(sub: String): Map[Long, Seq[Long]] = spark.read
      .parquet(root.resolve(sub).toString)
      .select("doc_id", "hs").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("hs").sorted.toSeq).toMap
    val baseK = keysOf("base/hset")
    val deltaK = keysOf("g-2/hset")
    val baseGroups = baseK.values.toSet
    val mintedGroups = deltaK.values.filterNot(baseGroups).toSet
    assert(rep("base")._1 == baseK.size.toLong, "base n_docs")
    assert(rep("base")._2 == baseGroups.size.toLong, "base n_groups")
    assert(rep("delta")._1 == deltaK.size.toLong, "delta n_docs")
    assert(rep("delta")._2 == mintedGroups.size.toLong, "delta n_groups")
    // pair counts equal the staged artifacts' row counts, and the legs
    // partition the committed rep-pair space
    assert(rep("base")._3 ==
      spark.read.parquet(root.resolve("base/reppairs").toString).count())
    assert(rep("delta")._3 ==
      spark.read.parquet(root.resolve("g-2/reppairs").toString).count())
  }

  test("a later commit buries the superseded delta; vacuum reclaims it past retention") {
    val baseSrc = Paths.get(DedupGen.ensureCommitted(spark, Sf)
      .resolve("base"))
    val root = tmpDir("dedupgen-vacuum")
    val g = new DedupGen(root)
    g.open(baseSrc.toString)
    g.commitArrivals(spark, Sf, isNew)
    // a second commit with an EMPTY batch re-carries the delta
    g.commitArrivals(spark, Sf, isNew && lit(false))
    assert(g.pointer().gen == 3L && g.pointer().delta.contains("g-3"))
    assert(Files.exists(Paths.get(root, "g-2")),
      "bury must defer deletion, not delete at commit")
    val served = rows(g.cappedPairs(spark))
    g.vacuum(Long.MaxValue)
    assert(Files.exists(Paths.get(root, "g-2")),
      "inside the retention window the buried delta must survive vacuum")
    g.vacuum(0L)
    assert(!Files.exists(Paths.get(root, "g-2")),
      "vacuum past retention must reclaim the buried delta")
    assert(rows(g.cappedPairs(spark)) == served,
      "vacuum must not disturb the committed generation")
    // the re-carried delta serves the same state as the first commit
    assert(served == rows(DedupGen.dedupIndexCommit(spark, Sf)),
      "an empty commit must re-serve the same capped pairs")
  }
}
