package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{IvfGen, IvfIndex, Similarity}

/** The IVF generation swap (verdict r17 #1): the committed artifact
  * must BE the rebalanced post-state (bit-equal probes), the commit
  * protocol must never tear under a crash at any named step (a reader
  * reopening the root always resolves ONE complete generation — the
  * reference's level.rs:356 atomic rick → level contract), superseded
  * generations fall to graveyard + vacuum, and the recall gate that
  * justified the rebalance must still hold POST-swap, measured on the
  * committed artifact itself. */
class IvfGenSpec extends SparkTestBase {

  private case class Boom(point: String)
    extends RuntimeException(s"injected crash at $point")

  // ---- driver-side model of the rebalance contract (the same replay
  // OperatorSpec pins ann_ivf_rebalance's report to) -------------------

  private def d(x: Array[Double], y: Array[Double]) =
    x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
  private def cos(a: Array[Double], b: Array[Double]) =
    d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
  private def rcos6(a: Array[Double], b: Array[Double]): Double =
    BigDecimal(cos(a, b)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val all: Array[(Long, Int, Array[Double])] =
    graft.core.Tables.embeddings(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
      .sortBy(_._1)

  private def assign(v: Array[Double], cs: Seq[(Int, Array[Double])]): Int =
    cs.map { case (l, c) => (rcos6(v, c), l) }
      .minBy { case (c, l) => (-c, l) }._2

  /** The committed post-state per the rebalance contract: refreshed
    * centroids and the membership where ONLY drifted cells' vectors
    * (members + their arrivals) re-home against the refreshed set. */
  private lazy val model: (Seq[(Int, Array[Double])], // old centroids
      Seq[(Int, Array[Double])],                      // refreshed centroids
      Map[Int, Seq[(Long, Array[Double])]],           // membership before
      Map[Int, Seq[(Long, Array[Double])]]) = {       // membership after
    val (mod, rem) = (IvfIndex.IncrMod, IvfIndex.IncrRem)
    val old = all.filter(_._1 % mod != rem)
    val arr = all.filter(_._1 % mod == rem)
    val cents: Seq[(Int, Array[Double])] = old.groupBy(_._2).toSeq
      .map { case (lbl, g) =>
        lbl -> (0 until 64).map(j => g.map(_._3(j)).sum / g.size).toArray
      }.sortBy(_._1)
    val oldAssign = old.map { case (id, _, v) => (id, v, assign(v, cents)) }
    val arrAssign = arr.map { case (id, _, v) => (id, v, assign(v, cents)) }
    val nOld = oldAssign.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nArr = arrAssign.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ncv: Seq[(Int, Array[Double], Double)] = cents.map { case (l, cv) =>
      val no = nOld.getOrElse(l, 0L)
      val na = nArr.getOrElse(l, 0L)
      val sa = (0 until 64).map(j =>
        arrAssign.filter(_._3 == l).map(_._2(j)).sum).toArray
      val nc = (0 until 64).map(j => (cv(j) * no + sa(j)) / (no + na)).toArray
      val shift = BigDecimal(1.0 - cos(cv, nc))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (l, nc, shift)
    }
    val drifted = ncv.sortBy { case (l, _, s) => (-s, l) }
      .take(Similarity.RebDriftCells).map(_._1).toSet
    val newCents = ncv.map { case (l, nc, _) => (l, nc) }
    val memBefore = (oldAssign ++ arrAssign).groupBy(_._3).view
      .mapValues(_.map(m => (m._1, m._2)).toSeq).toMap
    val memAfter = (oldAssign ++ arrAssign).map { case (id, v, oc) =>
      (id, v, if (drifted(oc)) assign(v, newCents) else oc)
    }.groupBy(_._3).view.mapValues(_.map(m => (m._1, m._2)).toSeq).toMap
    (cents, newCents, memBefore.toMap, memAfter.toMap)
  }

  /** Driver probe: nprobe cells by (rcos6 desc, cell), top-k candidates
    * by (exact cos desc, vec_id) — the engine's exact order. */
  private def probe(qv: Array[Double], qid: Long, nprobe: Int, k: Int,
      cs: Seq[(Int, Array[Double])],
      mem: Map[Int, Seq[(Long, Array[Double])]]): Seq[Long] = {
    val cells = cs.map { case (l, c) => (rcos6(qv, c), l) }
      .sortBy { case (c, l) => (-c, l) }.take(nprobe).map(_._2)
    cells.flatMap(mem.getOrElse(_, Seq.empty))
      .filter(_._1 != qid)
      .map { case (id, v) => (cos(v, qv), id) }
      .sortBy { case (c, id) => (-c, id) }.take(k).map(_._2)
  }

  private def probeRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._2)

  // ---- the committed artifact IS the rebalanced frame -----------------

  test("committed probe == the rebalance post-state probed directly") {
    val (_, newCents, _, memAfter) = model
    val qv = all.find(_._1 == 0L).get._3
    val direct = probe(qv, 0L, nprobe = 2, k = 10, newCents, memAfter)
      .zipWithIndex.map { case (id, i) => (id, i + 1) }
    val committed = probeRows(Similarity.annIvfCommit(spark, Sf))
    assert(committed == direct,
      s"post-swap probe $committed != direct rebalanced-frame probe $direct")
  }

  test("committed pointer: gen advanced, drift cells dropped, delta present") {
    val g = IvfGen.ensureCommitted(spark, Sf)
    val p = g.pointer()
    assert(p.gen == 2L)
    assert(p.dropped.size == Similarity.RebDriftCells)
    assert(p.delta.isDefined)
    // committed list set partitions the corpus exactly once
    val ids = g.lists(spark).select("vec_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "a vector appears in two lists")
    assert(ids.toSet == all.map(_._1).toSet,
      "committed generation must cover the whole corpus exactly")
  }

  test("commit report: whole-corpus coverage, drift cells serve delta-only") {
    val (_, _, _, memAfter) = model
    val g = IvfGen.ensureCommitted(spark, Sf)
    val dropped = g.pointer().dropped.toSet
    val rep = Similarity.annIvfCommitReport(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep.values.map(_._3).sum == all.length.toLong,
      "report totals must cover the whole corpus exactly once")
    rep.foreach { case (cell, (nBase, nDelta, nTotal)) =>
      assert(nTotal == nBase + nDelta, s"cell $cell legs must sum")
      if (dropped(cell.toInt))
        assert(nBase == 0L, s"dropped cell $cell must serve delta rows only")
      assert(nTotal == memAfter.getOrElse(cell.toInt, Seq.empty).size.toLong,
        s"cell $cell total must equal the modelled post-state membership")
    }
  }

  // ---- crash injection at every commit step ----------------------------

  test("crash at each commit step: reopen always serves one complete generation") {
    val (centPath, basePath) = IvfIndex.ensureIndexed(spark, Sf)
    val expectedAfter = probeRows(Similarity.annIvfCommit(spark, Sf))
    for (point <- Seq("commit:staged", "pointer:tmp-written",
        "commit:pointer-durable", "commit:buried")) {
      val root = tmpDir(s"ivfgen-crash")
      val g = new IvfGen(root)
      g.open(centPath, basePath)
      val before = probeRows(Similarity.commitProbe(spark, Sf, g))
      g.crashHook = n => if (n == point) throw Boom(point)
      intercept[Boom] {
        g.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf))
      }
      // a FRESH open models the post-crash reader: recovery must leave
      // exactly one complete generation
      val g2 = new IvfGen(root)
      val p = g2.open(centPath, basePath)
      val served = probeRows(Similarity.commitProbe(spark, Sf, g2))
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
        g2.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf))
        assert(probeRows(Similarity.commitProbe(spark, Sf, g2)) == expectedAfter,
          s"$point: retry after rollback must commit the same generation")
      }
      assert(!Files.exists(Paths.get(root, "_current.tmp")),
        s"$point: recovery must discard a stale pointer tmp")
    }
  }

  test("crash between pointer swap and bury on a LATER commit: recovery graveyards (not deletes) the superseded dirs") {
    val (centPath, basePath) = IvfIndex.ensureIndexed(spark, Sf)
    val root = tmpDir("ivfgen-bury")
    val g = new IvfGen(root)
    g.open(centPath, basePath)
    g.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf))
    // second commit (empty arrivals — pure drift re-rank) crashes after
    // the pointer is durable but before gen-2 is graveyarded (the
    // "commit:pointer-durable" hook sits exactly in that window)
    g.crashHook = n => if (n == "commit:pointer-durable") throw Boom(n)
    intercept[Boom] {
      g.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf).filter(lit(false)))
    }
    val g2 = new IvfGen(root)
    val p = g2.open(centPath, basePath)
    assert(p.gen == 3L, "second commit's pointer was durable")
    // gen-2's dirs are unreferenced and unburied — but an EARLIER
    // committed pointer referenced them, so a stale reader in another
    // JVM may still hold a plan over them: recovery must BURY them
    // (restoring the retention-gated vacuum window), never delete
    // outright (advice r18 — immediate deletion is only for dirs NEWER
    // than the committed generation, i.e. crashed attempts)
    assert(Files.exists(Paths.get(root, "g-2")),
      "recovery must graveyard, not delete, a superseded-but-unburied generation")
    g2.vacuum(Long.MaxValue)
    assert(Files.exists(Paths.get(root, "g-2")),
      "inside the retention window the graveyarded generation must survive vacuum")
    g2.vacuum(0L)
    assert(!Files.exists(Paths.get(root, "g-2")),
      "vacuum past retention must reclaim the recovered graveyard entry")
    assert(g2.lists(spark).count() == all.length.toLong,
      "the served generation must still cover the whole corpus")
  }

  // ---- graveyard + vacuum ----------------------------------------------

  test("a later commit buries the superseded generation; vacuum reclaims it") {
    val (centPath, basePath) = IvfIndex.ensureIndexed(spark, Sf)
    val root = tmpDir("ivfgen-vacuum")
    val g = new IvfGen(root)
    g.open(centPath, basePath)
    g.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf))
    g.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf).filter(lit(false)))
    // superseded but NOT yet deleted: a lazily-materializing reader plan
    // may still reference gen-2 (the snapshot-retention discipline)
    assert(Files.exists(Paths.get(root, "g-2")),
      "bury must defer deletion, not delete at commit")
    val served = g.lists(spark).count()
    g.vacuum(0L)
    assert(!Files.exists(Paths.get(root, "g-2")),
      "vacuum(0) must physically reclaim the graveyarded generation")
    assert(Files.exists(Paths.get(root, "g-3")))
    assert(g.lists(spark).count() == served,
      "vacuum must not disturb the committed generation")
  }

  // ---- tombstone commits (verdict r18 #5) -------------------------------

  test("ann_ivf_gen_delete: committed tombstone probe == probing the filtered post-state, all 50 queries") {
    val (_, newCents, _, memAfter) = model
    val memDeleted = memAfter.view.mapValues(_.filterNot { case (id, _) =>
      id % IvfGen.GenTombMod == IvfGen.GenTombRem }).toMap
    // the registered query's single probe, bit-equal
    val got = probeRows(Similarity.annIvfGenDelete(spark, Sf))
    val want = probe(all.find(_._1 == 0L).get._3, 0L, 2, 10, newCents, memDeleted)
      .zipWithIndex.map { case (id, i) => (id, i + 1) }
    assert(got == want, s"post-delete probe $got != filtered post-state $want")
    // the recall re-gate in its exact form: EVERY query of the recall
    // set must serve exactly the filtered post-state's probe (subsumes
    // a recall floor — the tombstoned index cannot drift from the
    // deleted corpus anywhere in the probe set)
    val g = IvfGen.ensureCommittedDeleted(spark, Sf)
    val centsAfter: Seq[(Int, Array[Double])] = g.centroids(spark).collect()
      .map(r => (r.getAs[Int]("clabel"),
        r.getAs[scala.collection.Seq[Double]]("cv").toArray)).sortBy(_._1)
    val memCommitted: Map[Int, Seq[(Long, Array[Double])]] =
      g.lists(spark).collect()
        .map(r => (r.getAs[Int]("assigned_label"), (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Double]]("v").toArray)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (0L until 50L).foreach { qid =>
      val qv = all.find(_._1 == qid).get._3
      assert(probe(qv, qid, 3, 10, centsAfter, memCommitted)
        == probe(qv, qid, 3, 10, newCents, memDeleted),
        s"query $qid: committed tombstone probe diverges from the filtered post-state")
    }
  }

  test("commitDeletes I/O is ∝ deletes: every prior artifact is referenced, the new gen holds only tombs") {
    val g = IvfGen.ensureCommittedDeleted(spark, Sf)
    val p = g.pointer()
    assert(p.gen == 3L)
    assert(p.tombs.contains("g-3/tombs"))
    // centroids/base/delta/dropped carried over by REFERENCE — the
    // delete commit wrote no list or centroid bytes
    val prev = IvfGen.ensureCommitted(spark, Sf).pointer()
    assert(p.centroids == prev.centroids && p.base == prev.base
      && p.dropped == prev.dropped && p.delta == prev.delta,
      "a delete commit must not touch the list/centroid artifacts")
    val gen3 = Paths.get(g.resolve("g-3"))
    val entries = Files.list(gen3)
    val names = try {
      import scala.jdk.CollectionConverters._
      entries.iterator().asScala.map(_.getFileName.toString).toSet
    } finally entries.close()
    assert(names == Set("tombs"), s"gen-3 must hold only the tombstone list, got $names")
    // lists() excludes exactly the tombstoned ids
    val ids = g.lists(spark).select("vec_id").collect().map(_.getLong(0)).toSet
    val expect = all.map(_._1)
      .filterNot(id => id % IvfGen.GenTombMod == IvfGen.GenTombRem).toSet
    assert(ids == expect, "served ids must be corpus minus the committed tombstones")
  }

  test("crash at each commitDeletes step: reopen always serves one complete generation") {
    val (centPath, basePath) = IvfIndex.ensureIndexed(spark, Sf)
    val tombSlice = graft.core.Tables.embeddings(spark, Sf)
      .filter(pmod(col("vec_id"), lit(IvfGen.GenTombMod)) === IvfGen.GenTombRem)
      .select(col("vec_id"))
    for (point <- Seq("commit:staged", "pointer:tmp-written",
        "commit:pointer-durable", "commit:buried")) {
      val root = tmpDir("ivfgen-delcrash")
      val g = new IvfGen(root)
      g.open(centPath, basePath)
      g.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf))
      g.crashHook = n => if (n == point) throw Boom(point)
      intercept[Boom] { g.commitDeletes(spark, tombSlice) }
      val g2 = new IvfGen(root)
      val p = g2.open(centPath, basePath)
      val ids = g2.lists(spark).select("vec_id").collect().map(_.getLong(0)).toSet
      val durable = point == "commit:pointer-durable" || point == "commit:buried"
      if (durable) {
        assert(p.gen == 3L && p.tombs.isDefined, s"$point: delete commit was durable")
        assert(ids == all.map(_._1).filterNot(
          _ % IvfGen.GenTombMod == IvfGen.GenTombRem).toSet,
          s"$point: must serve the tombstoned generation")
      } else {
        assert(p.gen == 2L && p.tombs.isEmpty, s"$point: pointer not durable")
        assert(ids == all.map(_._1).toSet, s"$point: must serve the whole corpus")
        assert(!Files.exists(Paths.get(root, "g-3")),
          s"$point: recovery must roll back the crashed delete commit")
      }
    }
  }

  // ---- fold-back compaction (advice r18 #3) -----------------------------

  test("fold-back: an always-fold root serves bit-identical lists to a never-fold root, and resets delta") {
    val (centPath, basePath) = IvfIndex.ensureIndexed(spark, Sf)
    val rootFold = tmpDir("ivfgen-fold")
    val rootKeep = tmpDir("ivfgen-keep")
    val gf = new IvfGen(rootFold, foldFrac = 0.0) // every commit compacts
    val gk = new IvfGen(rootKeep, foldFrac = 2.0) // never compacts
    gf.open(centPath, basePath); gk.open(centPath, basePath)
    def served(g: IvfGen): Set[(Long, Int)] =
      g.lists(spark).select("vec_id", "assigned_label").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    for (round <- 1 to 2) {
      val arrivals =
        if (round == 1) IvfGen.arrivalSlice(spark, Sf)
        else IvfGen.arrivalSlice(spark, Sf).filter(lit(false))
      gf.commitRebalance(spark, arrivals)
      gk.commitRebalance(spark, arrivals)
      assert(served(gf) == served(gk),
        s"round $round: folded and unfolded roots must serve the same assignment")
      val pf = gf.pointer()
      assert(pf.base.startsWith(s"g-") && pf.dropped.isEmpty && pf.delta.isEmpty,
        s"round $round: a fold must own its base and reset dropped/delta")
      assert(gk.pointer().delta.isDefined,
        s"round $round: the never-fold root must keep accumulating delta")
    }
    // a fold also applies tombstones physically
    val tombSlice = graft.core.Tables.embeddings(spark, Sf)
      .filter(pmod(col("vec_id"), lit(IvfGen.GenTombMod)) === IvfGen.GenTombRem)
      .select(col("vec_id"))
    gf.commitDeletes(spark, tombSlice)
    gf.commitRebalance(spark, IvfGen.arrivalSlice(spark, Sf).filter(lit(false)))
    val pf = gf.pointer()
    assert(pf.tombs.isEmpty, "the fold must compact tombstones away")
    assert(served(gf).map(_._1) == all.map(_._1).filterNot(
      _ % IvfGen.GenTombMod == IvfGen.GenTombRem).toSet,
      "the folded base must physically exclude the tombstoned rows")
  }

  // ---- two-writer contention (verdict r18 #7) ---------------------------

  test("two concurrent committers serialize: each wins exactly one generation, no orphans survive") {
    val (centPath, basePath) = IvfIndex.ensureIndexed(spark, Sf)
    val root = tmpDir("ivfgen-race")
    val g0 = new IvfGen(root)
    g0.open(centPath, basePath)
    val sliceA = graft.core.Tables.embeddings(spark, Sf)
      .filter(col("vec_id") % 40 === 9).select(col("vec_id"))
    val sliceB = graft.core.Tables.embeddings(spark, Sf)
      .filter(col("vec_id") % 40 === 29).select(col("vec_id"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(sliceA, sliceB).map { sl =>
      new Thread(() => {
        try { new IvfGen(root).commitDeletes(spark, sl): Unit }
        catch { case e: Throwable => errs.add(e): Unit }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"a racing committer failed: ${errs.peek()}")
    val g = new IvfGen(root)
    val p = g.open(centPath, basePath)
    assert(p.gen == 3L, "two commits must land as exactly two generations")
    // the merged tombstone list is order-independent: each commit folds
    // the prior list in, so the winner's union is both slices
    val ids = g.lists(spark).select("vec_id").collect().map(_.getLong(0)).toSet
    // gen-1's base is the SLICED index (no rebalance commit ran here),
    // so the arrival slice is absent by construction
    val expect = all.map(_._1)
      .filter(_ % IvfIndex.IncrMod != IvfIndex.IncrRem)
      .filterNot(id => id % 40 == 9 || id % 40 == 29).toSet
    assert(ids == expect, "both racing delete sets must be served")
    g.vacuum(0L)
    val left = Files.list(Paths.get(root))
    val dirs = try {
      import scala.jdk.CollectionConverters._
      left.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("^g-[0-9]+$")).toSet
    } finally left.close()
    assert(dirs.forall(Set("g-2", "g-3").contains),
      s"no orphaned generation dir may survive vacuum, got $dirs")
  }

  // ---- recall re-gate, POST-swap, on the committed artifact ------------

  test("recall at nprobe 3 over 50 queries never decreases across the swap") {
    val (oldCents, _, memBefore, _) = model
    val g = IvfGen.ensureCommitted(spark, Sf)
    val centsAfter: Seq[(Int, Array[Double])] = g.centroids(spark).collect()
      .map(r => (r.getAs[Int]("clabel"),
        r.getAs[scala.collection.Seq[Double]]("cv").toArray)).sortBy(_._1)
    val memCommitted: Map[Int, Seq[(Long, Array[Double])]] =
      g.lists(spark).collect()
        .map(r => (r.getAs[Int]("assigned_label"), (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Double]]("v").toArray)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val RecallQ = 50L
    def recallOf(cs: Seq[(Int, Array[Double])],
        mem: Map[Int, Seq[(Long, Array[Double])]]): Int =
      (0L until RecallQ).map { qid =>
        val qv = all.find(_._1 == qid).get._3
        val got = probe(qv, qid, nprobe = 3, k = 10, cs, mem).toSet
        val brute = all.filter(_._1 != qid)
          .map { case (id, _, v) => (cos(v, qv), id) }
          .sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
        (got & brute).size
      }.sum
    val before = recallOf(oldCents, memBefore)
    val after = recallOf(centsAfter, memCommitted)
    assert(after >= before,
      s"the swap lost recall: $after/${10 * RecallQ} after vs $before before")
  }
}
