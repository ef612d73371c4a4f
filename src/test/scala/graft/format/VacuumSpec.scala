package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage reclamation: [[GraftDataset.vacuum]] (above-parity — Delta
  * VACUUM / Iceberg expire_snapshots analogue) and the purging
  * [[GraftDataset.deleteBranch]] (reference delete_branch,
  * version_control/functions.py:966-1041).
  */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("label", StringType),
    StructField("score", DoubleType)))

  private def freshTable(): GraftDataset = {
    val ds = GraftDataset.create(spark, tmpDir("vacuum"), schema)
    ds.append(Seq((0L, "a", 1.0), (1L, "b", 2.0), (2L, "c", 3.0))
      .toDF("id", "label", "score"))
    ds.commit("rows")
    ds
  }

  private def dataEntries(ds: GraftDataset): Seq[String] = {
    val f = CommitLog.fs(ds.spark, ds.root)
    val dir = new org.apache.hadoop.fs.Path(ds.root, "data")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(s => s"data/${s.getPath.getName}").toSeq.sorted
  }

  test("vacuum reclaims pre-compaction entries; live snapshot intact") {
    val ds = freshTable()
    ds.update($"id" === 1L, Map("score" -> lit(20.0)))
    ds.pop($"label" === "c")
    ds.commit("mutated")
    ds.compact()
    ds.commit("compacted")
    assert(dataEntries(ds).size == 4) // base + update + tombstone + compact

    // dry run: reports, deletes nothing
    val dry = ds.vacuum(olderThanMs = -60000L, dryRun = true)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(dataEntries(ds).size == 4)
    assert(dry.values.count(_ == "would_delete") == 3)
    assert(dry.values.count(_ == "kept_live") == 1)

    val rpt = ds.vacuum(olderThanMs = -60000L)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(rpt.values.count(_ == "deleted") == 3)
    assert(dataEntries(ds).size == 1)
    assert(ds.toDF.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((0L, "a", 1.0), (1L, "b", 20.0)))
  }

  test("retention window keeps just-written garbage (commit recency + mtime)") {
    val ds = freshTable()
    ds.compact(); ds.commit("compacted")
    val rpt = ds.vacuum(olderThanMs = 3600_000L)
      .collect().map(r => r.getString(2)).toSeq
    // the stranded base entry's commit is inside the window → protected
    assert(rpt.count(_ == "kept_live") == 2)
    assert(dataEntries(ds).size == 2)
  }

  test("orphan dirs from crashed writers: old ones reclaimed, fresh kept") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val orphanOld = new org.apache.hadoop.fs.Path(ds.root, "data/crash-old.parquet")
    val orphanNew = new org.apache.hadoop.fs.Path(ds.root, "data/crash-new.parquet")
    f.mkdirs(orphanOld); f.mkdirs(orphanNew)
    f.setTimes(orphanOld, System.currentTimeMillis() - 48 * 3600_000L, -1)
    val rpt = ds.vacuum(olderThanMs = 3600_000L)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(rpt("data/crash-old.parquet") == "deleted")
    assert(rpt("data/crash-new.parquet") == "kept_recent")
    assert(!f.exists(orphanOld) && f.exists(orphanNew))
  }

  test("staged uncommitted entries survive an aggressive vacuum") {
    val ds = freshTable()
    ds.append(Seq((9L, "z", 9.0)).toDF("id", "label", "score")) // staged only
    ds.vacuum(olderThanMs = -60000L)
    ds.commit("late commit")
    assert(ds.toDF.count() == 4)
  }

  test("CONCURRENT writer's staged files survive vacuum (mtime retention guard)") {
    // cross-handle interleaving (FormatFuzzSpec covers sequential ones):
    // a second handle — standing in for another JVM's writer — has
    // staged an append whose commit is not yet published. No commit
    // references those files and the maintenance handle's own staged
    // set does not contain them: ONLY the mtime-vs-retention guard
    // keeps them alive. With a sane window the write must land intact.
    val ds = freshTable()
    val writer = GraftDataset.load(spark, ds.root)
    writer.append(Seq((50L, "w", 5.0)).toDF("id", "label", "score"))
    val before = dataEntries(ds)
    val rep = ds.vacuum(olderThanMs = 30 * 60 * 1000L)
    assert(rep.filter(col("status") === "deleted").count() == 0,
      "nothing is old enough to die; the staged entry must be kept_recent")
    assert(dataEntries(ds) == before, "no staged file may vanish")
    writer.commit("in-flight writer lands after the vacuum")
    assert(GraftDataset.load(spark, ds.root).toDF.count() == 4)
    // truly interleaved: vacuum loops in one thread while a writer
    // stages + commits in another — every landed row must resolve
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val vacuumErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val sweeper = new Thread(() => {
      val h = GraftDataset.load(spark, ds.root)
      while (!stop.get())
        try h.vacuum(olderThanMs = 30 * 60 * 1000L)
        catch { case t: Throwable => vacuumErr.compareAndSet(null, t); stop.set(true) }
    })
    sweeper.start()
    try {
      val w2 = GraftDataset.load(spark, ds.root)
      for (i <- 0 until 5) {
        w2.append(Seq((100L + i, s"c$i", i.toDouble))
          .toDF("id", "label", "score"))
        w2.commit(s"racing commit $i")
      }
    } finally { stop.set(true); sweeper.join(30000) }
    assert(vacuumErr.get() == null,
      s"racing vacuum must not fail: ${vacuumErr.get()}")
    val finalRows = GraftDataset.load(spark, ds.root).toDF
      .select("id").as[Long].collect().toSet
    assert((100L until 105L).forall(finalRows.contains),
      s"every racing commit's rows must survive: $finalRows")
    assert(finalRows.size == 9)
  }

  test("vacuum races a REBASING mutation writer: staged update/pop files survive") {
    // r16 added mutation auto-rebase: an updater that loses the branch
    // CAS re-parents its staged update/tombstone entries onto the new
    // head. Between the CAS loss and the rebased publish those staged
    // files are referenced by NO commit — a racing vacuum sees them as
    // orphans, and only the mtime-vs-retention guard may keep them.
    val ds = freshTable()
    val mut = GraftDataset.load(spark, ds.root)
    assert(mut.update($"id" === 1L, Map("score" -> lit(99.0))) == 1L)
    // winner takes the head: mut's eventual commit MUST rebase
    ds.append(Seq((10L, "w", 4.0)).toDF("id", "label", "score"))
    val winId = ds.commit("winner append")
    // the sweep fires exactly in the vulnerable window
    val rep = GraftDataset.load(spark, ds.root)
      .vacuum(olderThanMs = 30 * 60 * 1000L)
    assert(rep.filter(col("status") === "deleted").count() == 0,
      "retention guard must keep the rebasing writer's staged entries")
    val rebasedId = mut.commit("enrichment lands after the sweep")
    assert(CommitLog.readCommit(spark, ds.root, rebasedId)
      .parent.contains(winId), "the mutation must have rebased")
    val after = GraftDataset.load(spark, ds.root).toDF
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(after == Seq((0L, "a", 1.0), (1L, "b", 99.0), (2L, "c", 3.0),
      (10L, "w", 4.0)), s"update lost to the vacuum: $after")

    // interleaved soak of the same race: a vacuum loop sweeps while an
    // enrichment writer keeps losing the CAS to an ingest writer and
    // rebasing updates + pops; every mutation must land
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val vacuumErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val sweeper = new Thread(() => {
      val h = GraftDataset.load(spark, ds.root)
      while (!stop.get())
        try { h.vacuum(olderThanMs = 30 * 60 * 1000L); () }
        catch { case t: Throwable =>
          vacuumErr.compareAndSet(null, t); stop.set(true) }
    })
    sweeper.start()
    try {
      val ingest = GraftDataset.load(spark, ds.root)
      for (i <- 0 until 4) {
        val enrich = GraftDataset.load(spark, ds.root)
        assert(enrich.update($"id" === 2L,
          Map("score" -> lit(100.0 + i))) == 1L)
        ingest.reset()
        ingest.append(Seq((200L + i, s"g$i", i.toDouble))
          .toDF("id", "label", "score"))
        ingest.commit(s"ingest wins $i") // takes the head first
        enrich.commit(s"enrichment rebases $i")
      }
    } finally { stop.set(true); sweeper.join(30000) }
    assert(vacuumErr.get() == null,
      s"racing vacuum must not fail: ${vacuumErr.get()}")
    val fin = GraftDataset.load(spark, ds.root)
    val rows = fin.toDF.orderBy("id").as[(Long, String, Double)]
      .collect().toSeq
    assert(rows.collect { case (2L, _, s) => s } == Seq(103.0),
      s"last rebased update must win: $rows")
    assert((0 until 4).forall(i => rows.exists(_._1 == 200L + i)),
      s"every ingest commit's row must survive: $rows")
    assert(fin.countRows == rows.size.toLong)
  }

  test("view and index pins protect their commits' files") {
    val ds = freshTable()
    ds.saveView("small", $"id" < 2L)
    val pinned = ds.head.get
    ds.compact(); ds.commit("compacted")
    ds.vacuum(olderThanMs = -60000L)
    // the pinned commit's base entry must still resolve
    assert(ds.loadView("small").count() == 2)
    assert(ds.snapshotAt(pinned).count() == 3)
  }

  test("time travel to a vacuumed commit fails cleanly; head unaffected") {
    val ds = freshTable()
    val old = ds.head.get
    ds.compact(); ds.commit("compacted")
    ds.vacuum(olderThanMs = -60000L)
    val e = intercept[IllegalStateException](ds.snapshotAt(old).count())
    assert(e.getMessage.contains("expired by vacuum"))
    val e2 = intercept[IllegalStateException](
      GraftDataset.loadCommit(spark, ds.root, old))
    assert(e2.getMessage.contains("expired by vacuum"))
    assert(ds.toDF.count() == 3)
    // commit metadata itself survives: DAG walks still work
    assert(ds.log.map(_.message).contains("rows"))
  }

  test("optimizeSmallFiles bin-packs small entries, leaves big ones alone") {
    val ds = freshTable()
    // five more tiny appends → six small base entries
    (10L to 14L).foreach { i =>
      ds.append(Seq((i, s"r$i", i * 1.0)).toDF("id", "label", "score"))
    }
    ds.commit("fragmented")
    val before = dataEntries(ds)
    assert(before.size == 6)
    val (inN, outN) = ds.optimizeSmallFiles(targetBytes = 1L << 20)
    val oid = ds.commit("optimized")
    assert(inN == 6 && outN == 1, s"expected one bin, got ($inN, $outN)")
    // rewrite-flag commit: streaming tails skip it
    assert(CommitLog.readCommit(spark, ds.root, oid).rewrite.contains(true))
    // snapshot identical, and the merged entry serves file skipping
    assert(ds.toDF.count() == 8)
    assert(ds.toDF.orderBy("id").as[(Long, String, Double)].collect().head ==
      ((0L, "a", 1.0)))
    val m = CommitLog.readCommit(spark, ds.root, oid)
    assert(m.files.size == 1 && m.stats.exists(_.nonEmpty),
      "merged entry must carry skipping stats")
    // a big entry above the target is NOT rewritten
    val ds2 = freshTable()
    ds2.append(Seq((50L, "x", 0.5)).toDF("id", "label", "score"))
    ds2.commit("one small extra")
    val bigEntry = dataEntries(ds2).head
    val (in2, out2) = ds2.optimizeSmallFiles(targetBytes = 1L)
    assert(in2 == 0 && out2 == 0, "nothing below a 1-byte target")
    assert(dataEntries(ds2).contains(bigEntry))
    // stranded pre-images reclaim through vacuum
    ds.vacuum(olderThanMs = -60000L)
    assert(dataEntries(ds).size == 1)
  }

  test("vacuum protects merge bases: diverged branches stay mergeable") {
    val ds = freshTable()
    ds.checkout("dev", create = true)
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    ds.commit("dev row")
    ds.compact(); ds.commit("dev compacted")
    ds.checkout("main")
    ds.append(Seq((20L, "m", 5.0)).toDF("id", "label", "score"))
    ds.commit("main row")
    ds.compact(); ds.commit("main compacted")
    // both sides rewrote everything: the LCA commit's entries are
    // referenced by NO branch head — only the merge-base pin keeps them
    ds.vacuum(olderThanMs = -60000L)
    ds.merge("dev") // reads the LCA's three-way base snapshot
    assert(ds.toDF.count() == 5, "merge after aggressive vacuum")
  }

  test("deleteBranch purges exclusive commits and data; guards hold") {
    val ds = freshTable()
    val mainHead = ds.head.get
    ds.checkout("dev", create = true)
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    val devCommit = ds.commit("dev row")
    assert(dataEntries(ds).size == 2)

    intercept[IllegalArgumentException](ds.deleteBranch("dev")) // current
    ds.checkout("main")
    intercept[IllegalArgumentException](ds.deleteBranch("main"))
    intercept[IllegalArgumentException](ds.deleteBranch("nope"))

    ds.deleteBranch("dev")
    assert(!ds.branches.contains("dev"))
    // exclusive commit + its append entry physically gone; main intact
    assert(!CommitLog.listCommits(spark, ds.root).contains(devCommit))
    assert(dataEntries(ds).size == 1)
    assert(ds.head.contains(mainHead) && ds.toDF.count() == 3)
  }

  test("deleteBranch of a merged branch drops the pointer, keeps shared data") {
    val ds = freshTable()
    ds.checkout("dev", create = true)
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    ds.commit("dev row")
    ds.checkout("main")
    ds.merge("dev")
    // merged: dev's head is now an ancestor of main → exclusive set is
    // empty → pointer-only delete succeeds (same as the reference's
    // fast-forward case where no data is exclusive)
    ds.deleteBranch("dev")
    assert(!ds.branches.contains("dev"))
    assert(ds.toDF.count() == 4)
  }

  test("stacked branch deletion purges each branch's exclusive data") {
    val ds = freshTable()
    ds.checkout("dev", create = true)
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    ds.commit("dev row")
    ds.checkout("sub", create = true) // sub-branch AT dev's head
    ds.append(Seq((11L, "e", 5.0)).toDF("id", "label", "score"))
    ds.commit("sub row")
    ds.checkout("main")
    // dev's head is reachable from sub → exclusive empty → pointer drop;
    // but deleting SUB first, then dev, must purge both data entries
    ds.deleteBranch("sub")
    ds.deleteBranch("dev")
    assert(dataEntries(ds).size == 1)
    assert(ds.toDF.count() == 3)
  }
}
