package graft.streaming

import graft.SparkSpec
import graft.format.{CommitLog, GraftDataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Cross-batch streaming dedup with format-persisted state: global
  * horizon, exactly-once across the sink/state table pair, crash
  * repair from the sink's own commit log.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def roots() = (tmpDir("sd-sink"), tmpDir("sd-state"))

  test("stream dedups across micro-batches with unbounded horizon") {
    implicit val sq = spark.sqlContext
    val (sink, state) = roots()
    val mem = MemoryStream[(Long, String)]
    mem.addData((0L, "alpha doc"), (1L, "beta doc"), (2L, "alpha doc"))
    val q = StreamingDedup.start(mem.toDF.toDF("id", "t"), "t", "id",
      sink, state, tmpDir("sd-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable() // batch 0: within-batch dup (id 2) drops
    mem.addData((3L, "alpha doc"), (4L, "gamma doc")) // 3 dups batch-0 row
    q.processAllAvailable()
    mem.addData((5L, "beta doc"), (6L, "delta doc"))
    q.processAllAvailable()
    q.stop()
    val got = GraftDataset.load(spark, sink).toDF
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 1L, 4L, 6L))
    // state digest matches the surviving corpus exactly
    assert(GraftDataset.load(spark, state).toDF.count() == 4)
  }

  test("replayed epoch is a no-op (exactly-once under checkpoint recovery)") {
    val (sink, state) = roots()
    val b0 = Seq((0L, "one doc"), (1L, "two doc")).toDF("id", "t")
    StreamingDedup.processBatch(b0, 0L, "tok", sink, state, "t", "id",
      StreamingDedup.exactFamily)
    // engine redelivers epoch 0 after a checkpoint-recovery restart
    StreamingDedup.processBatch(b0, 0L, "tok", sink, state, "t", "id",
      StreamingDedup.exactFamily)
    assert(GraftDataset.load(spark, sink).toDF.count() == 2)
    assert(GraftDataset.load(spark, state).toDF.count() == 2)
  }

  test("crash between sink and state commits is repaired exactly") {
    val (sink, state) = roots()
    val fam = StreamingDedup.exactFamily
    StreamingDedup.processBatch(
      Seq((0L, "first doc")).toDF("id", "t"), 0L, "tok", sink, state,
      "t", "id", fam)
    // simulate the crash window of epoch 1: sink commit lands, state
    // commit never happens — do it by hand with the same marker
    val sinkDs = GraftDataset.load(spark, sink)
    sinkDs.append(Seq((1L, "second doc")).toDF("id", "t"))
    sinkDs.commit("dedup[tok] batch 1")
    assert(GraftDataset.load(spark, state).toDF.count() == 1) // state behind
    // next batch: 2 dups the never-digested "second doc", 3 is new —
    // repair must resurrect epoch 1's fingerprints BEFORE deduping
    StreamingDedup.processBatch(
      Seq((2L, "second doc"), (3L, "third doc")).toDF("id", "t"),
      2L, "tok", sink, state, "t", "id", fam)
    val ids = GraftDataset.load(spark, sink).toDF
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L, 3L), s"dup id 2 must drop after repair: $ids")
    // state caught up: epochs 0,1,2 all digested, markers preserved
    val st = GraftDataset.load(spark, state)
    assert(st.toDF.count() == 3)
    assert(st.log.map(_.message).count(_.startsWith("dedup[tok]")) == 3)
  }

  test("crash after the FIRST sink commit: state table created by repair") {
    val (sink, state) = roots()
    val fam = StreamingDedup.exactFamily
    // simulate batch 0 crashing between its two commits: the sink table
    // exists with the epoch-0 marker, the state table was NEVER created
    val first = Seq((0L, "first doc"), (1L, "first doc")).toDF("id", "t")
    val surv = fam.survivors(fam.stateOf(first.limit(0), "t", "id"),
      first, "t", "id")
    val sinkDs = GraftDataset.create(spark, sink, surv.schema)
    sinkDs.append(surv)
    sinkDs.commit("dedup[tok] batch 0")
    assert(!CommitLog.readBranches(spark, state).contains("main"))
    // the engine replays epoch 0, then advances: repair must CREATE the
    // state table and absorb epoch 0 instead of wedging on load()
    StreamingDedup.processBatch(first, 0L, "tok", sink, state,
      "t", "id", fam)
    StreamingDedup.processBatch(
      Seq((2L, "first doc"), (3L, "new doc")).toDF("id", "t"),
      1L, "tok", sink, state, "t", "id", fam)
    val ids = GraftDataset.load(spark, sink).toDF
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 3L), s"repair must dedup against epoch 0: $ids")
    assert(GraftDataset.load(spark, state).toDF.count() == 2)
  }

  test("marker-matched pair read is consistent inside the crash window") {
    val (sink, state) = roots()
    val fam = StreamingDedup.exactFamily
    StreamingDedup.processBatch(
      Seq((0L, "first doc"), (1L, "other doc")).toDF("id", "t"),
      0L, "tok", sink, state, "t", "id", fam)
    // crash window of epoch 1: sink commit lands, state never follows
    val sinkDs = GraftDataset.load(spark, sink)
    sinkDs.append(Seq((2L, "third doc")).toDF("id", "t"))
    sinkDs.commit("dedup[tok] batch 1")
    val stateDs = GraftDataset.load(spark, state)

    // the follower is behind: epoch 1 resolves on the sink only
    assert(sinkDs.commitForMessage("dedup[tok] batch 1").isDefined)
    assert(stateDs.commitForMessage("dedup[tok] batch 1").isEmpty)
    intercept[IllegalArgumentException] {
      stateDs.snapshotAtMessage("dedup[tok] batch 1")
    }

    // the newest marker present on BOTH tables pins a consistent pair:
    // the state snapshot digests the sink snapshot exactly, row for row
    val m = "dedup[tok] batch 0"
    val pairSink = sinkDs.snapshotAtMessage(m)
    val pairState = stateDs.snapshotAtMessage(m)
    assert(pairSink.count() == 2 && pairState.count() == 2)
    val sinkFps = pairSink
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("t")).as("_fp"))
    assert(sinkFps.except(pairState.select("_fp")).isEmpty &&
      pairState.select("_fp").except(sinkFps).isEmpty,
      "pinned state must digest exactly the pinned sink's rows")
    // while the LIVE pair is inconsistent mid-window (sink 3, state 2)
    assert(sinkDs.toDF.count() == 3 && stateDs.toDF.count() == 2)
    // duplicate markers resolve newest-first: recommitting the epoch-0
    // marker (allow_empty) must win over the original
    val dup = stateDs.commit(m, allowEmpty = true)
    assert(GraftDataset.load(spark, state).commitForMessage(m)
      .contains(dup))
  }

  test("simhash family: near-dup shadowing across batches") {
    val (sink, state) = roots()
    val fam = StreamingDedup.simHashFamily(maxHamming = 3)
    StreamingDedup.processBatch(
      Seq((0L, "gamma corpus document that later batches will repeat"))
        .toDF("id", "t"), 0L, "tok", sink, state, "t", "id", fam)
    StreamingDedup.processBatch(
      Seq((1L, "gamma corpus document that later batches will repeat"),
          (2L, "an entirely different piece of text with new words"))
        .toDF("id", "t"), 1L, "tok", sink, state, "t", "id", fam)
    assert(GraftDataset.load(spark, sink).toDF
      .select("id").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
  }
}
