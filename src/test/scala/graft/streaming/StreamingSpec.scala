package graft.streaming

import graft.SparkSpec
import graft.format.GraftDataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming append commits one snapshot per epoch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ds = GraftDataset.create(spark, tmpDir("stream"), StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    mem.addData((1L, "a"), (2L, "b"))
    val q = GraftStreaming.appendStream(
      mem.toDF.toDF("id", "v"), ds, tmpDir("ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(ds.toDF.count() == 3)
    // markers carry the per-query token (epoch-only markers would let an
    // earlier query's epoch 0 swallow a new query's first batch)
    val epochs = ds.log.map(_.message).filter(_.startsWith("stream["))
    assert(epochs.size >= 2) // one commit per non-empty micro-batch
    // each epoch is a time-travelable snapshot
    val afterFirst = ds.log.reverse.find(_.message.startsWith("stream[")).get
    assert(ds.snapshotAt(afterFirst.id).count() == 2)
  }

  test("resumed pre-token checkpoint replaying batch 0 fails loudly (ADVICE r13)") {
    implicit val sq = spark.sqlContext
    // the legacy table: bare 'stream epoch N' markers from the pre-token
    // helper, whose checkpoint crashed between the epoch-0 commit and the
    // checkpoint's commit-log write — resume replays batch 0 with nothing
    // to dedup against, so the guard must fire even at epoch == 0
    val legacyRoot = tmpDir("s-legacy0") + "/t"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val legacy = GraftDataset.create(spark, legacyRoot, schema)
    legacy.append(Seq((1L, "a")).toDF("id", "v"))
    legacy.commit("stream epoch 0")
    // build a REAL resumed-at-batch-0 checkpoint: run one batch against a
    // scratch table, then drop the checkpoint's commit log so restart
    // replays batch 0
    val ckpt = tmpDir("s-legacy0-ckpt")
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"))
    val scratch = GraftDataset.create(spark, tmpDir("s-legacy0-scratch") + "/t",
      schema)
    val q0 = GraftStreaming.appendStream(mem.toDF.toDF("id", "v"), scratch,
      ckpt, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q0.processAllAvailable(); q0.stop()
    val commitsDir = new java.io.File(ckpt, "commits")
    commitsDir.listFiles().foreach(f => assert(f.delete()))
    // restart against the LEGACY table: offsets exist (resumed), batch 0
    // replays, no token marker in the legacy log, bare markers present
    val q1 = GraftStreaming.appendStream(mem.toDF.toDF("id", "v"), legacy,
      ckpt, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("FRESH checkpoint")), s"got: $err")
    assert(GraftDataset.load(spark, legacyRoot).toDF.count() == 1,
      "no silent duplicate append")
    // a genuinely FRESH checkpoint at epoch 0 on the same legacy table is
    // NOT blocked — old bare markers must not brick new streams
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((2L, "b"))
    val q2 = GraftStreaming.appendStream(mem2.toDF.toDF("id", "v"),
      GraftDataset.load(spark, legacyRoot), tmpDir("s-legacy0-fresh"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q2.processAllAvailable(); q2.stop()
    assert(GraftDataset.load(spark, legacyRoot).toDF.count() == 2)
  }

  test("watermarked windowed counts over a memory stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val counts = GraftStreaming.windowedCounts(
      mem.toDF.toDF("ts", "k"), "ts", "k", "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("update").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    mem.addData((t(1), "a"), (t(2), "a"), (t(11), "b"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wc").as[(java.sql.Timestamp, String, Long)]
      .collect().map(r => (r._2, r._3)).toSet
    assert(out == Set(("a", 2L), ("b", 1L)))
  }

  test("streamed epochs feed incremental index maintenance") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ds = GraftDataset.create(spark, tmpDir("stream-idx"), StructType(Seq(
      StructField("id", LongType), StructField("text", StringType))))
    mem.addData((1L, "spark streaming index"), (2L, "batch only"))
    val q = GraftStreaming.appendStream(
      mem.toDF.toDF("id", "text"), ds, tmpDir("ckpt-idx"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()
    ds.reset() // pick up the stream's commits in this handle
    ds.checkout("main")
    ds.createIndexVectorized("text")
    // next epoch arrives → index is stale → delta update, not a rebuild
    mem.addData((3L, "late streaming row"))
    q.processAllAvailable()
    q.stop()
    ds.checkout("main")
    assert(!ds.indexFresh("inverted", "text"))
    ds.updateIndexVectorized("text")
    assert(ds.indexFresh("inverted", "text"))
    assert(ds.textSearch("text", "streaming").select("id")
      .as[Long].collect().toSet == Set(1L, 3L))
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val deduped = GraftStreaming.dedupStream(
      mem.toDF.toDF("ts", "id", "v"), "ts", "10 minutes", Seq("id"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    mem.addData((t(1), 1L, "a"), (t(1), 1L, "dup"), (t(2), 2L, "b"),
      (t(3), 1L, "dup-within-watermark"))
    q.processAllAvailable()
    q.stop()
    // id 1 seen three times within the horizon → kept once
    assert(spark.table("dd").count() == 2)
    assert(spark.table("dd").filter($"id" === 1L).count() == 1)
  }

  test("stateful sessionization matches the window formulation") {
    val rnd = new scala.util.Random(11)
    val events = (1L to 5L).flatMap { u =>
      var t = u * 1000L
      (0 until 40).map { _ =>
        t += 1000L + rnd.nextInt(1200000) // gaps up to 20 min
        Sessionize.Event(u, t)
      }
    }
    val gap = 600000L // 10 min
    val stateful = Sessionize.sessions(events.toDS(), gap).collect()
      .groupBy(_.userId).view
      .mapValues(_.sortBy(_.startMs).map(s => (s.nEvents, s.startMs, s.endMs)).toSeq)
      .toMap
    // window formulation (the q33 shape): lag gap flag + running sum
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("userId").orderBy("tsMs")
    val windowed = events.toDF("userId", "tsMs")
      .withColumn("flag",
        when(col("tsMs") - lag("tsMs", 1).over(w) > gap, 1).otherwise(0))
      .withColumn("sid", sum("flag").over(w))
      .groupBy("userId", "sid")
      .agg(count(lit(1)).as("n"), min("tsMs").as("start"), max("tsMs").as("end"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getAs[Long]("start"))
        .map(r => (r.getAs[Long]("n"), r.getAs[Long]("start"),
          r.getAs[Long]("end"))).toSeq)
      .toMap
    assert(stateful == windowed)
  }

  test("streaming sessionization: one session across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val gap = 30000L
    val ses = Sessionize.sessions(mem.toDS(), gap)
    val q = ses.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // user 1's events arrive over TWO micro-batches, all within the gap —
    // the broken NoTimeout version emitted a session per batch. (Times sit
    // above 0: the initial watermark is 0 and rows at-or-below the
    // watermark are dropped as late.)
    val t0 = 1000000L
    mem.addData(Sessionize.Event(1L, t0), Sessionize.Event(1L, t0 + 1000L))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(1L, t0 + 2000L))
    q.processAllAvailable()
    assert(spark.table("sess").count() == 0, "open session must stay open")
    // advance the watermark far past t0 + 2000 + gap, then trigger once
    // more so the event-time timeout fires
    mem.addData(Sessionize.Event(2L, t0 + 10000000L))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(2L, t0 + 20000000L))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sess").as[Sessionize.Session]
      .collect().filter(_.userId == 1L)
    assert(u1.toSeq == Seq(Sessionize.Session(1L, t0, t0 + 2000L, 3L)),
      s"exactly ONE session spanning both batches, got ${u1.toSeq}")
    // user 2's first session closed in-batch by its out-of-gap successor
    val u2 = spark.table("sess").as[Sessionize.Session]
      .collect().filter(_.userId == 2L)
    assert(u2.toSeq ==
      Seq(Sessionize.Session(2L, t0 + 10000000L, t0 + 10000000L, 1L)))
  }

  test("sessionization groups events by inactivity gap") {
    val events = Seq(
      Sessionize.Event(1L, 0L), Sessionize.Event(1L, 1000L),
      Sessionize.Event(1L, 100000L), // > 30s gap → new session
      Sessionize.Event(2L, 500L)).toDS()
    val ses = Sessionize.sessions(events, gapMs = 30000L)
      .collect().sortBy(s => (s.userId, s.startMs))
    assert(ses.map(s => (s.userId, s.nEvents)).toSeq ==
      Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    assert(ses.head.endMs == 1000L)
  }
}
