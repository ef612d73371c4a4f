package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** CRUD + snapshot semantics of the versioned table format
  * (mirrors reference tests/integration/dataset + version_control areas).
  */
class GraftDatasetSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("label", StringType),
    StructField("score", DoubleType)))

  private def freshTable(): GraftDataset = {
    val ds = GraftDataset.create(spark, tmpDir("graft"), schema)
    ds.append(Seq((0L, "a", 1.0), (1L, "b", 2.0), (2L, "c", 3.0))
      .toDF("id", "label", "score"))
    ds.commit("rows")
    ds
  }

  test("create + append + read roundtrip") {
    val ds = freshTable()
    val got = ds.toDF.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, "a", 1.0), (1L, "b", 2.0), (2L, "c", 3.0)))
    assert(ds.toDF.columns.toSeq == Seq("id", "label", "score")) // _uuid hidden
  }

  test("append with missing columns null-backfills (skip_ok)") {
    val ds = freshTable()
    ds.append(Seq(3L).toDF("id"))
    ds.commit("partial")
    val r = ds.toDF.filter($"id" === 3L).head()
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("update rewrites matching rows, last update wins") {
    val ds = freshTable()
    assert(ds.update($"id" === 1L, Map("score" -> lit(20.0))) == 1L)
    assert(ds.update($"id" === 1L, Map("score" -> lit(30.0))) == 1L)
    ds.commit("updates")
    assert(ds.toDF.filter($"id" === 1L).head().getDouble(2) == 30.0)
    assert(ds.toDF.count() == 3)
  }

  test("pop deletes rows; compact collapses the manifest") {
    val ds = freshTable()
    assert(ds.pop($"label" === "b") == 1L)
    ds.commit("popped")
    assert(ds.toDF.count() == 2)
    ds.compact()
    ds.commit("compacted")
    assert(ds.toDF.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((0L, "a", 1.0), (2L, "c", 3.0)))
  }

  test("schema evolution: createTensor, renameTensor, deleteTensor") {
    val ds = freshTable()
    ds.createTensor("extra", IntegerType)
    ds.commit("add col")
    assert(ds.toDF.filter($"extra".isNotNull).count() == 0)
    ds.append(spark.createDataFrame(
      java.util.List.of(Row(9L, "z", 0.5, 7)),
      StructType(schema.fields :+ StructField("extra", IntegerType))))
    ds.commit("row with extra")
    assert(ds.toDF.filter($"extra" === 7).count() == 1)
    ds.renameTensor("extra", "bonus")
    ds.commit("rename")
    assert(ds.toDF.filter($"bonus" === 7).count() == 1)
    ds.deleteTensor("bonus")
    ds.commit("drop")
    assert(!ds.toDF.columns.contains("bonus"))
  }

  test("branching, checkout, log, time travel, reset") {
    val ds = freshTable()
    val c1 = ds.head.get
    ds.checkout("dev", create = true)
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    ds.commit("dev row")
    assert(ds.toDF.count() == 4)
    ds.checkout("main")
    assert(ds.toDF.count() == 3)
    ds.checkout("dev")
    assert(ds.toDF.count() == 4)
    assert(ds.log.map(_.message).contains("dev row"))
    assert(ds.snapshotAt(c1).count() == 3)
    ds.append(Seq((11L, "e", 5.0)).toDF("id", "label", "score"))
    assert(ds.hasUncommitted)
    ds.reset()
    assert(!ds.hasUncommitted && ds.toDF.count() == 4)
    ds.checkout("main")
    ds.deleteBranch("dev")
    assert(!ds.branches.contains("dev"))
  }

  test("history traversal: allCommits, children, commitsBetween") {
    val ds = freshTable()
    val base = ds.head.get
    ds.checkout("dev", create = true)
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    ds.commit("dev row")
    ds.checkout("main")
    ds.append(Seq((11L, "e", 5.0)).toDF("id", "label", "score"))
    ds.commit("main row")
    assert(ds.allCommits.size == 4) // init, rows, dev row, main row
    assert(ds.children(base).size == 2) // both branches fork here
    val between = ds.commitsBetween(base, ds.head.get)
    assert(between.map(_.message) == Seq("main row"))
    intercept[IllegalArgumentException](
      ds.commitsBetween(ds.head.get, base)) // wrong direction
  }

  test("load reopens a table at a branch") {
    val ds = freshTable()
    val again = GraftDataset.load(spark, ds.root)
    assert(again.toDF.count() == 3)
    assert(again.head == ds.head)
  }

  test("like copies only the schema") {
    val ds = freshTable()
    val copy = GraftDataset.like(spark, tmpDir("graft-like"), ds)
    assert(copy.schema == ds.schema)
    assert(copy.toDF.count() == 0)
  }

  test("views: save, list, load, delete") {
    val ds = freshTable()
    ds.saveView("high", $"score" >= 2.0)
    assert(ds.views == Seq("high"))
    assert(ds.loadView("high").orderBy("id").as[(Long, String, Double)]
      .collect().toSeq == Seq((1L, "b", 2.0), (2L, "c", 3.0)))
    ds.deleteView("high")
    assert(ds.views.isEmpty)
  }

  test("saved views are pinned to their commit across update/pop/append") {
    val ds = freshTable()
    ds.saveView("high", $"score" >= 2.0)
    // mutate EVERYTHING the view touches: update one member, delete the
    // other, append a row that would match the predicate today
    ds.update($"id" === 1L, Map("score" -> lit(99.0), "label" -> lit("Z")))
    ds.pop($"id" === 2L)
    ds.append(Seq((7L, "new", 5.0)).toDF("id", "label", "score"))
    ds.commit("post-save mutations")
    // the view still reads exactly the saved-commit rows
    assert(ds.loadView("high").orderBy("id").as[(Long, String, Double)]
      .collect().toSeq == Seq((1L, "b", 2.0), (2L, "c", 3.0)))
    // the live table HAS changed — so the pin is doing the work
    assert(ds.toDF.filter($"score" >= 2.0).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((0L, "a", 1.0), (1L, "Z", 99.0), (7L, "new", 5.0))
        .filter(_._3 >= 2.0))
  }

  test("compact(clusterBy) preserves the snapshot and sorts files by the key") {
    val ds = freshTable()
    ds.append(Seq((3L, "a", 4.0), (4L, "c", 5.0), (5L, "b", 6.0),
      (6L, "a", 7.0)).toDF("id", "label", "score"))
    ds.commit("more")
    val before = ds.toDF.orderBy("id").as[(Long, String, Double)]
      .collect().toSeq
    ds.compact(clusterBy = Seq("label"))
    ds.commit("clustered")
    assert(ds.toDF.orderBy("id").as[(Long, String, Double)]
      .collect().toSeq == before)
    // every written part file is internally sorted on the cluster key,
    // so parquet row-group min/max stats on it are tight
    val dataDir = new java.io.File(ds.root, "data")
    val compactDir = dataDir.listFiles()
      .filter(_.getName.startsWith("compact-")).maxBy(_.lastModified())
    compactDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { part =>
        val labels = spark.read.parquet(part.getAbsolutePath)
          .select("label").collect().map(_.getString(0)).toSeq
        assert(labels == labels.sorted, s"unsorted part ${part.getName}")
      }
    intercept[IllegalArgumentException](ds.compact(clusterBy = Seq("nope")))
  }

  test("tensorDiff classifies per-tensor added/removed/updated between commits") {
    val ds = freshTable()
    val c1 = ds.head.get
    ds.update($"id" === 1L, Map("score" -> lit(20.0))) // score changes, label doesn't
    ds.pop($"id" === 2L)
    ds.append(Seq((3L, "d", 4.0)).toDF("id", "label", "score"))
    val c2 = ds.commit("mutations")
    val d = ds.tensorDiff(c1, c2)
      .join(ds.snapshotAtWithUuid(c2).select(col(GraftDataset.UuidCol), $"id"),
        Seq(GraftDataset.UuidCol), "left")
      .select($"tensor", $"change", $"id")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSet
    // appended row: every tensor reports "added"; popped row: "removed"
    // (id unknown at c2 → None); updated row: ONLY score reports "updated"
    assert(d == Set(
      ("id", "added", Some(3L)), ("label", "added", Some(3L)),
      ("score", "added", Some(3L)),
      ("id", "removed", None), ("label", "removed", None),
      ("score", "removed", None),
      ("score", "updated", Some(1L))))
    // tensor filter restricts the report (the parse_changes consumer shape)
    assert(ds.tensorDiff(c1, c2, Seq("score")).select("change")
      .collect().map(_.getString(0)).sorted.toSeq ==
      Seq("added", "removed", "updated"))
    intercept[IllegalArgumentException](ds.tensorDiff(c1, c2, Seq("nope")))
  }

  test("tensor groups: createTensor(\"a/b\") nests, a.b addresses it") {
    val ds = freshTable()
    ds.createTensor("meta/source", StringType)
    ds.createTensor("meta/quality", DoubleType)
    assert(ds.schema("meta").dataType.isInstanceOf[StructType])
    ds.append(Seq((5L, "e", 9.0)).toDF("id", "label", "score")
      .withColumn("meta",
        struct(lit("web").as("source"), lit(0.75).as("quality"))))
    ds.commit("grouped")
    // dotted DataFrame addressing
    assert(ds.toDF.filter(col("meta.source") === "web").count() == 1)
    // pre-group rows null-backfill the whole group
    assert(ds.toDF.filter(col("meta").isNull).count() == 3)
    // group.tensor addressing inside safe string queries
    assert(ds.filterQuery("meta.quality >= 0.5").count() == 1)
    assert(ds.filterQuery("meta.source == 'web' and score > 5").count() == 1)
    // non-existent field is still a blocked attribute, not silent null
    intercept[IllegalArgumentException](ds.filterQuery("meta.nope == 1"))
    // round-trips through a reopen
    val ds2 = GraftDataset.load(spark, ds.root)
    assert(ds2.filterQuery("meta.source == 'web'").count() == 1)
    // a scalar column cannot be extended as a group
    intercept[IllegalArgumentException](ds.createTensor("score/sub", LongType))
  }

  test("tensor groups: adding a leaf keeps OLD files readable") {
    // struct casts demand equal field arity, so aligning an old file's
    // struct<source> to the extended struct<source, lang> must rebuild
    // the struct field-by-field (new leaf null-backfilled) — a plain
    // cast fails analysis on EVERY pre-extension file, bricking reads
    val ds = freshTable()
    ds.createTensor("meta/source", StringType)
    ds.append(Seq((5L, "e", 9.0)).toDF("id", "label", "score")
      .withColumn("meta", struct(lit("web").as("source"))))
    ds.commit("grouped")
    ds.createTensor("meta/lang", StringType)
    ds.append(Seq((6L, "f", 2.0)).toDF("id", "label", "score")
      .withColumn("meta",
        struct(lit("pdf").as("source"), lit("en").as("lang"))))
    ds.commit("extended")
    val got = ds.toDF.filter(col("meta").isNotNull)
      .select(col("id"), col("meta.source"), col("meta.lang"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(got === Set((5L, "web", None), (6L, "pdf", Some("en"))),
      s"old-file group rows misaligned: $got")
    // a whole-group NULL row stays null (not a struct of nulls)
    assert(ds.toDF.filter(col("meta").isNull).count() == 3)
  }

  test("writeCommit raced on one id: exactly one winner, content complete") {
    val ds = freshTable()
    val root = ds.root
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val fs = (1 to 8).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          latch.await()
          try {
            CommitLog.writeCommit(spark, root, CommitMeta(
              id = "zz-race", parent = None, mergeParent = None,
              message = s"writer-$i", timestampMs = 0L,
              schemaJson = ds.schema.json, files = Nil, updates = Nil,
              tombstones = Nil, renames = Nil))
            wins.incrementAndGet(); ()
          } catch { case _: java.io.IOException => }
        }
      })
    }
    latch.countDown()
    fs.foreach(_.get())
    pool.shutdown()
    assert(wins.get() == 1, s"expected exactly one winner, got ${wins.get()}")
    // the surviving file is complete, parseable JSON from one writer
    val m = CommitLog.readCommit(spark, root, "zz-race")
    assert(m.message.startsWith("writer-"))
  }

  test("ancestry checkpoint bounds commit-file reads on deep histories") {
    val ds = freshTable()
    val root = ds.root
    // deep linear history: 200 empty commits plus a branch + merge so the
    // walk exercises both parent kinds
    (1 to 200).foreach(i => ds.commit(s"c$i", allowEmpty = true))
    val mainHead = ds.head.get
    ds.checkout("side", create = true)
    ds.commit("side work", allowEmpty = true)
    ds.checkout("main")
    ds.merge("side")
    val head = ds.head.get
    // first deep walk cold-reads everything once and writes the checkpoint
    CommitLog.ancestors(spark, root, head)
    assert(CommitLog.fs(spark, root)
      .exists(CommitLog.ancestryFile(root)), "checkpoint not written")
    // from the checkpoint, a full LCA (two ancestor walks over 200+
    // commits) costs at most the slack in per-commit reads, not O(history)
    CommitLog.commitReads.set(0)
    val l = CommitLog.lca(spark, root, head, mainHead)
    assert(l == mainHead) // merge parent: LCA of head and its first parent
    assert(CommitLog.commitReads.get() <= CommitLog.checkpointSlack,
      s"${CommitLog.commitReads.get()} commit reads despite checkpoint")
    // commitForMessage is checkpoint-served the same way (VERDICT r17
    // #4): a deep HIT and a full MISS over the 200-commit branch each
    // cost at most the slack in commit reads, not O(history)
    CommitLog.commitReads.set(0)
    assert(ds.commitForMessage("c1").isDefined, "deep marker hit")
    assert(ds.commitForMessage("no such marker").isEmpty, "marker miss")
    assert(CommitLog.commitReads.get() <= CommitLog.checkpointSlack,
      s"${CommitLog.commitReads.get()} commit reads on marker walks " +
        "despite checkpoint")
    // newest-first: a duplicated marker resolves to the NEWEST commit
    ds.commit("c1", allowEmpty = true)
    assert(ds.commitForMessage("c1") == ds.head,
      "duplicate marker must resolve newest-first")
    // a torn/corrupt checkpoint is just a cache miss, never an error
    val f = CommitLog.fs(spark, root)
    val out = f.create(CommitLog.ancestryFile(root), true)
    out.write("{not json".getBytes("UTF-8")); out.close()
    assert(CommitLog.ancestors(spark, root, head).size >= 202)
    // ... and so is a LEGACY (edges-only, pre-r18) checkpoint format
    val legacy = CommitLog.readAncestry(spark, root)
      .map { case (k, v) => "\"" + k + "\":[" +
        v.map("\"" + _ + "\"").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val out2 = f.create(CommitLog.ancestryFile(root), true)
    out2.write(legacy.getBytes("UTF-8")); out2.close()
    assert(ds.commitForMessage("c7").isDefined,
      "legacy edges-only checkpoint must degrade to cold reads, not fail")
  }

  test("nextCommitId: O(1) via hint, stale hints probe forward") {
    val ds = freshTable()
    val root = ds.root
    (1 to 3).foreach(i => ds.commit(s"c$i", allowEmpty = true))
    val f = CommitLog.fs(spark, root)
    val hint = new org.apache.hadoop.fs.Path(root, "_graft/commit_next")
    assert(f.exists(hint), "hint not advanced on publish")
    val existing = CommitLog.listCommits(spark, root)
      .map(_.takeWhile(_.isDigit)).filter(_.nonEmpty).map(_.toLong)
    // poison the hint LOW: existence probing must walk past every taken
    // id instead of proposing a colliding one
    val out = f.create(hint, true); out.write("0".getBytes("UTF-8")); out.close()
    val next = CommitLog.nextCommitId(spark, root)
    assert(next.toLong > existing.max, s"stale-hint id $next collides")
    // hint deleted → one-listing fallback proposes the same id
    f.delete(hint, false)
    assert(CommitLog.nextCommitId(spark, root) == next)
    ds.commit("after poison", allowEmpty = true) // end-to-end still green
    assert(ds.log.head.message == "after poison")
  }

  test("claimReservation: unique, increasing, O(1) via hint, bounded at 2^23") {
    val ds = freshTable()
    val root = ds.root
    // 32 concurrent claims from 8 threads → all distinct and positive
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val claims = (1 to 32).map(_ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = CommitLog.claimReservation(spark, root)
      }))
    val got = claims.map(_.get())
    pool.shutdown()
    assert(got.distinct.size == got.size, "concurrent claims must be unique")
    assert(got.forall(_ > 0))
    // later sequential claim is strictly above everything claimed so far
    assert(CommitLog.claimReservation(spark, root) > got.max)
    // a hint poisoned past the 23-bit space is DISTRUSTED (best-effort
    // cache, like nextCommitId's): the claim falls back to the listing
    // watermark instead of bricking every append with a false
    // "exhausted" error
    val f = CommitLog.fs(spark, root)
    val hint = new org.apache.hadoop.fs.Path(root, "_graft/reservations/_next")
    val out = f.create(hint, true)
    out.write("99999999999".getBytes("UTF-8")); out.close()
    val afterPoison = CommitLog.claimReservation(spark, root)
    assert(afterPoison > got.max && afterPoison < CommitLog.maxReservation,
      s"corrupt hint must fall back to the listing, got $afterPoison")
    // GENUINE exhaustion — the claimed watermark itself at the boundary —
    // still fails loudly instead of minting sign-bit-crossing uuids
    f.create(new org.apache.hadoop.fs.Path(root,
      s"_graft/reservations/${CommitLog.maxReservation - 1}"), true).close()
    f.delete(hint, false)
    intercept[IllegalArgumentException](CommitLog.claimReservation(spark, root))
  }

  test("nextCommitId floors at the ancestry checkpoint after a purge") {
    // a branch purge frees ids from the LISTING, but any id the ancestry
    // checkpoint still carries (the dropFromAncestry/refresh race) must
    // never be reissued — a reused id would graft the checkpoint's stale
    // DAG edges onto a brand-new commit
    val ds = freshTable()
    val root = ds.root
    val f = CommitLog.fs(spark, root)
    // simulate the post-purge shape: checkpoint knows id 50, no commit
    // file for it, hint lost
    val ck = """{"edges":{"00000050":["00000001"]},"messages":{"00000050":"x"}}"""
    val out = f.create(CommitLog.ancestryFile(root), true)
    out.write(ck.getBytes("UTF-8")); out.close()
    f.delete(new org.apache.hadoop.fs.Path(root, "_graft/commit_next"), false)
    val next = CommitLog.nextCommitId(spark, root)
    assert(next.toLong > 50L,
      s"allocator reissued a checkpoint-retained id: $next")
  }

  test("readBranches refuses an empty map over live history") {
    // the branches file vanishing while commits exist is a mid-rename
    // window or out-of-band damage — returning empty would let a
    // read-modify-write caller publish over every existing branch
    // pointer; it must surface loudly instead. A genuinely fresh root
    // (no commits) still reads empty fast.
    val ds = freshTable()
    ds.commit("c1", allowEmpty = true)
    val f = CommitLog.fs(spark, ds.root)
    f.delete(new org.apache.hadoop.fs.Path(ds.root, "_graft/branches.json"),
      false)
    val e = intercept[java.io.IOException](
      CommitLog.readBranches(spark, ds.root))
    assert(e.getMessage.contains("commits exist"),
      s"wrong failure: ${e.getMessage}")
    assert(CommitLog.readBranches(spark,
      tmpDir("fresh_no_table")) === Map.empty)
  }

  test("merge-on-read stays one join regardless of update-file count") {
    val ds = freshTable()
    for (i <- 1 to 12) { // 12 uncompacted update files
      ds.update($"id" === (i % 3).toLong, Map("score" -> lit(i.toDouble)))
    }
    ds.commit("many updates")
    // last write per uuid wins
    assert(ds.toDF.orderBy("id").as[(Long, String, Double)]
      .collect().map(_._3).toSeq == Seq(12.0, 10.0, 11.0))
    // the plan holds ONE anti-join against the base, not a 12-deep chain
    val joins = ds.toDF.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1, s"expected 1 join, got ${joins.size}")
  }

  test("UDF filter + row-at-a-time aggregate with UDF where") {
    val ds = freshTable()
    assert(ds.filterRows(r => r.getAs[Double]("score") > 1.5).count() == 2)
    val agg = ds.aggregateRows(Seq.empty, Seq("score"), "sum",
      where = Some(r => r.getAs[String]("label") != "b"))
    assert(agg.head().getDouble(0) == 4.0)
  }

  test("class labels: dictionary metadata, name coercion in string queries") {
    val ds = GraftDataset.create(spark, tmpDir("labels"), StructType(Seq(
      StructField("id", LongType))))
    ds.createTensor("animal", IntegerType, Seq("cat", "dog", "bird"))
    ds.append(Seq((1L, 0), (2L, 1), (3L, 2), (4L, 1)).toDF("id", "animal"))
    ds.commit("rows")
    assert(ds.classLabels == Map("animal" -> Seq("cat", "dog", "bird")))
    // string query with label NAMES (reference class_label coercion)
    assert(ds.filterQuery("animal == 'dog'").select("id")
      .as[Long].collect().toSet == Set(2L, 4L))
    assert(ds.filterQuery("animal in ['cat', 'bird'] or id == 4")
      .count() == 3)
    intercept[IllegalArgumentException](ds.filterQuery("animal == 'fish'"))
    // dictionary-decoded names
    assert(ds.toDF.select(ds.labelName("animal")).as[String]
      .collect().toSet == Set("cat", "dog", "bird"))
    // dictionaries survive commit + reload (metadata in schema json)
    val again = GraftDataset.load(spark, ds.root)
    assert(again.classLabels("animal") == Seq("cat", "dog", "bird"))
  }

  test("minView drops partial rows, maxView keeps them padded") {
    val ds = freshTable()
    ds.append(Seq(7L).toDF("id")) // partial row (skip_ok)
    ds.commit("partial")
    assert(ds.maxView.count() == 4)
    assert(ds.minView.count() == 3)
    assert(ds.minView.filter($"id" === 7L).count() == 0)
  }

  test("concurrent appends auto-rebase: both writers' rows land, no lock") {
    val ds = freshTable()
    val other = GraftDataset.load(spark, ds.root) // second writer, same head
    ds.append(Seq((50L, "w1", 1.0)).toDF("id", "label", "score"))
    other.append(Seq((60L, "w2", 2.0)).toDF("id", "label", "score"))
    val winId = ds.commit("writer 1")
    // writer 2 loses the branch-pointer race, but its change is
    // append-only and the winner's commutes — metadata-only rebase, no
    // re-write of the data, no user retry
    val rebasedId = other.commit("writer 2")
    val merged = GraftDataset.load(spark, ds.root)
    assert(merged.toDF.count() == 5, "both appends must land")
    assert(merged.toDF.filter($"id" === 50L || $"id" === 60L).count() == 2)
    // the rebased commit's parent is the WINNER, not the stale head
    assert(CommitLog.readCommit(spark, ds.root, rebasedId)
      .parent.contains(winId))
    // uuids stayed collision-free across the concurrent writers
    val uuids = merged.toDF.count()
    assert(GraftDataset.load(spark, ds.root).countRows == uuids)
  }

  test("N threads of concurrent appenders all land via auto-rebase") {
    val ds = freshTable() // 3 seed rows
    val writers = 3
    val commitsEach = 2
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futures = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val handle = GraftDataset.load(spark, ds.root)
            for (c <- 0 until commitsEach) {
              handle.append(Seq((100L + w * 10 + c, s"w$w-$c", 1.0))
                .toDF("id", "label", "score"))
              handle.commit(s"writer $w commit $c")
            }
          }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // every writer's every row landed exactly once, no lost updates
    val got = GraftDataset.load(spark, ds.root).toDF
      .filter($"id" >= 100L).select("id").as[Long].collect().sorted.toSeq
    val expect = (for (w <- 0 until writers; c <- 0 until commitsEach)
      yield 100L + w * 10 + c).sorted
    assert(got == expect, s"lost or duplicated appends: $got")
    assert(GraftDataset.load(spark, ds.root).countRows ==
      3 + writers * commitsEach)
  }

  test("lost-CAS commit files are reclaimed, never orphaned (ADVICE r13)") {
    // every lost branch-pointer race used to leave its already-written
    // commit file in _graft/commits forever — unreachable, unvacuumable,
    // inflating every readAllCommits sweep. The rebase/conflict paths now
    // purge the file before retrying/rethrowing.
    def reachable(root: String): Set[String] = {
      val heads = CommitLog.readBranches(spark, root).values
      val seen = scala.collection.mutable.Set[String]()
      for (h <- heads) {
        var cur: Option[String] = Some(h)
        while (cur.isDefined && !seen(cur.get)) {
          seen += cur.get
          val m = CommitLog.readCommit(spark, root, cur.get)
          m.mergeParent.foreach(seen += _)
          cur = m.parent
        }
      }
      seen.toSet
    }
    // case 1: lost CAS resolved by rebase
    val ds = freshTable()
    val other = GraftDataset.load(spark, ds.root)
    ds.append(Seq((50L, "w1", 1.0)).toDF("id", "label", "score"))
    other.append(Seq((60L, "w2", 2.0)).toDF("id", "label", "score"))
    ds.commit("winner")
    other.commit("rebased loser")
    assert(CommitLog.listCommits(spark, ds.root).toSet == reachable(ds.root),
      "rebase path must purge the lost commit file")
    // case 2: lost CAS where the rebase is REFUSED (racing updates)
    val ds2 = freshTable()
    val other2 = GraftDataset.load(spark, ds2.root)
    other2.update($"id" === 0L, Map("score" -> lit(7.0)))
    ds2.update($"id" === 0L, Map("score" -> lit(8.0)))
    ds2.commit("winner update")
    intercept[java.util.ConcurrentModificationException](
      other2.commit("racing update"))
    assert(CommitLog.listCommits(spark, ds2.root).toSet == reachable(ds2.root),
      "refused-rebase path must purge the lost commit file too")
  }

  test("concurrent non-commuting conflicts still fail loudly") {
    // racing MUTATIONS of the SAME rows (update-vs-update,
    // update-vs-pop on an overlapping uuid): full-row postimages
    // computed against different snapshots would clobber each other
    // under any silent ordering — needs user semantics
    val ds = freshTable()
    val other = GraftDataset.load(spark, ds.root)
    other.update($"id" === 0L, Map("score" -> lit(7.0)))
    ds.update($"id" === 0L, Map("label" -> lit("clash")))
    ds.commit("winner update")
    intercept[java.util.ConcurrentModificationException](
      other.commit("racing update, same row"))
    val ds3 = freshTable()
    val other3 = GraftDataset.load(spark, ds3.root)
    other3.update($"id" === 0L, Map("score" -> lit(7.0)))
    ds3.pop($"id" === 0L)
    ds3.commit("winner pop")
    intercept[java.util.ConcurrentModificationException](
      other3.commit("racing update vs pop, same row"))
    // loser appended but the WINNER changed the schema: rebase refused
    val ds2 = freshTable()
    val other2 = GraftDataset.load(spark, ds2.root)
    other2.append(Seq((80L, "w2", 2.0)).toDF("id", "label", "score"))
    ds2.renameTensor("label", "tag")
    ds2.commit("winner rename")
    intercept[java.util.ConcurrentModificationException](
      other2.commit("racing append"))
  }

  test("uuid-pinned update/pop auto-rebases over append and rewrite winners") {
    // enrichment beside live ingest: the update loses the CAS to an
    // append; both land — the update touches exactly the rows its
    // handle read (snapshot-scoped), the winner's new row rides through
    val ds = freshTable()
    val enrich = GraftDataset.load(spark, ds.root)
    assert(enrich.update($"id" === 1L, Map("score" -> lit(42.0))) == 1L)
    ds.append(Seq((70L, "new", 7.0)).toDF("id", "label", "score"))
    val winId = ds.commit("winner append")
    val rebasedId = enrich.commit("enrichment update")
    assert(CommitLog.readCommit(spark, ds.root, rebasedId)
      .parent.contains(winId))
    val after = GraftDataset.load(spark, ds.root).toDF
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(after == Seq((0L, "a", 1.0), (1L, "b", 42.0), (2L, "c", 3.0),
      (70L, "new", 7.0)), s"got $after")
    // pop loses to an append: the popped row goes, the new row stays
    val popper = GraftDataset.load(spark, ds.root)
    assert(popper.pop($"id" === 0L) == 1L)
    ds.reset()
    ds.append(Seq((71L, "more", 8.0)).toDF("id", "label", "score"))
    ds.commit("another append")
    popper.commit("racing pop")
    assert(GraftDataset.load(spark, ds.root).toDF.orderBy("id")
      .select("id").as[Long].collect().toSeq == Seq(1L, 2L, 70L, 71L))
    // update loses to a clean-state BIN-PACK: uuid-keyed entries apply
    // merge-on-read over the repacked bases unchanged
    val enrich2 = GraftDataset.load(spark, ds.root)
    assert(enrich2.update($"id" === 2L, Map("label" -> lit("packed"))) == 1L)
    val maint = GraftDataset.load(spark, ds.root)
    assert(maint.optimizeSmallFiles(targetBytes = 8L << 20)._1 >= 2)
    maint.commit("bin-pack wins")
    enrich2.commit("update over rewrite")
    val after2 = GraftDataset.load(spark, ds.root).toDF
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(after2 == Seq((1L, "b", 42.0), (2L, "packed", 3.0),
      (70L, "new", 7.0), (71L, "more", 8.0)), s"got $after2")
    // row counts stay metadata-consistent through the whole dance
    assert(GraftDataset.load(spark, ds.root).countRows == 4)
    // DISJOINT racing mutations commute: row-level conflict detection,
    // so two enrichment jobs on different slices both land
    val e1 = GraftDataset.load(spark, ds.root)
    val e2 = GraftDataset.load(spark, ds.root)
    assert(e1.update($"id" === 1L, Map("label" -> lit("left"))) == 1L)
    assert(e2.update($"id" === 70L, Map("label" -> lit("right"))) == 1L)
    e1.commit("enricher one wins")
    e2.commit("enricher two rebased (disjoint rows)")
    val after3 = GraftDataset.load(spark, ds.root).toDF
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(after3 == Seq((1L, "left", 42.0), (2L, "packed", 3.0),
      (70L, "right", 7.0), (71L, "more", 8.0)), s"got $after3")
    // disjoint update-vs-pop commutes too
    val e3 = GraftDataset.load(spark, ds.root)
    val e4 = GraftDataset.load(spark, ds.root)
    assert(e3.pop($"id" === 71L) == 1L)
    assert(e4.update($"id" === 2L, Map("score" -> lit(9.0))) == 1L)
    e3.commit("pop wins")
    e4.commit("update rebased (disjoint)")
    assert(GraftDataset.load(spark, ds.root).toDF.orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "left", 42.0), (2L, "packed", 9.0), (70L, "right", 7.0)))
  }

  test("rebased rewrite prunes the winner's stats/epochs for replaced entries") {
    val ds = freshTable()
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    ds.commit("grow 1")
    ds.append(Seq((11L, "e", 5.0)).toDF("id", "label", "score"))
    ds.commit("grow 2")
    val maint = GraftDataset.load(spark, ds.root)
    assert(maint.optimizeSmallFiles(targetBytes = 8L << 20)._1 >= 2)
    ds.append(Seq((90L, "race", 9.0)).toDF("id", "label", "score"))
    ds.commit("winner append")
    val rebasedId = maint.commit("maintenance bin-pack")
    // the rebase adopted the winner's stats/epochs — but the entries the
    // bin-pack replaced are gone from the manifest, so their keys must
    // not ride along (they would be inherited by every descendant)
    val meta = CommitLog.readCommit(spark, ds.root, rebasedId)
    val live = (meta.files ++ meta.updates ++ meta.tombstones).toSet
    val deadStats = meta.stats.getOrElse(Map.empty).keys
      .filterNot(k => live.exists(e => k == e || k.startsWith(e + "/")))
    assert(deadStats.isEmpty, s"dead stat keys: ${deadStats.mkString(", ")}")
    val deadEpochs = meta.epochs.getOrElse(Map.empty).keys.filterNot(live)
    assert(deadEpochs.isEmpty, s"dead epoch keys: ${deadEpochs.mkString(", ")}")
    // and the pruning didn't throw away LIVE stats: whatever keys the
    // winner held for surviving entries are still present
    val winStats = CommitLog.readCommit(spark, ds.root,
      meta.parent.get).stats.getOrElse(Map.empty)
    val keptWinKeys = winStats.keys.filter(k =>
      live.exists(e => k == e || k.startsWith(e + "/")))
    assert(keptWinKeys.forall(meta.stats.getOrElse(Map.empty).contains),
      "rebase dropped stats for entries that survived it")
    assert(meta.stats.exists(_.nonEmpty), "rebased commit lost all stats")
  }

  test("clean-state bin-pack auto-rebases over a concurrent append (Delta OPTIMIZE)") {
    val ds = freshTable()
    ds.append(Seq((10L, "d", 4.0)).toDF("id", "label", "score"))
    ds.commit("grow 1")
    ds.append(Seq((11L, "e", 5.0)).toDF("id", "label", "score"))
    ds.commit("grow 2") // three small base entries now
    val maint = GraftDataset.load(spark, ds.root) // maintenance handle
    val (nRewritten, nBins) = maint.optimizeSmallFiles(targetBytes = 8L << 20)
    assert(nRewritten >= 2 && nBins >= 1, s"($nRewritten, $nBins)")
    // a writer races the staged bin-pack and wins the branch CAS
    ds.append(Seq((90L, "race", 9.0)).toDF("id", "label", "score"))
    val winId = ds.commit("winner append")
    // the lost rewrite rebases: metadata-only, no re-pack of the data
    val rebasedId = maint.commit("maintenance bin-pack")
    val rebasedMeta = CommitLog.readCommit(spark, ds.root, rebasedId)
    assert(rebasedMeta.parent.contains(winId),
      "rebased rewrite must sit on the winner")
    assert(rebasedMeta.rewrite.contains(true),
      "the rebased commit must keep its rewrite flag (feeds skip it)")
    val merged = GraftDataset.load(spark, ds.root)
    assert(merged.toDF.count() == 6 && merged.countRows == 6,
      "no lost rows, including the winner's racing append")
    assert(merged.toDF.filter($"id" === 90L).count() == 1)
    // the winner's appended entry survived the rebase un-packed
    val winMeta = CommitLog.readCommit(spark, ds.root, winId)
    val winParentFiles = winMeta.parent
      .map(p => CommitLog.readCommit(spark, ds.root, p).files.toSet)
      .getOrElse(Set.empty)
    val winnerEntries = winMeta.files.filterNot(winParentFiles)
    assert(winnerEntries.nonEmpty &&
      winnerEntries.forall(rebasedMeta.files.contains),
      "the winner's new entry must ride through the rebase")
    // a change feed across the race carries ONLY the winner's insert —
    // the rewrite commit contributes nothing
    val feed = merged.changes(fromRef = winId)
    assert(feed.count() == 0, "rewrite commits must stay feed-invisible")
    // concurrent REWRITES still conflict loudly (both repack the same
    // entries; second must not silently drop the first's bins)
    val grower = GraftDataset.load(spark, ds.root)
    grower.append(Seq((91L, "f", 1.0)).toDF("id", "label", "score"))
    grower.commit("more small files")
    val m1 = GraftDataset.load(spark, ds.root)
    val m2 = GraftDataset.load(spark, ds.root)
    assert(m1.optimizeSmallFiles(targetBytes = 8L << 20)._1 >= 2)
    assert(m2.optimizeSmallFiles(targetBytes = 8L << 20)._1 >= 2)
    m1.commit("first pack wins")
    intercept[java.util.ConcurrentModificationException](
      m2.commit("second pack must not silently land"))
  }

  test("cross-process branch lock: mutual exclusion, stale steal, lease wait") {
    val ds = freshTable()
    val f = CommitLog.fs(spark, ds.root)
    val lock = new org.apache.hadoop.fs.Path(ds.root, "_graft/branch.lock")
    // mutual exclusion between raw FILE-lock holders (bypassing the JVM
    // lock — this is what two drivers look like)
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val ths = (0 until 4).map { _ =>
      val t = new Thread(() => CommitLog.withBranchLock(spark, ds.root) {
        val now = inside.incrementAndGet()
        maxInside.getAndAccumulate(now, math.max)
        Thread.sleep(50)
        inside.decrementAndGet(); ()
      })
      t.start(); t
    }
    ths.foreach(_.join())
    assert(maxInside.get() == 1, s"lock admitted ${maxInside.get()} holders")
    assert(!f.exists(lock), "lock must be released after the section")
    spark.conf.set("spark.graft.branchLockLeaseMs", "400")
    try {
      // a crashed writer's stale lock is stolen after the lease
      assert(CommitLog.tryCreateExclusive(f, lock, "dead-writer"))
      f.setTimes(lock, System.currentTimeMillis() - 10000L, -1L)
      ds.append(Seq((90L, "x", 1.0)).toDF("id", "label", "score"))
      ds.commit("steals the stale lock") // must not hang
      assert(!f.exists(lock))
      // a LIVE (fresh) lock delays the commit until the lease expires
      assert(CommitLog.tryCreateExclusive(f, lock, "live-but-silent"))
      val t0 = System.nanoTime()
      ds.append(Seq((91L, "y", 2.0)).toDF("id", "label", "score"))
      ds.commit("waits out the lease")
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms >= 300, s"commit should wait out the ~400ms lease, took $ms ms")
      assert(GraftDataset.load(spark, ds.root).toDF.count() == 5)
    } finally spark.conf.unset("spark.graft.branchLockLeaseMs")
  }

  test("uuids are dense and stable across updates") {
    val ds = freshTable()
    ds.update($"id" === 0L, Map("score" -> lit(9.9)))
    ds.commit("u")
    // time-travel diff sees exactly one changed row, no identity churn
    val first = ds.log.find(_.message == "rows").get.id
    val dd = ds.directDiff(first)
    assert(dd.count() == 1)
    assert(dd.head().getString(0) == "changed")
  }

  test("changes(): batch CDC events between refs, delta files only") {
    val ds = freshTable() // 3 rows: ids 0, 1, 2
    val c0 = ds.head.get
    ds.update($"id" === 0L, Map("score" -> lit(5.0)))
    ds.pop($"id" === 1L)
    val c1 = ds.commit("mutate")
    ds.append(Seq((7L, "g", 7.0)).toDF("id", "label", "score"))
    val c2 = ds.commit("grow")
    val ev = ds.changes(c0).select("id", "_change_type", "_commit_id")
      .as[(Option[Long], String, String)].collect().toSet
    assert(ev == Set(
      (Some(0L), "update_postimage", c1), // full postimage row
      (None, "delete", c1),               // identity-only
      (Some(7L), "insert", c2)), s"got $ev")
    // the delete event still carries its uuid identity
    assert(ds.changes(c0, c1).filter($"_change_type" === "delete")
      .select(GraftDataset.UuidCol).as[Long].collect().length == 1)
    assert(ds.changes(c0, c1).count() == 2)
    // rewrite-only compaction contributes no events
    ds.compact()
    val c3 = ds.commit("compacted")
    assert(ds.changes(c2, c3).count() == 0)
    // a ref that is not a first-parent ancestor fails loudly
    intercept[IllegalArgumentException](ds.changes(c2, c0))
  }

  test("applyChanges: CDC replica converges to the source, uuids preserved") {
    val src = freshTable() // ids 0, 1, 2
    src.update($"id" === 0L, Map("score" -> lit(5.0)))
    src.pop($"id" === 1L)
    src.commit("mutate")
    src.update($"id" === 0L, Map("score" -> lit(6.0)))
    src.commit("mutate2") // second postimage for id 0: latest must win
    src.append(Seq((7L, "g", 7.0)).toDF("id", "label", "score"))
    src.commit("grow")
    val replica = GraftDataset.create(spark, tmpDir("replica") + "/t",
      src.schema)
    val (ins, upd, del) = replica.applyChanges(src.changes()) // full feed
    replica.commit("replicated")
    assert(ins == 4 && upd == 1 && del == 1, s"($ins, $upd, $del)")
    assert(replica.toDF.orderBy("id").collect().toSeq ==
      src.toDF.orderBy("id").collect().toSeq)
    // row identity is the SOURCE's uuids, preserved verbatim
    assert(replica.snapshotWithUuid().orderBy("id").select("_uuid")
      .as[Long].collect().toSeq ==
      src.snapshotWithUuid().orderBy("id").select("_uuid")
        .as[Long].collect().toSeq)
    // incremental catch-up applies only the delta commits
    val mark = src.head.get
    src.update($"id" === 2L, Map("label" -> lit("zz")))
    src.commit("more churn")
    replica.applyChanges(src.changes(mark))
    replica.commit("caught up")
    assert(replica.toDF.orderBy("id").collect().toSeq ==
      src.toDF.orderBy("id").collect().toSeq)
  }

  test("countRows: metadata-only count tracks the snapshot through mutations") {
    val ds = freshTable() // 3 rows
    def check(): Unit =
      assert(ds.countRows == ds.toDF.count(), "countRows != scan count")
    check()
    ds.append(Seq((10L, "x", 1.0), (11L, "y", 2.0)).toDF("id", "label", "score"))
    ds.commit("more"); check()
    // updates change no uuid population
    ds.update($"id" === 10L, Map("score" -> lit(9.0)))
    ds.commit("upd"); check()
    // tombstones subtract exactly once, even popping an updated row
    ds.pop($"id" === 10L)
    ds.commit("pop1"); check()
    ds.pop($"id" <= 1L)
    ds.commit("pop2"); check()
    // schema evolution with epochs doesn't disturb the count
    ds.renameTensor("label", "tag")
    ds.deleteTensor("score")
    ds.commit("evolve"); check()
    ds.compact()
    ds.commit("compacted"); check()
  }
}
