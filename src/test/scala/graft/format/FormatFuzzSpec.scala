package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Randomized MODEL-BASED check of the format layer: a fixed-seed
  * random sequence of user + maintenance operations runs against both
  * a GraftDataset and a driver-side in-memory model; after every
  * commit the live snapshot must equal the model exactly, and the
  * maintenance invariants must hold (physical entries == live manifest
  * after an aggressive vacuum; branch data reclaimed on delete). The
  * point is INTERACTION coverage: compaction over staged updates,
  * vacuum racing branch snapshots, bin-packing over merge-on-read
  * state — sequences no hand-written spec enumerates.
  *
  * Schema-evolution ops fuzz the rename-EPOCH machinery: an "extra"
  * column is created, deleted, recreated, and renamed at random, so
  * snapshots mix files written under different chain suffixes, and a
  * recreate after delete must read nulls (never the dropped column's
  * stale physical bytes) for pre-delete files.
  */
class FormatFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def dataEntries(root: String): Seq[String] = {
    val f = CommitLog.fs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(root, "data")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(s => s"data/${s.getPath.getName}").toSeq
  }

  // one branch's model: committed rows (id -> (v, extra)) + the extra
  // column's current name (None = column absent from the schema)
  private case class BranchModel(rows: Map[Long, (String, Option[Long])],
                                 extra: Option[String])

  for (seed <- Seq(4243, 977, 260814))
  test(s"random op sequences (seed $seed): snapshot == model after every commit") {
    val rnd = new scala.util.Random(seed)
    val root = tmpDir("fuzz") + "/t"
    val ds = GraftDataset.create(spark, root, schema)

    var model = Map("main" -> BranchModel(Map.empty, None))
    var branch = "main"
    var staged = model(branch)
    var nextId = 0L
    var extraSeq = 0 // unique extra-column names across recreates/renames
    var dirty = false

    def snapshot(): Map[Long, (String, Option[Long])] = {
      val df = ds.toDF
      staged.extra match {
        case Some(x) =>
          assert(df.columns.toSeq == Seq("id", "v", x),
            s"schema mismatch: ${df.columns.toSeq} vs extra=$x")
          df.select(col("id"), col("v"), col(x))
            .as[(Long, String, Option[Long])].collect()
            .map(r => r._1 -> (r._2, r._3)).toMap
        case None =>
          assert(df.columns.toSeq == Seq("id", "v"),
            s"schema mismatch: ${df.columns.toSeq} vs no extra")
          df.as[(Long, String)].collect()
            .map(r => r._1 -> (r._2, None: Option[Long])).toMap
      }
    }

    def checkSnapshot(): Unit = {
      val got = snapshot()
      assert(got == staged.rows, s"branch $branch: snapshot != model " +
        s"(got ${got.size} rows, expected ${staged.rows.size})")
      // PRUNED read through the registered source: a selective id-range
      // filter (file skipping fires against whatever file/epoch/rename
      // state this sequence produced) must agree with the model exactly
      // — fuzzing the stat machinery against interleavings no
      // hand-written pruning spec enumerates. The source reads the
      // COMMITTED head, so only when nothing is staged.
      if (!dirty) {
        val mid = nextId / 2
        val pruned = spark.read.format("graft").option("branch", branch)
          .load(root).filter(col("id") >= mid)
          .select("id").as[Long].collect().toSet
        assert(pruned == staged.rows.keySet.filter(_ >= mid),
          s"branch $branch: pruned id-range read diverged from the model")
      }
    }

    def commit(msg: String): Unit = {
      ds.commit(msg, allowEmpty = true)
      model += branch -> staged
      dirty = false
      checkSnapshot()
    }

    var ops = 0
    while (ops < 70) {
      ops += 1
      rnd.nextInt(13) match {
        case 0 | 1 | 2 => // append a small batch
          val n = 1 + rnd.nextInt(8)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            id -> (s"v$id", staged.extra.map(_ => id * 10))
          }
          staged.extra match {
            case Some(x) => ds.append(
              rows.map { case (id, (v, e)) => (id, v, e.get) }.toDF("id", "v", x))
            case None => ds.append(
              rows.map { case (id, (v, _)) => (id, v) }.toDF("id", "v"))
          }
          staged = staged.copy(rows = staged.rows ++ rows)
          dirty = true
        case 3 => // update a random slice (v only; extra rides along)
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          ds.update(pmod(col("id"), lit(m)) === r,
            Map("v" -> concat(lit("u"), col("id"))))
          staged = staged.copy(rows = staged.rows.map { case (id, (v, e)) =>
            id -> (if (id % m == r) (s"u$id", e) else (v, e))
          })
          dirty = true
        case 4 => // pop a random slice
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          ds.pop(pmod(col("id"), lit(m)) === r)
          staged = staged.copy(rows =
            staged.rows.filter { case (id, _) => id % m != r })
          dirty = true
        case 5 => // compact (sometimes clustered / zordered)
          rnd.nextInt(3) match {
            case 0 => ds.compact()
            case 1 => ds.compact(clusterBy = Seq("id"))
            case _ => ds.compact(clusterBy = Seq("id", "v"), zorder = true)
          }
          dirty = true
        case 6 => // bin-pack small entries
          ds.optimizeSmallFiles(targetBytes = 1L << 20)
          checkSnapshot() // staged-only change; rows must be identical
        case 7 => // aggressive vacuum: live data must be untouched
          if (!dirty) { // vacuum relies on this handle's staged state
            ds.vacuum(olderThanMs = -60000L)
            checkSnapshot()
            // zero garbage: physical == union of all branch heads' +
            // pairwise merge-base (LCA) entries — merge bases survive
            // vacuum so diverged branches stay mergeable
            val heads = ds.branches.values.toSet
            val lcas = heads.toSeq.sorted.combinations(2).flatMap(p =>
              scala.util.Try(
                CommitLog.lca(spark, root, p(0), p(1))).toOption).toSet
            val live = (heads ++ lcas).flatMap(h =>
              { val m = CommitLog.readCommit(spark, root, h)
                m.files ++ m.updates ++ m.tombstones })
            assert(dataEntries(root).toSet == live,
              "vacuum left garbage or deleted live data")
          }
        case 8 => // commit whatever is staged
          commit(s"op $ops")
        case 9 => // branch hop: create or switch (commit staged first)
          if (dirty) commit(s"pre-hop $ops")
          val existing = ds.branches.keys.toVector.sorted
          if (rnd.nextBoolean() && existing.size < 4) {
            val name = s"b${ops}"
            ds.checkout(name, create = true)
            model += name -> model(branch)
            branch = name
          } else {
            branch = existing(rnd.nextInt(existing.size))
            ds.checkout(branch)
          }
          staged = model(branch)
          checkSnapshot()
        case 10 => // create the extra column (fresh name each lifetime)
          if (staged.extra.isEmpty) {
            extraSeq += 1
            val name = if (rnd.nextBoolean()) s"x$extraSeq" else "x0"
            if (!ds.schema.fieldNames.contains(name)) {
              ds.createTensor(name, LongType)
              // existing rows read null for a late-added column
              staged = staged.copy(extra = Some(name))
              dirty = true
            }
          }
        case 11 => // delete the extra column: values gone for good
          staged.extra.foreach { x =>
            ds.deleteTensor(x)
            staged = BranchModel(
              staged.rows.map { case (id, (v, _)) => id -> (v, None: Option[Long]) },
              None)
            dirty = true
          }
        case 12 => // rename the extra column (fresh or recycled name)
          staged.extra.foreach { x =>
            extraSeq += 1
            val to = if (rnd.nextBoolean()) s"x$extraSeq" else "x0"
            if (to != x && !ds.schema.fieldNames.contains(to)) {
              ds.renameTensor(x, to)
              staged = staged.copy(extra = Some(to))
              dirty = true
            }
          }
      }
    }
    if (dirty) commit("final")

    // every branch's committed state still matches its model
    model.keys.toSeq.sorted.foreach { b =>
      ds.checkout(b)
      staged = model(b); branch = b
      checkSnapshot()
    }

    // delete all non-main branches; main must survive with its content,
    // and exclusive data must be reclaimed (vacuum finishes the job)
    ds.checkout("main")
    branch = "main"; staged = model("main")
    model.keys.filterNot(_ == "main").toSeq.sorted.foreach(ds.deleteBranch)
    ds.vacuum(olderThanMs = -60000L)
    checkSnapshot()
    val headMeta = CommitLog.readCommit(spark, root, ds.head.get)
    assert(dataEntries(root).toSet ==
      (headMeta.files ++ headMeta.updates ++ headMeta.tombstones).toSet,
      "stranded entries after full purge")
  }
}
