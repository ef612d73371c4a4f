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

  for (seed <- Seq(4243, 977))
  test(s"random op sequences (seed $seed): snapshot == model after every commit") {
    val rnd = new scala.util.Random(seed)
    val root = tmpDir("fuzz") + "/t"
    val ds = GraftDataset.create(spark, root, schema)

    // model: branch name -> committed rows; plus the staged working copy
    var model = Map("main" -> Map.empty[Long, String])
    var branch = "main"
    var staged = model(branch)
    var nextId = 0L
    var dirty = false

    def checkSnapshot(): Unit = {
      val got = ds.toDF.as[(Long, String)].collect().toMap
      assert(got == staged, s"branch $branch: snapshot != model " +
        s"(got ${got.size} rows, expected ${staged.size})")
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
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // append a small batch
          val n = 1 + rnd.nextInt(8)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            id -> s"v$id"
          }
          ds.append(rows.toDF("id", "v"))
          staged = staged ++ rows
          dirty = true
        case 3 => // update a random slice
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          ds.update(pmod(col("id"), lit(m)) === r,
            Map("v" -> concat(lit("u"), col("id"))))
          staged = staged.map { case (id, v) =>
            id -> (if (id % m == r) s"u$id" else v)
          }
          dirty = true
        case 4 => // pop a random slice
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          ds.pop(pmod(col("id"), lit(m)) === r)
          staged = staged.filter { case (id, _) => id % m != r }
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
            // zero garbage: physical == union of all branch heads' + pins'
            // entries (this handle has nothing staged)
            val heads = ds.branches.values.toSet
            val live = heads.flatMap(h =>
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
      }
    }
    if (dirty) commit("final")

    // every branch's committed state still matches its model
    model.keys.toSeq.sorted.foreach { b =>
      ds.checkout(b)
      val got = ds.toDF.as[(Long, String)].collect().toMap
      assert(got == model(b), s"final check: branch $b diverged")
    }

    // delete all non-main branches; main must survive with its content,
    // and exclusive data must be reclaimed (vacuum finishes the job)
    ds.checkout("main")
    model.keys.filterNot(_ == "main").toSeq.sorted.foreach(ds.deleteBranch)
    ds.vacuum(olderThanMs = -60000L)
    val got = ds.toDF.as[(Long, String)].collect().toMap
    assert(got == model("main"), "main diverged after branch purge + vacuum")
    val headMeta = CommitLog.readCommit(spark, root, ds.head.get)
    assert(dataEntries(root).toSet ==
      (headMeta.files ++ headMeta.updates ++ headMeta.tombstones).toSet,
      "stranded entries after full purge")
  }
}
