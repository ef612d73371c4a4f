package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Three-way merge matrix — mirrors the reference's
  * tests/integration/version_control/test_detect_merge.py:
  * append/update/pop on each side × ours/theirs/both resolutions,
  * conflict detection, schema merge, fast-forward no-op.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  /** Table with rows 0,1,2 on main; branch `dev` created at that commit. */
  private def baseTable(): GraftDataset = {
    val ds = GraftDataset.create(spark, tmpDir("merge"), schema)
    ds.append(Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("id", "v"))
    ds.commit("base")
    ds.checkout("dev", create = true)
    ds.checkout("main")
    ds
  }

  private def rows(ds: GraftDataset): Set[(Long, String)] =
    ds.toDF.as[(Long, String)].collect().toSet

  test("append on both sides: both / ours / theirs resolutions") {
    def setup(): GraftDataset = {
      val ds = baseTable()
      ds.checkout("dev")
      ds.append(Seq((10L, "dev-add")).toDF("id", "v")); ds.commit("dev add")
      ds.checkout("main")
      ds.append(Seq((20L, "main-add")).toDF("id", "v")); ds.commit("main add")
      ds
    }
    val both = setup(); both.merge("dev")
    assert(rows(both) == Set((0L, "zero"), (1L, "one"), (2L, "two"),
      (10L, "dev-add"), (20L, "main-add")))
    val ours = setup()
    ours.merge("dev", Versioning.MergeResolutions(append = "ours"))
    assert(rows(ours).contains((20L, "main-add")) &&
      !rows(ours).contains((10L, "dev-add")))
    val theirs = setup()
    theirs.merge("dev", Versioning.MergeResolutions(append = "theirs"))
    assert(rows(theirs).contains((10L, "dev-add")) &&
      !rows(theirs).contains((20L, "main-add")))
  }

  test("update/update conflict: ours wins by default, theirs on request") {
    def setup(): GraftDataset = {
      val ds = baseTable()
      ds.checkout("dev")
      ds.update($"id" === 1L, Map("v" -> lit("dev-edit"))); ds.commit("dev edit")
      ds.checkout("main")
      ds.update($"id" === 1L, Map("v" -> lit("main-edit"))); ds.commit("main edit")
      ds
    }
    val ours = setup()
    val conf = ours.detectMergeConflict("dev")
    assert(conf.filter($"conflict_type" === "update_update").count() == 1)
    ours.merge("dev")
    assert(rows(ours).contains((1L, "main-edit")))
    val theirs = setup()
    theirs.merge("dev", Versioning.MergeResolutions(update = "theirs"))
    assert(rows(theirs).contains((1L, "dev-edit")))
  }

  test("a value moving across a null slot IS a change (null-safe detect)") {
    // Spark's hash functions skip null fields without mixing position,
    // so hash(struct("x", null)) == hash(struct(null, "x")) — hash-based
    // change detection would classify ours' committed update as
    // "unchanged", take theirs wholesale, and report NO conflict. The
    // null-safe struct comparison must catch it.
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("a", StringType), StructField("b", StringType)))
    val ds = GraftDataset.create(spark, tmpDir("merge_nullslot"), sch)
    ds.append(Seq((1L, Some("x"), Option.empty[String]))
      .toDF("id", "a", "b"))
    ds.commit("base")
    ds.checkout("dev", create = true)
    ds.update($"id" === 1L, Map("b" -> lit("y"))) // theirs: b null → y
    ds.commit("dev edit")
    ds.checkout("main") // ours: the value MOVES across the null slot
    ds.update($"id" === 1L,
      Map("a" -> lit(null).cast("string"), "b" -> lit("x")))
    ds.commit("main edit")
    assert(ds.detectMergeConflict("dev")
        .filter($"conflict_type" === "update_update").count() == 1,
      "both sides changed the row — the null-slot move was missed")
    ds.merge("dev") // update = ours (default)
    val got = ds.toDF.as[(Long, Option[String], Option[String])]
      .collect().toSet
    assert(got === Set((1L, None, Some("x"))),
      s"ours' null-slot update was discarded: $got")
  }

  test("one-sided update flows through without conflict") {
    val ds = baseTable()
    ds.checkout("dev")
    ds.update($"id" === 2L, Map("v" -> lit("dev-only"))); ds.commit("dev edit")
    ds.checkout("main")
    ds.append(Seq((30L, "main-new")).toDF("id", "v")); ds.commit("main add")
    assert(ds.detectMergeConflict("dev").count() == 0)
    ds.merge("dev")
    assert(rows(ds) == Set((0L, "zero"), (1L, "one"), (2L, "dev-only"),
      (30L, "main-new")))
  }

  test("pop resolutions: both / ours / theirs") {
    def setup(): GraftDataset = {
      val ds = baseTable()
      ds.checkout("dev")
      ds.pop($"id" === 0L); ds.commit("dev pop 0")
      ds.checkout("main")
      ds.pop($"id" === 2L); ds.commit("main pop 2")
      ds
    }
    val both = setup(); both.merge("dev")
    assert(rows(both) == Set((1L, "one"))) // both deletions honored
    val ours = setup()
    ours.merge("dev", Versioning.MergeResolutions(pop = "theirs"))
    // only theirs' (dev's) deletion of id=0 honored; ours' pop of id=2 is
    // not, and dev still has id=2 → it survives
    assert(rows(ours) == Set((1L, "one"), (2L, "two")))
  }

  test("delete vs update is reported as a conflict") {
    val ds = baseTable()
    ds.checkout("dev")
    ds.update($"id" === 0L, Map("v" -> lit("dev-edit"))); ds.commit("dev edit")
    ds.checkout("main")
    ds.pop($"id" === 0L); ds.commit("main pop")
    val conf = ds.detectMergeConflict("dev")
    assert(conf.head().getString(0) == "delete_ours_update_theirs")
  }

  test("schema merge copies target-only columns") {
    val ds = baseTable()
    ds.checkout("dev")
    ds.createTensor("extra", IntegerType)
    ds.update($"id" === 1L, Map("extra" -> lit(42))); ds.commit("dev col")
    ds.checkout("main")
    ds.append(Seq((3L, "three")).toDF("id", "v")); ds.commit("main row")
    ds.merge("dev")
    assert(ds.schema.fieldNames.contains("extra"))
    assert(ds.toDF.filter($"extra" === 42).count() == 1)
    assert(ds.toDF.filter($"id" === 3L).head().isNullAt(2))
  }

  test("rename reconciliation: target's rename adopted, data aligned") {
    val ds = baseTable()
    ds.checkout("dev")
    ds.renameTensor("v", "value")
    ds.update($"id" === 1L, Map("value" -> lit("dev-edit")))
    ds.commit("dev rename+edit")
    ds.checkout("main")
    ds.append(Seq((3L, "three")).toDF("id", "v")); ds.commit("main add")
    ds.merge("dev")
    // single column under the new name, no v/value fork
    assert(ds.schema.fieldNames.toSeq == Seq("id", "value"))
    assert(rows2(ds) == Set((0L, "zero"), (1L, "dev-edit"), (2L, "two"),
      (3L, "three")))
  }

  test("rename on ours propagates to target's rows") {
    val ds = baseTable()
    ds.checkout("dev")
    ds.update($"id" === 2L, Map("v" -> lit("dev-edit"))); ds.commit("dev edit")
    ds.checkout("main")
    ds.renameTensor("v", "value"); ds.commit("main rename")
    ds.merge("dev")
    assert(ds.schema.fieldNames.toSeq == Seq("id", "value"))
    assert(rows2(ds).contains((2L, "dev-edit"))) // edit lands under new name
  }

  private def rows2(ds: GraftDataset): Set[(Long, String)] =
    ds.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("merging an ancestor is a no-op; diff classifies per side") {
    val ds = baseTable()
    val head = ds.head.get
    ds.append(Seq((5L, "five")).toDF("id", "v")); ds.commit("ahead")
    assert(ds.merge("dev") == ds.head.get) // dev == LCA → no-op
    val d = ds.diff("dev").as[(String, String, Long)].collect().toSet
    assert(d.exists(x => x._1 == "ours" && x._2 == "append"))
    assert(!d.exists(x => x._1 == "theirs"))
    assert(ds.head.get != head)
  }

  test("error paths: bad resolutions, dirty merge, unknown append columns") {
    val ds = baseTable()
    intercept[IllegalArgumentException](
      ds.merge("dev", Versioning.MergeResolutions(update = "both")))
    intercept[IllegalArgumentException](
      ds.merge("dev", Versioning.MergeResolutions(append = "nope")))
    ds.append(Seq((99L, "x")).toDF("id", "v")) // uncommitted
    intercept[IllegalArgumentException](ds.merge("dev"))
    ds.reset()
    intercept[IllegalArgumentException](
      ds.append(Seq((1L, "a", "extra")).toDF("id", "v", "bogus")))
    intercept[IllegalArgumentException](ds.checkout("no-such-ref"))
  }

  test("fast-forward shape: ours unchanged since LCA takes theirs") {
    val ds = baseTable()
    ds.checkout("dev")
    ds.append(Seq((7L, "seven")).toDF("id", "v"))
    ds.update($"id" === 0L, Map("v" -> lit("edited")))
    ds.pop($"id" === 2L)
    ds.commit("dev work")
    ds.checkout("main")
    ds.merge("dev")
    assert(rows(ds) == Set((0L, "edited"), (1L, "one"), (7L, "seven")))
  }

  test("randomized merges match a driver-side model (seeded property test)") {
    // Random update/pop/append on both branches, random resolutions;
    // expectation computed independently from the winner rules
    // (Versioning scaladoc / reference merge.py:499-621). Ids are unique
    // per row and append id-spaces are disjoint, so id ≡ uuid for the
    // model.
    val rnd = new scala.util.Random(20260812L)
    val resoSpace = for {
      a <- Seq("ours", "theirs", "both"); u <- Seq("ours", "theirs")
      p <- Seq("ours", "theirs", "both")
    } yield Versioning.MergeResolutions(a, u, p)
    for (round <- 1 to 5) {
      val baseIds = (0L until 12L)
      val ds = GraftDataset.create(spark, tmpDir(s"fuzz$round"), schema)
      ds.append(baseIds.map(i => (i, s"v$i")).toDF("id", "v"))
      ds.commit("base")
      ds.checkout("dev", create = true)
      ds.checkout("main")
      // model state: id -> value; None = deleted
      def mutate(branch: String, appendFrom: Long)
          : Map[Long, Option[String]] = {
        ds.checkout(branch)
        var m: Map[Long, Option[String]] =
          baseIds.map(i => i -> Option(s"v$i")).toMap
        val upd = baseIds.filter(_ => rnd.nextBoolean()).toSet
        if (upd.nonEmpty) {
          ds.update(col("id").isin(upd.toSeq: _*),
            Map("v" -> concat(lit(s"$branch-"), col("id"))))
          m = m ++ upd.map(i => i -> Option(s"$branch-$i"))
        }
        val dead = baseIds.filter(_ => rnd.nextInt(4) == 0).toSet
        if (dead.nonEmpty) {
          ds.pop(col("id").isin(dead.toSeq: _*))
          m = m ++ dead.map(i => i -> None)
        }
        val added = (appendFrom until appendFrom + rnd.nextInt(3))
        if (added.nonEmpty) {
          ds.append(added.map(i => (i, s"$branch-new$i")).toDF("id", "v"))
          m = m ++ added.map(i => i -> Option(s"$branch-new$i"))
        }
        ds.commit(s"$branch mutations")
        m
      }
      val theirsM = mutate("dev", 200L)
      val oursM = mutate("main", 100L) // ends checked out on main
      val r = resoSpace(rnd.nextInt(resoSpace.size))
      ds.merge("dev", r)
      val expected = (oursM.keySet ++ theirsM.keySet).flatMap { id =>
        val l = if (baseIds.contains(id)) Option(s"v$id") else None
        val o = oursM.getOrElse(id, None)
        val t = theirsM.getOrElse(id, None)
        val oCh = l.isDefined && o.isDefined && o != l
        val tCh = l.isDefined && t.isDefined && t != l
        val win: Option[String] =
          if (l.isEmpty) { // appended on exactly one side
            if (o.isDefined)
              if (r.append != "theirs") o else None
            else if (t.isDefined)
              if (r.append != "ours") t else None
            else None
          }
          else if (o.isEmpty && t.isEmpty) None
          else if (o.isEmpty) if (r.pop != "theirs") None else t
          else if (t.isEmpty) if (r.pop != "ours") None else o
          else if (oCh && tCh && o != t)
            if (r.update == "theirs") t else o
          else if (tCh && !oCh) t
          else o
        win.map(v => (id, v))
      }
      assert(rows(ds) == expected,
        s"round $round with $r:\n got ${rows(ds).toSeq.sorted}\n " +
          s"want ${expected.toSeq.sorted}")
    }
  }
}
