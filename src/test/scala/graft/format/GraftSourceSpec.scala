package graft.format

import graft.SparkSpec
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * registered data source must serve the same snapshots as the Scala
  * API (merge-on-read, tombstones, branches, time travel) to readers
  * that never touch [[GraftDataset]].
  */
class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("n", DoubleType)))

  /** Branched + updated + tombstoned table: main holds the mutations,
    * dev holds one extra row appended after the branch point.
    */
  private def mutatedTable(): GraftDataset = {
    val ds = GraftDataset.create(spark, tmpDir("dsrc"), schema)
    ds.append(Seq((0L, "zero", 0.5), (1L, "one", 1.5), (2L, "two", 2.5),
      (3L, "three", 3.5)).toDF("id", "v", "n"))
    ds.commit("base")
    ds.checkout("dev", create = true)
    ds.append(Seq((10L, "dev-only", 10.5)).toDF("id", "v", "n"))
    ds.commit("dev add")
    ds.checkout("main")
    ds.update(col("id") === 1L, Map("v" -> lit("ONE")))
    ds.pop(col("id") === 2L)
    ds.commit("mutations")
    ds
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[Row] =
    df.collect().toSet

  test("format read matches toDF on a branched, updated, tombstoned table") {
    val ds = mutatedTable()
    val viaFormat = spark.read.format("graft").load(ds.root)
    assert(viaFormat.schema.fieldNames.toSeq == Seq("id", "v", "n"))
    assert(asSet(viaFormat) == asSet(ds.toDF))
    // merged-on-read values really came through: the updated row,
    // not the base write, and no tombstoned row
    val m = viaFormat.as[(Long, String, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(m(1L) == "ONE" && !m.contains(2L) && m.size == 3)
    // branch option reads the other head
    val dev = spark.read.format("graft").option("branch", "dev").load(ds.root)
    assert(dev.count() == 5)
    assert(dev.filter(col("id") === 10L).count() == 1)
  }

  test("commit option time-travels; withUuid exposes the hidden column") {
    val ds = mutatedTable()
    val baseCommit = ds.log.find(_.message == "base").get.id
    val tt = spark.read.format("graft")
      .option("commit", baseCommit).load(ds.root)
    assert(asSet(tt) == asSet(ds.snapshotAt(baseCommit)))
    assert(tt.count() == 4) // pre-mutation, pre-branch
    val withUuid = spark.read.format("graft")
      .option("withUuid", "true").load(ds.root)
    assert(withUuid.schema.fieldNames.contains(GraftDataset.UuidCol))
    assert(withUuid.select(GraftDataset.UuidCol).distinct().count() == 3)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("commit", "zzz").load(ds.root).count()
    }
  }

  test("pruned + filtered scans answer correctly (incl. zero-column count)") {
    val ds = mutatedTable()
    val r = spark.read.format("graft").load(ds.root)
    assert(r.count() == 3) // empty requiredColumns path
    assert(r.select("v").where(col("n") > 1.0).as[String].collect().toSet ==
      Set("ONE", "three"))
    // the filter reaches the relation scan (visible as PushedFilters on
    // the V1 row-source scan node)
    val plan = r.where(col("n") > 1.0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    // a predicate V1 cannot push (UDF) is still applied by Spark above
    // the scan: lengths are zero=4, ONE=3, three=5 → exactly one match
    val len = udf((s: String) => s.length)
    assert(r.where(len(col("v")) === 3).count() == 1)
  }

  test("SQL users: CREATE TEMPORARY VIEW ... USING graft") {
    val ds = mutatedTable()
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW graft_sql_view
      USING graft OPTIONS (path '${ds.root}', branch 'dev')""")
    val got = spark.sql(
      "SELECT count(*) AS c FROM graft_sql_view WHERE n > 1.0")
      .as[Long].head()
    assert(got == 4) // one,two,three,dev-only (update/pop are on main)
  }

  test("write path: create, append, ignore, errorIfExists, overwrite") {
    val root = tmpDir("dsrc-w") + "/t"
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df1.write.format("graft").save(root) // ErrorIfExists on fresh = create
    assert(spark.read.format("graft").load(root).count() == 2)
    // append commits on the branch; read reflects both writes
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Append)
      .option("message", "more rows").save(root)
    val after = spark.read.format("graft").load(root)
    assert(after.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val log = GraftDataset.load(spark, root).log
    assert(log.head.message == "more rows")
    // Ignore: no-op on existing table
    Seq((9L, "x")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Ignore).save(root)
    assert(spark.read.format("graft").load(root).count() == 3)
    // ErrorIfExists: refuses
    intercept[IllegalStateException] {
      Seq((9L, "x")).toDF("id", "v").write.format("graft").save(root)
    }
    // Overwrite: drop + recreate
    Seq((7L, "z")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("graft").load(root)
      .as[(Long, String)].collect().toSet == Set((7L, "z")))
  }

  test("catalog-named tables: CREATE TABLE / saveAsTable / INSERT / pinned time travel") {
    import spark.implicits._
    val root = tmpDir("named") + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.format("graft").option("path", root).mode("append").save()
    val c1 = GraftDataset.load(spark, root).head.get
    try {
      // a named external graft table over the existing path
      spark.sql(s"CREATE TABLE nt USING graft OPTIONS (path '$root')")
      assert(spark.sql("SELECT count(*) FROM nt").as[Long].head() == 3L)
      // INSERT INTO → one append commit; the select sees the new head
      // even though the session catalog caches the relation instance
      spark.sql("INSERT INTO nt VALUES (4, 'd')")
      assert(spark.table("nt").count() == 4L)
      // SQL time travel: a second named table pinned to the old commit
      spark.sql(s"CREATE TABLE nt_v1 USING graft OPTIONS (path '$root', commit '$c1')")
      assert(spark.table("nt_v1").count() == 3L)
      // INSERT OVERWRITE replaces rows in ONE commit; history stays
      spark.sql("INSERT OVERWRITE nt VALUES (9, 'z')")
      assert(spark.table("nt").select("id").as[Long].collect().toSeq == Seq(9L))
      assert(spark.table("nt_v1").count() == 3L, "pinned snapshot untouched")
      // a pinned table is a read-only snapshot
      val e = intercept[Exception](spark.sql("INSERT INTO nt_v1 VALUES (8, 'n')"))
      assert(e.getMessage.contains("commit-pinned"))
      // saveAsTable registers the written table under a name directly
      val root2 = tmpDir("named2") + "/t"
      Seq((7L, "q")).toDF("id", "s").write.format("graft")
        .option("path", root2).saveAsTable("nt_saved")
      assert(spark.table("nt_saved").count() == 1L)
    } finally {
      Seq("nt", "nt_v1", "nt_saved")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("manifest file skipping: prunes disjoint base files, exact under merge-on-read") {
    import spark.implicits._
    val root = tmpDir("skip") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("s", StringType))))
    // two base manifest entries with disjoint id ranges
    ds.append((1L to 100L).map(i => (i, 1L, s"a$i")).toDF("id", "v", "s"))
    ds.append((101L to 200L).map(i => (i, 1L, s"b$i")).toDF("id", "v", "s"))
    ds.commit("two files")
    def read() = spark.read.format("graft").load(root)
    def prunedDelta[T](body: => T): (T, Long) = {
      val before = FileSkipping.prunedFiles.get()
      val r = body
      (r, FileSkipping.prunedFiles.get() - before)
    }
    // a selective filter plans only the surviving file
    val (hi, d1) = prunedDelta(
      read().filter($"id" >= 150L).select("id").as[Long].collect().toSet)
    assert(hi == (150L to 200L).toSet)
    assert(d1 >= 1, s"expected the low-range base file pruned, got $d1")
    // string stats prune too (disjoint a*/b* prefixes)
    val (bs, d2) = prunedDelta(
      read().filter($"s".startsWith("b")).count())
    assert(bs == 100L && d2 >= 1)
    // merge-on-read: an update moves a row INTO the filter range; both
    // base files' stats exclude v=999, yet the row must appear (the
    // update file carries the full row and wins last-wins)
    ds.update($"id" === 5L, Map("v" -> lit(999L)))
    ds.commit("update")
    val (upd, d3) = prunedDelta(
      read().filter($"v" === 999L).select("id").as[Long].collect().toSeq)
    assert(upd == Seq(5L), "pruned read must still see the updated row")
    assert(d3 >= 2, "both base files excluded by v-stats")
    // parity: pruned read == full-scan read on the same predicate
    assert(read().filter($"id" < 120L).count() ==
      ds.toDF.filter($"id" < 120L).count())
    // the reference's own filterVectorized surface prunes through the
    // implied filter: (id >= 150 AND CONTAINS ...) weakens to id >= 150
    // for skipping, while (CONTAINS ... OR id >= 150) must not prune
    import graft.operators.Cond
    val (fv, d3a) = prunedDelta(
      ds.filterVectorized(Seq(Cond("id", ">=", 150L),
          Cond("s", "CONTAINS", "b199")), Seq("AND"))
        .select("id").as[Long].collect().toSet)
    assert(fv == Set(199L) && d3a >= 1, s"AND weakens to id-filter, got $d3a")
    val (fvOr, d3b) = prunedDelta(
      ds.filterVectorized(Seq(Cond("s", "CONTAINS", "a5"),
          Cond("id", ">=", 150L)), Seq("OR")).count())
    assert(fvOr == 52L && d3b == 0,
      s"OR with untranslatable side must not prune, got $d3b")
    // renames KEEP pruning: stat keys are normalized alongside the
    // column, so the filter on the new name still hits the old files'
    // stats (at 100 TB a rename must not degrade every scan to a
    // full-manifest plan until the next full compact)
    ds.renameTensor("v", "w")
    ds.commit("rename")
    val (renamed, d4) = prunedDelta(
      read().filter($"w" === 999L).select("id").as[Long].collect().toSeq)
    assert(renamed == Seq(5L),
      "renamed-column read must stay exact under pruning")
    assert(d4 >= 2, s"renamed column must still prune via migrated stats, got $d4")
  }

  test("temporal stat domains: ts/date range filters prune files, exact under merge-on-read") {
    import spark.implicits._
    val root = tmpDir("tskip") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType),
      StructField("ts", org.apache.spark.sql.types.TimestampType),
      StructField("d", org.apache.spark.sql.types.DateType),
      StructField("tn", org.apache.spark.sql.types.TimestampNTZType))))
    def t(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2026-03-0$day $h%02d:00:00")
    def dt(day: Int) = java.sql.Date.valueOf(f"2026-03-0$day")
    def ldt(day: Int, h: Int) =
      java.time.LocalDateTime.of(2026, 3, day, h, 0)
    // two range-clustered entries: day-1 events, day-2 events
    ds.append((0 until 50).map(i =>
      (i.toLong, t(1, i % 24), dt(1), ldt(1, i % 24))).toDF("id", "ts", "d", "tn"))
    ds.append((50 until 100).map(i =>
      (i.toLong, t(2, i % 24), dt(2), ldt(2, i % 24))).toDF("id", "ts", "d", "tn"))
    ds.commit("two days")
    def read() = spark.read.format("graft").load(root)
    def prunedDelta[T](body: => T): (T, Long) = {
      val before = FileSkipping.prunedFiles.get()
      val r = body
      (r, FileSkipping.prunedFiles.get() - before)
    }
    // timestamp range: day-2 cutoff prunes the day-1 file
    val (n1, p1) = prunedDelta(read().filter($"ts" >= t(2, 0)).count())
    assert(n1 == 50L && p1 >= 1, s"ts-range must prune the day-1 file, got $p1")
    // date equality prunes the other day's file
    val (n2, p2) = prunedDelta(read().filter($"d" === dt(1)).count())
    assert(n2 == 50L && p2 >= 1, s"date filter must prune, got $p2")
    // NTZ wall-clock range prunes too
    val (n3, p3) = prunedDelta(
      read().filter($"tn" < ldt(2, 0).toString.replace("T", " ")).count())
    assert(n3 == 50L, s"ntz filter wrong count: $n3")
    // exactness parity: pruned read == snapshot read on the same predicate
    assert(read().filter($"ts" < t(2, 0)).count() ==
      ds.toDF.filter($"ts" < t(2, 0)).count())
    // metadata MIN/MAX: temporal domains are exact from stats alone
    // (checked before the update below — outstanding updates refuse)
    assert(ds.statMinMax("d").contains((dt(1), dt(2))))
    assert(ds.statMinMax("ts").contains((t(1, 0), t(2, 23))))
    // merge-on-read: an update moves a day-1 row to day 3 — both files'
    // ts stats exclude day 3, yet the updated row must appear
    ds.update($"id" === 7L, Map("ts" -> lit(t(3, 0))))
    ds.commit("move to day 3")
    val (moved, p4) = prunedDelta(
      read().filter($"ts" >= t(3, 0)).select("id").as[Long].collect().toSeq)
    assert(moved == Seq(7L), "pruned ts read must still see the updated row")
    assert(p4 >= 2, "both base files excluded by ts stats")
    // a mutated table refuses exact temporal MIN/MAX (update outstanding)
    assert(GraftDataset.load(spark, root).statMinMax("ts").isEmpty)
    val ds2root = tmpDir("tskip2") + "/t"
    val ds2 = GraftDataset.create(spark, ds2root, StructType(Seq(
      StructField("ts", org.apache.spark.sql.types.TimestampType))))
    ds2.append(Seq(Tuple1(t(1, 5)), Tuple1(t(2, 9))).toDF("ts"))
    ds2.commit("rows")
    assert(ds2.statMinMax("ts").contains((t(1, 5), t(2, 9))))
    // files written under LEGACY datetime rebase refuse temporal stats
    // (julian-calendar ancient values would misplace in the decode)
    spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "LEGACY")
    try {
      val root3 = tmpDir("tskip3") + "/t"
      val ds3 = GraftDataset.create(spark, root3, StructType(Seq(
        StructField("ts", org.apache.spark.sql.types.TimestampType))))
      ds3.append(Seq(Tuple1(java.sql.Timestamp.valueOf("1500-01-01 00:00:00")),
        Tuple1(t(1, 0))).toDF("ts"))
      ds3.commit("legacy")
      assert(ds3.statMinMax("ts").isEmpty,
        "legacy-rebase files must not claim exact temporal stats")
      assert(spark.read.format("graft").load(root3)
        .filter($"ts" < t(2, 0)).count() == 2L)
    } finally
      spark.conf.unset("spark.sql.parquet.datetimeRebaseModeInWrite")
  }

  test("decimal stat domain: range filters prune across INT and FIXED encodings") {
    import spark.implicits._
    val root = tmpDir("decskip") + "/t"
    // DECIMAL(12,2) → INT64 footer stats; DECIMAL(25,4) → FIXED bytes
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType),
      StructField("price", org.apache.spark.sql.types.DecimalType(12, 2)),
      StructField("big", org.apache.spark.sql.types.DecimalType(25, 4)))))
    def batch(lo: Int, hi: Int) = (lo until hi).map(i =>
      (i.toLong, new java.math.BigDecimal(s"$i.25"),
        new java.math.BigDecimal(s"${i}000000000000.1234")))
      .toDF("id", "price", "big")
    ds.append(batch(0, 50))
    ds.append(batch(50, 100))
    ds.commit("two price ranges")
    def read() = spark.read.format("graft").load(root)
    def prunedDelta[T](body: => T): (T, Long) = {
      val before = FileSkipping.prunedFiles.get()
      val r = body
      (r, FileSkipping.prunedFiles.get() - before)
    }
    val (n1, p1) = prunedDelta(
      read().filter($"price" >= new java.math.BigDecimal("50.25")).count())
    assert(n1 == 50L && p1 >= 1, s"INT64 decimal range must prune, got $p1")
    val (n2, p2) = prunedDelta(read().filter(
      $"big" < new java.math.BigDecimal("50000000000000.1234")).count())
    assert(n2 == 50L && p2 >= 1, s"FIXED decimal range must prune, got $p2")
    // exactness parity under pruning
    assert(read().filter($"price" < new java.math.BigDecimal("25.00")).count()
      == ds.toDF.filter($"price" < new java.math.BigDecimal("25.00")).count())
    // metadata MIN/MAX: typed decimal values, exact
    assert(ds.statMinMax("price").contains((
      new java.math.BigDecimal("0.25"), new java.math.BigDecimal("99.25"))))
    assert(ds.statMinMax("big").exists(_._2 ==
      new java.math.BigDecimal("99000000000000.1234")))
  }

  test("rename epochs + drop markers: no stale-column resurrection, skipping survives") {
    import spark.implicits._
    val root = tmpDir("epoch") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType), StructField("b", LongType))))
    ds.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "b"))
    ds.commit("v1")
    // delete + recreate: old rows must read NULL for the new column,
    // not the deleted column's stale physical bytes
    ds.deleteTensor("b")
    ds.commit("drop b")
    ds.createTensor("b", LongType)
    ds.append(Seq((3L, 300L)).toDF("id", "b"))
    ds.commit("recreate b")
    val rec = ds.toDF.select("id", "b").as[(Long, Option[Long])]
      .collect().toMap
    assert(rec == Map(1L -> None, 2L -> None, 3L -> Some(300L)),
      s"recreated column must not resurrect deleted values, got $rec")
    // rename the recreated column onto ANOTHER freed name: files from
    // three epochs (pre-drop, pre-rename, post-rename) mix in one scan
    ds.renameTensor("b", "c")
    ds.append(Seq((4L, 4000L)).toDF("id", "c"))
    ds.commit("rename b->c, add post-rename file")
    val mix = ds.toDF.select("id", "c").as[(Long, Option[Long])]
      .collect().toMap
    assert(mix == Map(1L -> None, 2L -> None, 3L -> Some(300L),
      4L -> Some(4000L)), s"epoch-mixed scan wrong: $mix")
    // skipping stats survived the delete+recreate+rename chain: the
    // epoch-1 file (c=300) and epoch-2 file (c=4000) prune against a
    // selective filter on the FINAL name; answers stay exact
    def prunedDelta[T](body: => T): (T, Long) = {
      val before = FileSkipping.prunedFiles.get()
      val r = body
      (r, FileSkipping.prunedFiles.get() - before)
    }
    val (got, d) = prunedDelta(
      spark.read.format("graft").load(root).filter($"c" === 4000L)
        .select("id").as[Long].collect().toSeq)
    assert(got == Seq(4L))
    assert(d >= 1, s"post-rename filter must prune via migrated stats, got $d")
    // observability: describeFiles surfaces each entry's rename epoch —
    // this table's entries span three of them (pre-drop, pre-rename,
    // post-rename)
    val epochs = ds.describeFiles.select("epoch").distinct()
      .as[Int].collect().sorted.toSeq
    assert(epochs == Seq(0, 1, 2), s"expected epochs 0,1,2 got $epochs")
    // rename onto the ORIGINAL freed name: a->b where b was deleted —
    // old files' stale physical b must NOT shadow a's data
    val root2 = tmpDir("epoch2") + "/t"
    val ds2 = GraftDataset.create(spark, root2, StructType(Seq(
      StructField("a", LongType), StructField("b", LongType))))
    ds2.append(Seq((1L, 111L)).toDF("a", "b"))
    ds2.commit("v1")
    ds2.deleteTensor("b")
    ds2.renameTensor("a", "b")
    ds2.commit("drop b, rename a->b")
    assert(ds2.toDF.select("b").as[Long].collect().toSeq == Seq(1L),
      "rename onto a freed name must serve the renamed column, not stale bytes")
    // back-compat: a commit written WITHOUT normalization (statsNormalized
    // absent + non-empty chain) keeps the conservative no-pruning path
    val m0 = CommitLog.readCommit(spark, root, ds.head.get)
    CommitLog.writeCommit(spark, root, m0.copy(
      id = "zzz_legacy", statsNormalized = None))
    val (legacyRows, dLegacy) = prunedDelta(
      spark.read.format("graft").option("commit", "zzz_legacy").load(root)
        .filter($"c" === 4000L).count())
    assert(legacyRows == 1L && dLegacy == 0,
      s"pre-normalization commit must not prune, got $dLegacy")
  }

  test("skipping stat domains: float repr, non-finite bounds, UTF-8 order") {
    import org.apache.spark.sql.sources._
    // (1) float filter values must compare in FLOAT shortest-repr space:
    // widening 1.1f to double (1.100000023841858) sorts ABOVE a file
    // whose max really is 1.1f and wrongly prunes it
    val fstats = Map("c" -> ColStats("0.5", "1.1", "double"))
    assert(!FileSkipping.excludes(fstats, EqualTo("c", 1.1f)),
      "file containing the float value must not prune")
    assert(!FileSkipping.excludes(fstats, GreaterThanOrEqual("c", 1.1f)))
    assert(FileSkipping.excludes(fstats, EqualTo("c", 3.0f)),
      "genuinely excluded float still prunes")
    // (2) non-finite bounds: never throw, never prune
    for (st <- Seq(ColStats("-Infinity", "Infinity", "double"),
                   ColStats("NaN", "NaN", "double"))) {
      val m = Map("c" -> st)
      assert(!FileSkipping.excludes(m, GreaterThan("c", 5.0)))
      assert(!FileSkipping.excludes(m, EqualTo("c", 5.0)))
    }
    // (3) strings compare as unsigned UTF-8 bytes (parquet's stat
    // order): U+E000 < U+1F600 in byte order but the REVERSE in UTF-16
    // code units, so compareTo wrongly pruned a file holding U+E000
    val emoji = new String(Character.toChars(0x1F600))
    val sstats = Map("s" -> ColStats("\uE000", emoji, "string"))
    assert(!FileSkipping.excludes(sstats, EqualTo("s", "\uE000")))
    assert(!FileSkipping.excludes(sstats, StringStartsWith("s", "\uE000")))
    assert(FileSkipping.excludes(sstats, EqualTo("s", "zzz")),
      "byte order still prunes below the min")

    // end-to-end: real footers, real pushdown
    import spark.implicits._
    val root = tmpDir("skipdom") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType))))
    ds.append(Seq((1L, 0.5f, 1.0, "\uE000"), (2L, 1.1f, 2.0, emoji))
      .toDF("id", "f", "d", "s"))
    ds.append(Seq((3L, 7.7f, Double.PositiveInfinity, "plain"))
      .toDF("id", "f", "d", "s"))
    ds.commit("domains")
    def read() = spark.read.format("graft").load(root)
    // float equality on a value that IS a file's max: row must survive,
    // and the disjoint high-range file still prunes
    val before = FileSkipping.prunedFiles.get()
    assert(read().filter($"f" === 1.1f).select("id").as[Long]
      .collect().toSeq == Seq(2L))
    assert(FileSkipping.prunedFiles.get() - before >= 1,
      "disjoint float file should still prune")
    // Infinity in the stats: filtered scan must plan (not throw) and
    // still see the row
    assert(read().filter($"d" >= 100.0).select("id").as[Long]
      .collect().toSeq == Seq(3L))
    // supplementary-plane string file: equality on its min survives
    assert(read().filter($"s" === "\uE000").count() == 1L)
    assert(read().filter($"s".startsWith("\uE000")).count() == 1L)
  }

  test("range-clustered compaction + per-file stats: Z-order-lite skipping") {
    import spark.implicits._
    val root = tmpDir("zlite") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType))))
    // ingest SHUFFLED so pre-compaction files interleave the key range
    val rnd = new scala.util.Random(7)
    ds.append(rnd.shuffle((1L to 400L).toVector)
      .map(i => (i, i * 0.5)).toDF("id", "v"))
    ds.commit("shuffled")
    ds.compact(clusterBy = Seq("id"))
    ds.commit("clustered")
    val compactFiles = new java.io.File(root, "data").listFiles()
      .filter(_.getName.startsWith("compact-")).head
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(compactFiles >= 2, "need multiple files for skipping to matter")
    val before = FileSkipping.prunedFiles.get()
    val got = spark.read.format("graft").load(root)
      .filter($"id".between(10L, 20L)).select("id").as[Long].collect().toSet
    val pruned = FileSkipping.prunedFiles.get() - before
    assert(got == (10L to 20L).toSet)
    // range partitioning → one file covers [10,20]; the rest prune
    assert(pruned == compactFiles - 1,
      s"expected ${compactFiles - 1} of $compactFiles files pruned, got $pruned")
    // observability: describeFiles shows per-file id bounds, and range
    // clustering means the per-file [min,max] windows do not overlap
    val bounds = GraftDataset.load(spark, root).describeFiles
      .filter($"column" === "id")
      .select($"min".cast("long"), $"max".cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(bounds.length == compactFiles)
    assert(bounds.sliding(2).forall {
      case Array((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"overlapping clustered files: ${bounds.toSeq}")
  }

  test("null-count skipping: IsNull / IsNotNull / all-null value predicates") {
    import spark.implicits._
    val root = tmpDir("nullskip") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType))))
    // three base entries: fully populated, all-null, mixed
    ds.append(Seq((1L, Some(1.0)), (2L, Some(2.0))).toDF("id", "v"))
    ds.append(Seq((3L, None: Option[Double]), (4L, None: Option[Double]))
      .toDF("id", "v"))
    ds.append(Seq((5L, Some(5.0)), (6L, None: Option[Double])).toDF("id", "v"))
    ds.commit("null domains")
    def read() = spark.read.format("graft").load(root)
    def pruned(body: => Unit): Long = {
      val before = FileSkipping.prunedFiles.get()
      body
      FileSkipping.prunedFiles.get() - before
    }
    // IS NULL: the no-null file prunes; answers stay exact
    val p1 = pruned {
      assert(read().filter($"v".isNull).select("id").as[Long]
        .collect().sorted.toSeq == Seq(3L, 4L, 6L))
    }
    assert(p1 >= 1, "file with zero nulls must prune for IS NULL")
    // IS NOT NULL: the all-null file prunes
    val p2 = pruned {
      assert(read().filter($"v".isNotNull).select("id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L, 5L))
    }
    assert(p2 >= 1, "all-null file must prune for IS NOT NULL")
    // a value predicate can never match an all-null file (3VL), and the
    // range stats prune the disjoint populated file too
    val p3 = pruned {
      assert(read().filter($"v" === 5.0).select("id").as[Long]
        .collect().toSeq == Seq(5L))
    }
    assert(p3 >= 2, s"all-null AND range-disjoint files must prune, got $p3")
    // observability: describeFiles surfaces the null counts, including
    // the count-only (all-null) entry whose min/max are absent
    val vStats = GraftDataset.load(spark, root).describeFiles
      .filter($"column" === "v")
      .select($"min", $"nulls", $"rows")
      .collect().map(r => (r.isNullAt(0), r.getLong(1), r.getLong(2)))
    assert(vStats.nonEmpty)
    // every all-null file shows counts but NO min/max; every populated
    // file shows both; counts always sum to the file's rows
    assert(vStats.forall { case (noRange, nulls, rows) =>
      rows > 0 && nulls <= rows && (noRange == (nulls == rows)) })
    assert(vStats.exists { case (_, n, _) => n == 0 }, "a no-null file")
    assert(vStats.exists { case (_, n, r) => n == r }, "an all-null file")
    assert(vStats.map(_._3).sum == 6L, "rows across v files")
  }

  test("asOfTimestamp time travel resolves the newest commit at-or-before") {
    import spark.implicits._
    val root = tmpDir("asof") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType))))
    ds.append(Seq(1L, 2L).toDF("id")); val c1 = ds.commit("two rows")
    Thread.sleep(5)
    ds.append(Seq(3L).toDF("id")); ds.commit("third row")
    val ts1 = CommitLog.readCommit(spark, root, c1).timestampMs
    def readAsOf(v: String) = spark.read.format("graft")
      .option("asOfTimestamp", v).load(root)
    // epoch millis, exactly at c1 → snapshot of c1
    assert(readAsOf(ts1.toString).count() == 2)
    // ISO instant just after c1, before c2
    assert(readAsOf(java.time.Instant.ofEpochMilli(ts1 + 1).toString)
      .count() == 2)
    // far future → head
    assert(readAsOf((ts1 + 3600_000L).toString).count() == 3)
    // before the first commit → clear error
    val e = intercept[IllegalArgumentException](readAsOf("0").count())
    assert(e.getMessage.contains("no commit at or before"))
    // mutually exclusive with 'commit'
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("asOfTimestamp", ts1.toString)
        .option("commit", c1).load(root)
    }
    // the Scala factory resolves identically
    assert(GraftDataset.loadAsOf(spark, root, ts1).toDF.count() == 2)
  }

  test("sizeInBytes: manifest-sized stats make small graft tables broadcast") {
    import spark.implicits._
    val root = tmpDir("szstats") + "/t"
    val dim = (1L to 50L).map(i => (i, s"name$i")).toDF("k", "name")
    dim.write.format("graft").save(root)
    // the relation reports the real manifest bytes, not defaultSizeInBytes
    val rel = GraftRelation(spark, root, None, None, withUuid = false)
    val reported = rel.sizeInBytes
    assert(reported > 0L && reported < (1L << 20),
      s"manifest-sized stats expected, got $reported")
    // join a big fact against the small graft dim: planner must
    // broadcast the graft side (it would shuffle under the default
    // Long.MaxValue-ish stats)
    val fact = spark.range(0, 100000L).select(($"id" % 50 + 1).as("k"), $"id")
    val plan = fact.join(spark.read.format("graft").load(root), "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // growing the table invalidates via the commit id, not a stale cache
    val ds = GraftDataset.load(spark, root)
    ds.append(dim); ds.commit("more")
    assert(rel.sizeInBytes > reported)
  }

  test("filter translation covers the V1 predicate algebra") {
    import org.apache.spark.sql.sources._
    def t(f: Filter): Option[String] =
      GraftRelation.toColumn(f).map(_.toString)
    assert(t(EqualTo("id", 1)).isDefined)
    assert(t(In("v", Array("a", "b"))).isDefined)
    assert(t(And(IsNotNull("v"), GreaterThan("n", 0.0))).isDefined)
    assert(t(Or(IsNull("v"), LessThanOrEqual("n", 1.0))).isDefined)
    assert(t(Not(StringContains("v", "x"))).isDefined)
    assert(t(EqualNullSafe("v", "a")).isDefined)
    assert(t(StringStartsWith("v", "a")).isDefined)
    assert(t(StringEndsWith("v", "a")).isDefined)
    assert(t(AlwaysTrue()).isDefined && t(AlwaysFalse()).isDefined)
    // the V1 Filter algebra is sealed and fully covered; the translator's
    // None fallback only guards future Spark additions
  }
}
