package graft.format

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftExtensions
import org.apache.spark.sql.types._

/** SQL-level metadata aggregates: ungrouped, unfiltered COUNT/MIN/MAX
  * over a graft relation must collapse to a LocalRelation (no scan at
  * all) exactly when the manifest can prove the answer, and must NOT
  * rewrite when it cannot.
  */
class MetadataAggregateSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.install(spark)

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collectFirst { case l: LocalRelation => l }.isDefined &&
      p.collectFirst { case r: LogicalRelation => r }.isEmpty
  }

  private def table(tag: String): GraftDataset = {
    val ds = GraftDataset.create(spark, tmpDir(tag) + "/t", StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("x", DoubleType))))
    ds.append(Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "s", "x"))
    ds.append(Seq((10L, "z", -4.5)).toDF("id", "s", "x"))
    ds.commit("rows")
    ds
  }

  test("COUNT(*) is metadata-only, exact through updates and tombstones") {
    val ds = table("magg1")
    def read() = spark.read.format("graft").load(ds.root)
    val q0 = read().agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(q0), s"plan kept a scan:\n${q0.queryExecution.optimizedPlan}")
    assert(q0.head().getLong(0) == 4L)
    // updates and pops keep COUNT provable (uuid population bookkeeping)
    ds.update($"id" === 1L, Map("x" -> lit(9.9)))
    ds.pop($"id" === 2L)
    ds.commit("mutate")
    val q1 = read().agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(q1))
    assert(q1.head().getLong(0) == 3L)
    assert(q1.head().getLong(0) == read().count())
  }

  test("MIN/MAX from stats: typed values, exact; refused under mutations") {
    val ds = table("magg2")
    def read() = spark.read.format("graft").load(ds.root)
    val q = read().agg(min($"id").as("lo"), max($"id").as("hi"),
      min($"x").as("xlo"), max($"x").as("xhi"),
      min($"s").as("slo"), max($"s").as("shi"), count(lit(1)).as("n"))
    assert(isMetadataOnly(q), s"plan kept a scan:\n${q.queryExecution.optimizedPlan}")
    val r = q.head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == -4.5 && r.getDouble(3) == 3.5)
    assert(r.getString(4) == "a" && r.getString(5) == "z")
    assert(r.getLong(6) == 4L)
    // an outstanding update makes MIN/MAX unprovable: whole rewrite off,
    // answer still correct via the scan
    ds.update($"id" === 10L, Map("id" -> lit(99L)))
    ds.commit("moved the max")
    val q2 = read().agg(min($"id").as("lo"), max($"id").as("hi"))
    assert(!isMetadataOnly(q2), "must not trust stats across updates")
    assert(q2.head().getLong(1) == 99L)
    // COUNT alone stays metadata-only even now
    assert(isMetadataOnly(read().agg(count(lit(1)).as("n"))))
    // compact folds the mutations -> stats speak again
    ds.compact(); ds.commit("compacted")
    val q3 = read().agg(max($"id").as("hi"))
    assert(isMetadataOnly(q3))
    assert(q3.head().getLong(0) == 99L)
  }

  test("MIN/MAX stay metadata-only across a rename (migrated stat keys)") {
    val ds = table("magg6")
    ds.renameTensor("id", "key")
    ds.commit("renamed")
    val q = spark.read.format("graft").load(ds.root)
      .agg(min($"key").as("lo"), max($"key").as("hi"))
    assert(isMetadataOnly(q),
      s"rename must keep stats provable:\n${q.queryExecution.optimizedPlan}")
    val r = q.head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L)
  }

  test("late-added all-null column: MIN/MAX prove NULL from synth stats") {
    val ds = table("magg3")
    ds.createTensor("y", LongType)
    ds.commit("added y")
    val q = spark.read.format("graft").load(ds.root)
      .agg(min($"y").as("lo"), max($"y").as("hi"))
    assert(isMetadataOnly(q), s"plan kept a scan:\n${q.queryExecution.optimizedPlan}")
    val r = q.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("filters, grouping, and DISTINCT disable the rewrite") {
    val ds = table("magg4")
    def read() = spark.read.format("graft").load(ds.root)
    val filtered = read().filter($"id" > 1L).agg(count(lit(1)).as("n"))
    assert(!isMetadataOnly(filtered))
    assert(filtered.head().getLong(0) == 3L)
    val grouped = read().groupBy($"s").agg(count(lit(1)).as("n"))
    assert(!isMetadataOnly(grouped))
    val distinct = read().agg(countDistinct($"s").as("n"))
    assert(!isMetadataOnly(distinct))
    assert(distinct.head().getLong(0) == 4L)
  }

  test("miss path is plan-only: zero Spark jobs, zero manifest reads") {
    // the rewrite runs on EVERY optimized plan — a miss (grouped agg,
    // unsupported aggregate) must cost nothing: no Spark job during
    // optimization and no commit-log I/O beyond what loading the
    // relation already did
    val ds = table("maggmiss")
    val df = spark.read.format("graft").load(ds.root)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    @volatile var sentinelSeen = false
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null && "magg-miss-sentinel" ==
            js.properties.getProperty("spark.jobGroup.id"))
          sentinelSeen = true
        else jobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val reads0 = CommitLog.commitReads.get()
      val grouped = df.groupBy($"s").agg(count(lit(1)).as("n"))
      val unsupported = df.agg(avg($"x").as("m"))
      val filtered = df.filter($"id" > 1L).agg(count(lit(1)).as("n"))
      grouped.queryExecution.optimizedPlan
      unsupported.queryExecution.optimizedPlan
      filtered.queryExecution.optimizedPlan
      assert(CommitLog.commitReads.get() == reads0,
        "miss-path optimization must read no commit metadata")
      // listener events are async but FIFO: once the group-tagged
      // sentinel's start event is observed, every job started before it
      // has been counted — so the total must be exactly the sentinel
      spark.sparkContext.setJobGroup("magg-miss-sentinel", "sentinel")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!sentinelSeen && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(sentinelSeen, "sentinel job never observed")
      assert(jobs.get() == 0,
        s"optimization of miss-path plans ran ${jobs.get()} extra jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("temporal MIN/MAX collapse to metadata: typed timestamp/date values") {
    val ds = GraftDataset.create(spark, tmpDir("maggts") + "/t",
      StructType(Seq(StructField("id", LongType),
        StructField("ts", TimestampType), StructField("d", DateType))))
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    ds.append(Seq((1L, t("2026-03-01 08:30:00"), java.sql.Date.valueOf("2026-03-01")),
      (2L, t("2026-03-02 23:45:00"), java.sql.Date.valueOf("2026-03-02")))
      .toDF("id", "ts", "d"))
    ds.commit("rows")
    val q = spark.read.format("graft").load(ds.root)
      .agg(min($"ts").as("tlo"), max($"ts").as("thi"),
        min($"d").as("dlo"), max($"d").as("dhi"))
    assert(isMetadataOnly(q), s"plan kept a scan:\n${q.queryExecution.optimizedPlan}")
    val r = q.head()
    assert(r.getTimestamp(0) == t("2026-03-01 08:30:00") &&
      r.getTimestamp(1) == t("2026-03-02 23:45:00"))
    assert(r.getDate(2) == java.sql.Date.valueOf("2026-03-01") &&
      r.getDate(3) == java.sql.Date.valueOf("2026-03-02"))
    // parity with the scan answer
    val full = ds.toDF.agg(min($"ts"), max($"ts"), min($"d"), max($"d")).head()
    assert(full == r)
  }

  test("decimal MIN/MAX collapse to metadata: typed values at the column scale") {
    val ds = GraftDataset.create(spark, tmpDir("maggdec") + "/t",
      StructType(Seq(StructField("id", LongType),
        StructField("price", DecimalType(12, 2)),
        StructField("big", DecimalType(25, 4)))))
    ds.append(Seq(
      (1L, new java.math.BigDecimal("10.50"),
        new java.math.BigDecimal("1000000000000.1234")),
      (2L, new java.math.BigDecimal("99.25"),
        new java.math.BigDecimal("9000000000000.9999")))
      .toDF("id", "price", "big"))
    ds.commit("rows")
    val q = spark.read.format("graft").load(ds.root)
      .agg(min($"price").as("plo"), max($"price").as("phi"),
        min($"big").as("blo"), max($"big").as("bhi"))
    assert(isMetadataOnly(q), s"plan kept a scan:\n${q.queryExecution.optimizedPlan}")
    val r = q.head()
    assert(r.getDecimal(0) == new java.math.BigDecimal("10.50") &&
      r.getDecimal(1) == new java.math.BigDecimal("99.25"))
    assert(r.getDecimal(2) == new java.math.BigDecimal("1000000000000.1234") &&
      r.getDecimal(3) == new java.math.BigDecimal("9000000000000.9999"))
    assert(ds.toDF.agg(min($"price"), max($"price"),
      min($"big"), max($"big")).head() == r)
    // presentation wrappers — casts, arithmetic, COALESCE, nesting —
    // must FOLD through the rewrite (literal substitution + driver
    // eval) instead of silently bringing the scan back
    val qc = spark.read.format("graft").load(ds.root)
      .agg(min($"price").cast("string").as("lo"),
        max($"price").cast("double").cast("string").as("hi2"),
        (max($"price") + lit(1)).as("plus"),
        coalesce(min($"price"), lit(0)).as("co"),
        count(lit(1)).cast("int").as("n"))
    assert(isMetadataOnly(qc), s"wrapped aggregates kept a scan:\n${
      qc.queryExecution.optimizedPlan}")
    val rc = qc.head()
    assert(rc.getString(0) == "10.50" && rc.getString(1) == "99.25")
    assert(rc.getDecimal(2) == new java.math.BigDecimal("100.25") &&
      rc.getDecimal(3) == new java.math.BigDecimal("10.50") &&
      rc.getInt(4) == 2)
    // a NONDETERMINISTIC wrapper refuses (the value would be wrong to
    // pre-evaluate once on the driver)
    val qn = spark.read.format("graft").load(ds.root)
      .agg((min($"price") + rand()).as("r"))
    assert(!isMetadataOnly(qn), "nondeterministic wrapper must keep the scan")
    // USER code never runs inside the optimizer: a (deterministic-by-
    // default) ScalaUDF wrapper must keep the scan and evaluate at
    // execution time, not get frozen into the plan
    val f = org.apache.spark.sql.functions.udf((d: java.math.BigDecimal) =>
      if (d == null) "" else d.toPlainString)
    val qu = spark.read.format("graft").load(ds.root)
      .agg(f(min($"price")).as("u"))
    assert(!isMetadataOnly(qu), "UDF wrapper must keep the scan")
    assert(qu.head().getString(0) == "10.50")
  }

  test("string MIN/MAX refused when parquet stats truncation is configured") {
    // with parquet.statistics.truncate.length set, the footer's BINARY
    // max is an incremented prefix — a covering bound, not a value present
    // in the data. Capture marks such string stats bound-only; the exact
    // MIN/MAX path must refuse them (pruning may still use the bounds).
    // Numeric stats are unaffected by truncation and stay exact.
    // set at the SESSION level — the same route a user takes, and the
    // one Spark's write path overlays into its job conf; capture must
    // see it there (the base sparkContext hadoop conf never changes)
    spark.conf.set("parquet.statistics.truncate.length", "4")
    try {
      val ds = GraftDataset.create(spark, tmpDir("maggtr") + "/t",
        StructType(Seq(StructField("id", LongType),
          StructField("s", StringType))))
      ds.append(Seq((1L, "aardvark-long-value"), (2L, "zebra-long-value"))
        .toDF("id", "s"))
      ds.commit("rows")
      assert(ds.statMinMax("s").isEmpty,
        "truncated string stats must not answer exact MIN/MAX")
      assert(ds.statMinMax("id").contains((1L, 2L)),
        "numeric stats stay exact under string truncation")
      val q = spark.read.format("graft").load(ds.root)
        .agg(min($"s").as("lo"), max($"s").as("hi"))
      assert(!isMetadataOnly(q), "rewrite must keep the scan")
      val r = q.head()
      assert(r.getString(0) == "aardvark-long-value" &&
        r.getString(1) == "zebra-long-value")
    } finally spark.conf.unset("parquet.statistics.truncate.length")
  }

  test("SQL surface: SELECT COUNT(*)/MIN/MAX over a graft temp view") {
    val ds = table("magg5")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW magg_v " +
      s"USING graft OPTIONS (path '${ds.root}')")
    try {
      val q = spark.sql(
        "SELECT COUNT(*) AS n, MIN(id) AS lo, MAX(s) AS hi FROM magg_v")
      assert(isMetadataOnly(q), s"plan kept a scan:\n${q.queryExecution.optimizedPlan}")
      val r = q.head()
      assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getString(2) == "z")
      // the q122 shape: a CROSS JOIN whose right side is a pure
      // ungrouped aggregate — THAT side must collapse to a
      // LocalRelation even though the left keeps its (filtered) scan
      val qj = spark.sql("""SELECT * FROM
          (SELECT COUNT(*) AS n FROM magg_v WHERE id > 1)
        CROSS JOIN
          (SELECT CAST(MIN(id) AS STRING) AS lo FROM magg_v)""")
      val p = qj.queryExecution.optimizedPlan
      assert(p.collectFirst { case l: LocalRelation => l }.isDefined,
        s"aggregate side of the join must collapse:\n$p")
      assert(p.collect { case r: LogicalRelation => r }.size == 1,
        s"exactly ONE scan (the filtered side) must remain:\n$p")
      val rj = qj.head()
      assert(rj.getLong(0) == 3L && rj.getString(1) == "1")
    } finally spark.sql("DROP VIEW IF EXISTS magg_v")
  }
}
