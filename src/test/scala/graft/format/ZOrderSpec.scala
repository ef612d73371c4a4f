package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftnative.ZOrder
import org.apache.spark.unsafe.types.UTF8String

/** True multi-column Z-order compaction: Morton-interleaved rank
  * buckets make per-file min/max tight on EVERY cluster column, so
  * manifest skipping prunes single-column predicates on any of them —
  * the property lexicographic range-clustering only has for the
  * leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches the naive bit-position definition") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(3)
      val bits = 1 + rnd.nextInt(math.min(30, 63 / n))
      val ids = Array.fill(n)(rnd.nextInt(1 << bits))
      var expect = 0L
      for (k <- 0 until bits; j <- 0 until n)
        expect |= ((ids(j).toLong >> k) & 1L) << (k * n + j)
      assert(ZOrder.interleave(ids, bits) == expect)
    }
  }

  test("bucket functions are monotone and boundary-consistent") {
    val b = Array(10.0, 20.0, 30.0)
    assert(ZOrder.bucketDouble(5.0, b) == 0)
    assert(ZOrder.bucketDouble(10.0, b) == 1) // boundary belongs right
    assert(ZOrder.bucketDouble(15.0, b) == 1)
    assert(ZOrder.bucketDouble(30.0, b) == 3)
    assert(ZOrder.bucketDouble(99.0, b) == 3)
    val sb = Array("bb", "dd").map(UTF8String.fromString)
    assert(ZOrder.bucketString(UTF8String.fromString("aa"), sb) == 0)
    assert(ZOrder.bucketString(UTF8String.fromString("bb"), sb) == 1)
    assert(ZOrder.bucketString(UTF8String.fromString("cc"), sb) == 1)
    assert(ZOrder.bucketString(UTF8String.fromString("zz"), sb) == 2)
  }

  private def gridTable(root: String): GraftDataset = {
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("x", LongType), StructField("y", LongType),
      StructField("v", DoubleType))))
    val rnd = new scala.util.Random(3)
    ds.append(rnd.shuffle(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, x + y * 0.5))
        .toVector).toDF("x", "y", "v"))
    ds.commit("grid")
    ds
  }

  test("zorder compaction prunes on BOTH columns; range only on the first") {
    val zroot = tmpDir("zord") + "/t"
    val zds = gridTable(zroot)
    zds.compact(clusterBy = Seq("x", "y"), zorder = true)
    zds.commit("zordered")
    val rroot = tmpDir("zrange") + "/t"
    val rds = gridTable(rroot)
    rds.compact(clusterBy = Seq("x", "y"))
    rds.commit("ranged")

    def prunedOn(root: String, c: String): Long = {
      val before = FileSkipping.prunedFiles.get()
      val got = spark.read.format("graft").load(root)
        .filter(col(c) === 5L).count()
      assert(got == 64L, s"correctness on $c filter")
      FileSkipping.prunedFiles.get() - before
    }
    // leading column: both layouts prune
    assert(prunedOn(zroot, "x") >= 1, "zorder must prune on x")
    assert(prunedOn(rroot, "x") >= 1, "range must prune on x")
    // trailing column: only the Morton layout localizes y
    assert(prunedOn(zroot, "y") >= 1, "zorder must prune on y")
    assert(prunedOn(rroot, "y") == 0,
      "lexicographic files each span the full y range")
    // logical rows unchanged by the rewrite
    assert(GraftDataset.load(spark, zroot).toDF.count() == 64L * 64L)
    assert(spark.read.format("graft").load(zroot)
      .agg(sum(col("x") + col("y"))).head().getLong(0) ==
      (0L until 64L).map(x => (0L until 64L).map(x + _).sum).sum)
  }

  test("bloom filters: compact writes native parquet blooms for named columns") {
    val root = tmpDir("bloom") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    ds.append((1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v"))
    ds.commit("rows")
    ds.compact(clusterBy = Seq("id"), bloomFilterFor = Seq("v"),
      bloomExpectedNdv = 2000L)
    ds.commit("bloomed")
    // the written files carry a readable bloom for v and none for id
    val conf = spark.sparkContext.hadoopConfiguration
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    val fs = dataDir.getFileSystem(conf)
    val compactFiles = fs.listStatus(dataDir)
      .filter(_.getPath.getName.startsWith("compact-"))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(compactFiles.nonEmpty)
    var sawBloom = false
    compactFiles.foreach { st =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try r.getFooter.getBlocks.forEach { block =>
        val rdr = r.getBloomFilterDataReader(block)
        block.getColumns.forEach { cc =>
          val bloom = rdr.readBloomFilter(cc)
          if (cc.getPath.toDotString == "v") {
            assert(bloom != null, "v must carry a bloom filter")
            sawBloom = true
          } else if (cc.getPath.toDotString == "id")
            assert(bloom == null, "id must not carry one")
        }
      } finally r.close()
    }
    assert(sawBloom)
    // point lookup answers correctly through the bloom-enabled scan
    assert(spark.read.format("graft").load(root)
      .filter(col("v") === "v1234").count() == 1L)
    assert(spark.read.format("graft").load(root)
      .filter(col("v") === "nope").count() == 0L)
  }

  test("string cluster column: sampled byte-order buckets prune equality") {
    val root = tmpDir("zstr") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("cat", StringType), StructField("y", LongType))))
    val rnd = new scala.util.Random(5)
    ds.append(rnd.shuffle(
      (for (c <- 0 until 64; y <- 0L until 64L)
        yield (f"cat$c%02d", y)).toVector).toDF("cat", "y"))
    ds.commit("grid")
    ds.compact(clusterBy = Seq("cat", "y"), zorder = true)
    ds.commit("zordered")
    val before = FileSkipping.prunedFiles.get()
    val got = spark.read.format("graft").load(root)
      .filter($"cat" === "cat42").count()
    assert(got == 64L)
    assert(FileSkipping.prunedFiles.get() - before >= 1,
      "equality on the string cluster column must prune files")
  }

  test("string bucket ids stay below 2^bits for awkward sample sizes") {
    // a sample length that is NOT a multiple of the bucket count used
    // to emit ~2x too many boundaries via the step walk, and ids ≥
    // 2^bits alias onto LOW ranks inside the interleave — the probe
    // construction must cap boundaries at nBuckets-1 by design
    val root = tmpDir("zcap") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("s", StringType), StructField("y", LongType))))
    val rnd = new scala.util.Random(7)
    // 3000 distinct strings: fraction sampling lands on an arbitrary,
    // non-power-of-two sample length
    ds.append(rnd.shuffle((0 until 3000).map(i =>
      (f"k$i%05d", i.toLong)).toVector).toDF("s", "y"))
    ds.commit("rows")
    val key = ds.zorderKey(ds.toDF, Seq("s", "y"))
    val ids = ds.toDF.select(key.as("z")).agg(max($"z")).head().getLong(0)
    // 2 cluster columns → bits = min(10, 63/2) = 10 each → interleaved
    // key < 2^20; an overflowing bucket id would exceed this
    assert(ids < (1L << 20), s"interleaved key overflowed: $ids")
    // and the zordered table still prunes string equality exactly
    ds.compact(clusterBy = Seq("s", "y"), zorder = true)
    ds.commit("zordered")
    assert(spark.read.format("graft").load(root)
      .filter($"s" === "k01500").count() == 1L)
  }

  test("zorder compaction on a DATE cluster column plans and prunes") {
    val root = tmpDir("zdate") + "/t"
    val ds = GraftDataset.create(spark, root, StructType(Seq(
      StructField("d", DateType), StructField("k", LongType))))
    val rnd = new scala.util.Random(11)
    ds.append(rnd.shuffle((0 until 2048).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(18000 + i / 8)),
        i.toLong)).toVector).toDF("d", "k"))
    ds.commit("dates")
    // DATE → double is an illegal direct cast; the key must route it
    // through timestamp or this throws at plan time
    ds.compact(clusterBy = Seq("d", "k"), zorder = true)
    ds.commit("zordered")
    assert(ds.toDF.count() == 2048)
    val got = ds.toDF
      .filter($"d" === java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(18100)))
      .count()
    assert(got == 8L)
  }

  test("an all-null row group keeps the file's bounds and the table's MIN/MAX") {
    // one sparse row group must not erase a column's min/max for the
    // whole FILE (value pruning lost) nor — via statMinMax's no-stats
    // refusal — disable metadata MIN/MAX for the whole TABLE
    val root = tmpDir("allnull_rg")
    val rel = "data"
    // tiny block size + 300 sorted rows → multiple row groups, the
    // leading one entirely null in `v` (parquet checks sizes every 100
    // rows, so each group holds >= 100)
    val rows = (0 until 150).map(i => (i.toLong, Option.empty[Long])) ++
      (150 until 300).map(i => (i.toLong, Some(i.toLong)))
    rows.toDF("id", "v").coalesce(1)
      .sortWithinPartitions("id")
      .write.option("parquet.block.size", "512")
      .option("parquet.page.size", "256")
      .parquet(s"$root/$rel")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType)))
    val stats = FileSkipping.footerStats(spark, root, rel, schema)
    assert(stats.nonEmpty)
    val fileStats = stats.values.head
    // sanity: the layout really produced an all-null leading row group
    // (if parquet ever coalesces to one group, min exists trivially and
    // the test still pins the bounds below)
    val v = fileStats.get("v")
    assert(v.isDefined, s"column v lost its stats entirely: $fileStats")
    assert(v.get.typ == "long" && v.get.min == "150" && v.get.max == "299",
      s"all-null row group erased v's bounds: ${v.get}")
    assert(v.get.nulls.contains(150L) && v.get.rows.contains(300L))
  }
}
