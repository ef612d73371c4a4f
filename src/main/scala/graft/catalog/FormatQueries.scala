package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.dec2
import graft.format.GraftDataset
import graft.operators.Cond
import graft.sources.IO

/** Oracle-checked queries THROUGH the versioned table format: each builds
  * a Graft table from the driver's parquet, applies format operations
  * (append / update / pop / branch / merge), then answers a relational
  * query over the resulting snapshot. The DuckDB oracle simulates the same
  * mutations with plain SQL over the source table — so the driver's gate
  * verifies the format's merge-on-read, tombstone, and merge semantics,
  * not just the query layer.
  */
object FormatQueries {

  private def freshRoot(tag: String): String =
    graft.QueryCleanup.tempRoot(tag)

  val all: Seq[QueryDef] = Seq(

    // catalog-named graft table, pure-SQL surface (the r9/r10 punch-list
    // "catalog integration" item): saveAsTable names an external graft
    // table in the session catalog, INSERT INTO runs through
    // GraftRelation.insert as one append COMMIT, and the read is
    // spark.sql over the table NAME — no path in any user-facing query.
    // The oracle replays the same content arithmetic over the source
    // parquet.
    QueryDef("q52_format_named_table",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars")
        val tbl = "q52_named_docs"
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        graft.QueryCleanup.registerTable(tbl)
        docs.filter(col("doc_id") < 400L).write.format("graft")
          .option("path", freshRoot("q52")).saveAsTable(tbl)
        docs.filter(col("doc_id") >= 400L && col("doc_id") < 450L)
          .createOrReplaceTempView("q52_delta")
        graft.QueryCleanup.registerTempView("q52_delta")
        s.sql(s"INSERT INTO $tbl SELECT * FROM q52_delta")
        s.sql(s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars
          FROM $tbl GROUP BY lang ORDER BY lang""")
      },
      Some("""SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents WHERE doc_id < 450
        GROUP BY lang ORDER BY lang""")),

    // ingest → snapshot read → filter_vectorized + aggregate
    QueryDef("q70_format_roundtrip_agg",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        val ds = IO.fromDataFrame(li, freshRoot("q70"))
        ds.filterVectorized(Seq(Cond("l_quantity", ">", 30.0)))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem WHERE l_quantity > 30
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // merge-on-read update files + tombstones answer queries correctly
    QueryDef("q71_format_update_pop",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        val ds = IO.fromDataFrame(o, freshRoot("q71"))
        ds.update(col("o_orderpriority").startsWith("1"),
          Map("o_orderstatus" -> lit("U")))
        ds.pop(col("o_orderstatus") === "F")
        ds.commit("mutated")
        ds.toDF.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (SELECT
          CASE WHEN o_orderpriority LIKE '1%' THEN 'U' ELSE o_orderstatus END
            AS o_orderstatus, o_totalprice
        FROM orders)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM m WHERE o_orderstatus <> 'F'
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ragged alignment: partial appends (skip_ok) → maxView pads with
    // nulls, minView keeps fully-populated rows only
    QueryDef("q73_format_ragged_views",
      (s, dir) => {
        val n = Tables.load(s, dir, "nation")
        val ds = IO.fromDataFrame(n, freshRoot("q73"))
        // partial rows: region keys appended into n_nationkey only
        ds.append(Tables.load(s, dir, "region")
          .select((col("r_regionkey") + 100).as("n_nationkey")))
        ds.commit("partial rows")
        val mx = ds.maxView
          .groupBy(when(col("n_name").isNull, lit("padded"))
            .otherwise(lit("full")).as("kind"))
          .agg(count(lit(1)).as("n"))
        val mn = ds.minView.agg(count(lit(1)).as("n"))
          .select(lit("min_view").as("kind"), col("n"))
        mx.unionByName(mn).orderBy("kind")
      },
      Some("""WITH all_rows AS (
          SELECT n_nationkey, n_name, n_regionkey FROM nation
          UNION ALL
          SELECT r_regionkey + 100, NULL, NULL FROM region),
        mx AS (SELECT CASE WHEN n_name IS NULL THEN 'padded' ELSE 'full' END
            AS kind, COUNT(*) AS n
          FROM all_rows GROUP BY 1),
        mn AS (SELECT 'min_view' AS kind, COUNT(*) AS n
          FROM all_rows
          WHERE n_nationkey IS NOT NULL AND n_name IS NOT NULL
            AND n_regionkey IS NOT NULL)
        SELECT kind, n FROM mx
        UNION ALL SELECT kind, n FROM mn
        ORDER BY kind""")),

    // time travel: snapshot at a pre-mutation commit is unchanged
    QueryDef("q74_format_time_travel",
      (s, dir) => {
        val n = Tables.load(s, dir, "nation")
        val ds = IO.fromDataFrame(n, freshRoot("q74"))
        val before = ds.head.get
        ds.pop(col("n_regionkey") === 0)
        ds.update(col("n_regionkey") === 1, Map("n_name" -> lit("GONE")))
        ds.commit("mutations")
        ds.snapshotAt(before).orderBy("n_nationkey")
      },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // saved views are PINNED to the commit they were saved at: mutations
    // after saveView (update + pop + append) must not change the view —
    // the oracle is the pre-mutation predicate over the source table
    QueryDef("q75_format_saved_view",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val ds = IO.fromDataFrame(o, freshRoot("q75"))
        ds.saveView("big", col("o_totalprice") > 400000.0)
        ds.update(col("o_totalprice") > 500000.0,
          Map("o_orderstatus" -> lit("MUTATED")))
        ds.pop(col("o_totalprice") > 450000.0)
        ds.commit("post-save mutations")
        ds.loadView("big").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_totalprice > 400000.0 ORDER BY o_orderkey""")),

    // per-tensor diff between two commits: update touches ONE tensor of
    // surviving rows, pop removes whole rows → every tensor reports them;
    // the oracle recomputes both counts with plain SQL
    QueryDef("q80_format_tensor_diff",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        val ds = IO.fromDataFrame(c, freshRoot("q80"))
        val c1 = ds.head.get
        ds.update(col("c_acctbal") < 0, Map("c_mktsegment" -> lit("NEGBAL")))
        ds.pop(col("c_custkey") % 10 === 0)
        val c2 = ds.commit("mutations")
        ds.tensorDiff(c1, c2)
          .groupBy("tensor", "change").agg(count(lit(1)).as("n"))
          .orderBy("tensor", "change")
      },
      Some("""WITH rem AS (SELECT COUNT(*) AS n FROM customer
          WHERE c_custkey % 10 = 0),
        upd AS (SELECT COUNT(*) AS n FROM customer
          WHERE c_acctbal < 0 AND c_custkey % 10 <> 0)
        SELECT tensor, "change", n FROM (
          SELECT t.tensor, 'removed' AS "change", rem.n
          FROM (VALUES ('c_custkey'), ('c_name'), ('c_acctbal'),
            ('c_mktsegment')) t(tensor), rem
          UNION ALL
          SELECT 'c_mktsegment', 'updated', upd.n FROM upd)
        WHERE n > 0 ORDER BY tensor, "change"""")),

    // branch → divergent update/pop → three-way merge → snapshot
    QueryDef("q72_format_branch_merge",
      (s, dir) => {
        val n = Tables.load(s, dir, "nation")
        val ds = IO.fromDataFrame(n, freshRoot("q72"))
        ds.checkout("dev", create = true)
        ds.pop(col("n_nationkey") >= 20)
        ds.commit("dev pop")
        ds.checkout("main")
        ds.update(col("n_regionkey") === 0, Map("n_name" -> lit("REGION-ZERO")))
        ds.commit("main update")
        ds.merge("dev")
        ds.toDF.select("n_nationkey", "n_name").orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey,
        CASE WHEN n_regionkey = 0 THEN 'REGION-ZERO' ELSE n_name END AS n_name
        FROM nation WHERE n_nationkey < 20 ORDER BY n_nationkey""")),

    // the registered Spark data source end-to-end: ingest via
    // df.write.format("graft"), mutate via the Scala API, read the
    // merged-on-read snapshot PURELY via spark.read.format("graft") —
    // the surface SQL/Python users get (GraftSource.scala)
    QueryDef("q89_format_spark_read",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        val root = freshRoot("q89")
        li.write.format("graft").option("message", "ingest").save(root)
        val ds = GraftDataset.load(s, root)
        ds.update(col("l_returnflag") === "N",
          Map("l_quantity" -> (col("l_quantity") + 100)))
        ds.pop(col("l_returnflag") === "R")
        ds.commit("mutations")
        s.read.format("graft").load(root)
          .filter(col("l_quantity") > 30)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (SELECT l_returnflag,
          CASE WHEN l_returnflag = 'N' THEN l_quantity + 100
               ELSE l_quantity END AS l_quantity,
          l_extendedprice
        FROM lineitem WHERE l_returnflag <> 'R')
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM m WHERE l_quantity > 30
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // @compute transform pipeline (SURVEY §2.9): expression stage →
    // imperative rowStage (mapPartitions, 1-in/1-out here) → aggregate
    // stage, composed with Pipeline.andThen. The oracle reproduces the
    // row function's arithmetic in SQL, proving the executor-side stage
    // computes exactly what it claims.
    QueryDef("q90_compute_pipeline",
      (s, dir) => {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
        val midSchema = StructType(o.schema.fields :+
          StructField("bucket", IntegerType))
        val outSchema = StructType(midSchema.fields :+
          StructField("prio", IntegerType))
        val pipe = graft.operators.Compute.compute("bucketize") { df =>
          df.withColumn("bucket",
            floor(col("o_totalprice") / 50000).cast("int"))
        }.andThen(graft.operators.Compute.compute("prio")(
          graft.operators.Compute.rowStage(outSchema) { r =>
            Seq(Row.fromSeq(r.toSeq :+
              r.getAs[String]("o_orderpriority").substring(0, 1).toInt))
          }
        )).andThen(graft.operators.Compute.compute("rollup") { df =>
          df.groupBy("bucket", "prio")
            .agg(count(lit(1)).as("n"),
              sum(dec2(col("o_totalprice"))).cast("double").as("total"))
            .orderBy("bucket", "prio")
        })
        pipe.eval(o).select("bucket", "prio", "n", "total")
      },
      Some("""SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS bucket,
          CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS prio,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    // UDF row filter (reference ds.filter(fn)): executor-side typed
    // predicate over the versioned snapshot, oracle-checked against the
    // equivalent SQL predicate
    QueryDef("q91_format_udf_filter",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        val ds = IO.fromDataFrame(c, freshRoot("q91"))
        ds.filterRows { r =>
          val seg = r.getAs[String]("c_mktsegment")
          r.getAs[Double]("c_acctbal") > 1000.0 &&
            (seg.startsWith("B") || seg.endsWith("RY"))
        }
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("c_acctbal"))).cast("double").as("bal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        FROM customer WHERE c_acctbal > 1000
          AND (c_mktsegment LIKE 'B%' OR c_mktsegment LIKE '%RY')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // row-at-a-time aggregate with a UDF WHERE (reference aggregate(...)
    // with filter_function)
    QueryDef("q92_row_aggregate_udf_where",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderstatus", "o_orderpriority", "o_totalprice")
        val ds = IO.fromDataFrame(o, freshRoot("q92"))
        ds.aggregateRows(Seq("o_orderstatus"), Seq("o_totalprice"), "count",
            where = Some(r =>
              r.getAs[String]("o_orderpriority").endsWith("URGENT")))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(o_totalprice) AS count_o_totalprice
        FROM orders WHERE o_orderpriority LIKE '%URGENT'
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // streaming tail of a graft table (readStream.format("graft")): the
    // first micro-batch is the snapshot at stream start (first commit),
    // the second is the append delta committed WHILE the stream runs.
    // Exactly-once across both batches ⇒ the streamed union equals the
    // plain batch table — which is what the oracle checks.
    QueryDef("q96_stream_tail_exactly_once",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val root = freshRoot("q96")
        val ds = GraftDataset.create(s, root, o.schema)
        ds.append(o.filter(col("o_orderkey") % 2 === 0))
        ds.commit("even half")
        val sinkTable = "q96_out_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        // the memory sink pins every streamed row in driver memory until
        // the temp view is dropped — reaped once the result is consumed
        graft.QueryCleanup.registerTempView(sinkTable)
        val q = s.readStream.format("graft").load(root)
          .writeStream.format("memory").queryName(sinkTable)
          .option("checkpointLocation", freshRoot("q96ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
          .start()
        q.processAllAvailable() // batch 0: snapshot of the even half
        ds.append(o.filter(col("o_orderkey") % 2 === 1))
        ds.commit("odd half")
        q.processAllAvailable() // batch 1: append-only file delta
        q.stop()
        s.table(sinkTable).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // true Z-order compaction: Morton-interleaved rank buckets, then a
    // filtered aggregate over a NON-LEADING cluster column — the scan
    // path runs through manifest skipping over the z-clustered per-file
    // stats, and the answer must match the plain relational oracle
    QueryDef("q106_format_zorder_compact",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        val root = freshRoot("q106")
        val ds = IO.fromDataFrame(li, root)
        ds.compact(clusterBy = Seq("l_orderkey", "l_partkey"), zorder = true)
        ds.commit("zordered")
        s.read.format("graft").load(root)
          .filter(col("l_partkey") <= 200L)
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"))
          .orderBy("l_partkey")
      },
      Some("""SELECT l_partkey, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem WHERE l_partkey <= 200
        GROUP BY l_partkey ORDER BY l_partkey""")),

    // incremental small-file compaction (bin-packing OPTIMIZE): the
    // table is fragmented by per-slice appends, then mutated, then
    // bin-packed — the merged base entries must answer the aggregate
    // identically under the outstanding merge-on-read update/tombstone
    // files (base entries are uuid-keyed, not position-keyed)
    QueryDef("q107_format_optimize_binpack",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val root = freshRoot("q107")
        val ds = graft.format.GraftDataset.create(s, root, o.schema)
        (0L until 4L).foreach { slice =>
          ds.append(o.filter(col("o_orderkey") % 4 === slice))
        }
        ds.commit("fragmented")
        ds.update(col("o_orderstatus") === "F",
          Map("o_orderstatus" -> lit("X")))
        ds.pop(col("o_orderkey") % 7 === 0)
        ds.commit("mutated")
        ds.optimizeSmallFiles()
        ds.commit("optimized")
        s.read.format("graft").load(root)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (SELECT
          CASE WHEN o_orderstatus = 'F' THEN 'X' ELSE o_orderstatus END
            AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // streaming incremental dedup: a graft table streams through
    // StreamingDedup (cross-batch UNBOUNDED-horizon exact dedup, state
    // persisted in a second graft table, exactly-once marker protocol).
    // Batch 0 = even docs; batch 1 = odd docs + clones of both halves.
    // The oracle replays the greedy batch-order rule: per fingerprint,
    // the min doc_id of the EARLIEST batch containing it survives.
    QueryDef("q105_stream_dedup",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents").select("doc_id", "text")
        val root = freshRoot("q105src")
        val src = GraftDataset.create(s, root, d.schema)
        src.append(d.filter(col("doc_id") % 2 === 0))
        src.commit("even half")
        val sinkRoot = freshRoot("q105sink")
        val stateRoot = freshRoot("q105state")
        val q = graft.streaming.StreamingDedup.start(
          s.readStream.format("graft").load(root), "text", "doc_id",
          sinkRoot, stateRoot, freshRoot("q105ckpt"),
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        q.processAllAvailable() // batch 0: the even half
        src.append(d.filter(col("doc_id") % 2 === 1)
          .unionByName(d.filter(col("doc_id") % 2 === 0 && col("doc_id") < 20)
            .withColumn("doc_id", col("doc_id") + lit(100000L)))
          .unionByName(d.filter(col("doc_id") % 2 === 1 && col("doc_id") < 20)
            .withColumn("doc_id", col("doc_id") + lit(200000L))))
        src.commit("odd half + clones")
        q.processAllAvailable() // batch 1
        q.stop()
        GraftDataset.load(s, sinkRoot).toDF
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH fpf AS (SELECT doc_id,
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        FROM documents),
        b0 AS (SELECT f, MIN(doc_id) AS doc_id FROM fpf
          WHERE doc_id % 2 = 0 GROUP BY f),
        b1src AS (
          SELECT doc_id, f FROM fpf WHERE doc_id % 2 = 1
          UNION ALL SELECT doc_id + 100000, f FROM fpf
            WHERE doc_id % 2 = 0 AND doc_id < 20
          UNION ALL SELECT doc_id + 200000, f FROM fpf
            WHERE doc_id % 2 = 1 AND doc_id < 20),
        b1 AS (SELECT f, MIN(doc_id) AS doc_id FROM b1src
          WHERE f NOT IN (SELECT f FROM b0) GROUP BY f)
        SELECT doc_id FROM b0
        UNION ALL SELECT doc_id FROM b1
        ORDER BY 1""")),

    // storage reclamation (vacuum): update + pop + compact strand the
    // pre-image base/update/tombstone entries in ancestor manifests; an
    // aggressive vacuum must delete EXACTLY those three and keep the one
    // live compacted entry — counts the oracle states as constants — and
    // the post-vacuum snapshot must still answer the mutated aggregate
    QueryDef("q103_format_vacuum",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val ds = IO.fromDataFrame(o, freshRoot("q103"))
        ds.update(col("o_orderstatus") === "F",
          Map("o_orderstatus" -> lit("X")))
        ds.pop(col("o_orderkey") % 7 === 0)
        ds.commit("mutated")
        ds.compact()
        ds.commit("compacted")
        val rpt = ds.vacuum(olderThanMs = -60000L)
        val counts = rpt.groupBy(concat(lit("_"), col("status"))
            .as("o_orderstatus"))
          .agg(count(lit(1)).cast("long").as("n"),
            lit(null).cast("double").as("total"))
        ds.toDF.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .unionByName(counts)
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (SELECT
          CASE WHEN o_orderstatus = 'F' THEN 'X' ELSE o_orderstatus END
            AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM m GROUP BY o_orderstatus
        UNION ALL SELECT '_deleted', 3, NULL
        UNION ALL SELECT '_kept_live', 1, NULL
        ORDER BY o_orderstatus""")),

    // schema evolution under the rename-EPOCH machinery: rename a
    // column, DELETE another, then recreate it and append a
    // post-evolution batch — the scan mixes files from three epochs.
    // Original rows must read NULL for the recreated column (the
    // deleted column's stale physical bytes must NOT resurrect), the
    // renamed column must serve the old files' data under its new name,
    // and file-skipping stats migrate with the rename (pruning stays on;
    // any slip changes group counts and fails the hash compare).
    QueryDef("q112_format_schema_evolution",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        val root = freshRoot("q112")
        val ds = graft.format.GraftDataset.create(s, root, o.schema)
        ds.append(o.filter(col("o_orderkey") % 2 === 0))
        ds.append(o.filter(col("o_orderkey") % 2 === 1))
        ds.commit("base")
        ds.renameTensor("o_totalprice", "price")
        ds.deleteTensor("o_orderstatus")
        ds.commit("evolve: rename totalprice, drop status")
        ds.createTensor("o_orderstatus",
          org.apache.spark.sql.types.StringType)
        ds.append(o.filter(col("o_orderkey") <= 100)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_totalprice").as("price"), col("o_orderstatus")))
        ds.commit("recreate status + post-evolution batch")
        s.read.format("graft").load(root)
          .filter(col("price") > 150000.0)
          .groupBy(coalesce(col("o_orderstatus"), lit("~none")).as("st"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("price"))).cast("double").as("total"))
          .orderBy("st")
      },
      Some("""WITH all_rows AS (
          SELECT o_totalprice AS price, CAST(NULL AS VARCHAR) AS st0
          FROM orders
          UNION ALL
          SELECT o_totalprice, o_orderstatus
          FROM orders WHERE o_orderkey <= 100)
        SELECT COALESCE(st0, '~none') AS st, COUNT(*) AS n,
          CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM all_rows WHERE price > 150000
        GROUP BY 1 ORDER BY st""")),

    // metadata-only exact count: after merge-on-read mutations the live
    // row count comes from countRows — per-file footer/stats metadata on
    // the driver, NO Spark job over the data (len(dataset) at 100 TB
    // must not scan 100 TB). The oracle recomputes the population the
    // slow way; any drift in the uuid bookkeeping (double-subtracted
    // tombstone, update minting a row) fails the hash compare.
    QueryDef("q113_format_metadata_count",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        val root = freshRoot("q113")
        val ds = IO.fromDataFrame(li, root)
        ds.update(col("l_orderkey") % 3 === 0,
          Map("l_quantity" -> (col("l_quantity") + 1)))
        ds.pop(col("l_orderkey") % 5 === 0)
        ds.commit("mutated")
        val n = ds.countRows // driver-side metadata read only
        s.range(1).select(lit(n).cast("long").as("n_live"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_live
        FROM lineitem WHERE l_orderkey % 5 <> 0""")),

    // SQL-level metadata aggregates (Delta's "metadata query" as a
    // Catalyst rule): ungrouped, unfiltered COUNT/MIN/MAX over a graft
    // view collapse to a LocalRelation answered from manifest stats —
    // no scan (plan shape pinned in MetadataAggregateSpec; here the
    // driver's oracle pins the VALUES those stats produce, so a stat
    // captured wrong at write time fails the hash compare).
    QueryDef("q114_format_metadata_aggregates",
      (s, dir) => {
        org.apache.spark.sql.graftnative.GraftExtensions.install(s)
        val c = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal")
        val root = freshRoot("q114")
        IO.fromDataFrame(c, root)
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_cust_q114 " +
          s"USING graft OPTIONS (path '$root')")
        s.sql("""SELECT COUNT(*) AS n,
            MIN(c_custkey) AS key_lo, MAX(c_custkey) AS key_hi,
            MIN(c_acctbal) AS bal_lo, MAX(c_acctbal) AS bal_hi,
            MIN(c_name) AS name_lo, MAX(c_name) AS name_hi
          FROM graft_cust_q114""")
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
          MIN(c_custkey) AS key_lo, MAX(c_custkey) AS key_hi,
          MIN(c_acctbal) AS bal_lo, MAX(c_acctbal) AS bal_hi,
          MIN(c_name) AS name_lo, MAX(c_name) AS name_hi
        FROM customer""")),

    // change-data-feed tail (Delta CDF as a read-time manifest delta):
    // run 1 drains the seed snapshot as insert events; a mixed commit
    // (update + pop + append) then drains as update_postimage / delete /
    // insert events on the SAME checkpoint. The oracle reconstructs the
    // exact event multiset from the source table — a dropped event, a
    // stale postimage, or a resurrected delete all break the hash.
    QueryDef("q115_stream_change_feed",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
        val root = freshRoot("q115")
        val ckpt = freshRoot("q115ck")
        val ds = IO.fromDataFrame(o, root) // seed commit
        // ONE live query across both phases (the memory sink cannot
        // restart from a checkpoint): drain the snapshot, mutate the
        // table mid-stream, drain the CDC delta, then aggregate
        val q = s.readStream.format("graft")
          .option("changeFeed", "true").load(root)
          .writeStream.format("memory").queryName("q115_out")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable()
        ds.update(col("o_orderkey") % 7 === 0,
          Map("o_totalprice" -> (col("o_totalprice") + 1)))
        ds.pop(col("o_orderkey") % 11 === 0)
        ds.append(o.filter(col("o_orderkey") <= 50)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
            col("o_totalprice")))
        ds.commit("mixed mutation")
        q.processAllAvailable()
        q.stop()
        s.table("q115_out")
          .groupBy("_change_type").agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy("_change_type")
      },
      Some("""WITH ev AS (
          SELECT 'insert' AS ct, o_totalprice AS p FROM orders
          UNION ALL SELECT 'insert', o_totalprice FROM orders
            WHERE o_orderkey <= 50
          UNION ALL SELECT 'update_postimage', o_totalprice + 1 FROM orders
            WHERE o_orderkey % 7 = 0
          UNION ALL SELECT 'delete', NULL FROM orders
            WHERE o_orderkey % 11 = 0)
        SELECT ct AS _change_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM ev GROUP BY 1 ORDER BY 1""")),

    // batch table_changes: the SAME event engine as q115 but through
    // GraftDataset.changes(from) — reads only the mutation commit's
    // delta files, no stream, no snapshot baseline (the range starts
    // after the seed commit, so no seed inserts appear)
    QueryDef("q116_format_table_changes",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
        val root = freshRoot("q116")
        val ds = IO.fromDataFrame(o, root)
        val c0 = ds.head.get
        ds.update(col("o_orderkey") % 7 === 0,
          Map("o_totalprice" -> (col("o_totalprice") + 1)))
        ds.pop(col("o_orderkey") % 11 === 0)
        ds.append(o.filter(col("o_orderkey") <= 50)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
            col("o_totalprice")))
        ds.commit("mixed mutation")
        ds.changes(c0)
          .groupBy("_change_type").agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy("_change_type")
      },
      Some("""WITH ev AS (
          SELECT 'insert' AS ct, o_totalprice AS p FROM orders
            WHERE o_orderkey <= 50
          UNION ALL SELECT 'update_postimage', o_totalprice + 1 FROM orders
            WHERE o_orderkey % 7 = 0
          UNION ALL SELECT 'delete', NULL FROM orders
            WHERE o_orderkey % 11 = 0)
        SELECT ct AS _change_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM ev GROUP BY 1 ORDER BY 1""")),

    // CDC replication end to end: a replica table is built purely by
    // applying the source's full change feed (insert events as a
    // uuid-preserving base entry, postimages as ONE update file,
    // deletes as ONE tombstone file), then aggregated. The oracle
    // reconstructs the source's final state — a replica that diverges
    // in any row breaks the hash.
    QueryDef("q117_format_cdc_replica",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val ds = IO.fromDataFrame(o, freshRoot("q117src"))
        ds.update(col("o_orderstatus") === "F",
          Map("o_totalprice" -> (col("o_totalprice") + 10)))
        ds.pop(col("o_orderkey") % 9 === 0)
        ds.commit("mutate")
        ds.append(o.filter(col("o_orderkey") <= 40)
          .select((col("o_orderkey") + 30000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice")))
        ds.commit("grow")
        val replica = graft.format.GraftDataset.create(
          s, freshRoot("q117rep"), ds.schema)
        replica.applyChanges(ds.changes())
        replica.commit("replicated")
        replica.toDF.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH final AS (
          SELECT o_orderstatus,
            CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 10
                 ELSE o_totalprice END AS p
          FROM orders WHERE o_orderkey % 9 <> 0
          UNION ALL
          SELECT o_orderstatus, o_totalprice FROM orders
            WHERE o_orderkey <= 40)
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM final GROUP BY 1 ORDER BY 1""")),

    // temporal file skipping (r14): events ingested then RANGE-CLUSTERED
    // on ts (compact clusterBy), so each base file covers a disjoint
    // time slice and the selective event-time range prunes all but the
    // covering files — the most common selective predicate in
    // log/training pipelines. The answer must match DuckDB bit-for-bit,
    // proving the INT64-micros stat decode never prunes a live row.
    QueryDef("q119_format_ts_skipping",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select("event_id", "ts", "event_type", "value")
        val root = freshRoot("q119")
        val ds = IO.fromDataFrame(ev, root)
        ds.compact(clusterBy = Seq("ts"))
        ds.commit("ts-clustered")
        s.read.format("graft").load(root)
          .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-07 00:00:00").cast("timestamp"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("v"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts < TIMESTAMP '2024-01-07 00:00:00'
        GROUP BY event_type ORDER BY event_type""")),

    // temporal metadata aggregates (r14): MIN/MAX over timestamp and
    // date columns answered from manifest stats alone through the
    // Catalyst rewrite — the oracle pins the VALUES the INT64-micros /
    // INT32-days stat decode produces (a scale error, a MILLIS/MICROS
    // mixup, or timezone drift all break the hash). The plan shape
    // (LocalRelation, no scan) is pinned in MetadataAggregateSpec.
    QueryDef("q120_format_ts_metadata_minmax",
      (s, dir) => {
        org.apache.spark.sql.graftnative.GraftExtensions.install(s)
        val ev = Tables.load(s, dir, "events")
          .select("event_id", "ts", "value")
          .withColumn("d", to_date(col("ts")))
        val root = freshRoot("q120")
        IO.fromDataFrame(ev, root)
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ev_q120 " +
          s"USING graft OPTIONS (path '$root')")
        graft.QueryCleanup.registerTempView("graft_ev_q120")
        // raw typed MIN/MAX (no CAST wrapper) — a Cast around the
        // aggregate would stop the rewrite from collapsing the plan
        s.sql("""SELECT COUNT(*) AS n,
            MIN(ts) AS ts_lo, MAX(ts) AS ts_hi,
            MIN(d) AS d_lo, MAX(d) AS d_hi
          FROM graft_ev_q120""")
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
          MIN(ts) AS ts_lo, MAX(ts) AS ts_hi,
          MIN(CAST(ts AS DATE)) AS d_lo, MAX(CAST(ts AS DATE)) AS d_hi
        FROM events""")),

    // CDC across schema evolution (r14): the source renames a column
    // MID-RANGE; batch table_changes announces it as a schema_change
    // event and keeps row events in the pinned names, and the replica
    // stream applies the rename — the final replica must answer the
    // aggregate under the NEW column name, row-for-row equal to the
    // renamed source.
    QueryDef("q121_format_cdc_rename",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val srcRoot = freshRoot("q121src")
        val ds = IO.fromDataFrame(o, srcRoot)
        ds.update(col("o_orderstatus") === "F",
          Map("o_totalprice" -> (col("o_totalprice") + 5)))
        ds.commit("pre-rename mutate")
        ds.renameTensor("o_totalprice", "o_price")
        ds.append(o.filter(col("o_orderkey") <= 30)
          .select((col("o_orderkey") + 40000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice").as("o_price")))
        ds.commit("rename + grow under new name")
        ds.pop(col("o_orderkey") % 11 === 0)
        ds.commit("post-rename pop")
        val repRoot = freshRoot("q121rep")
        graft.streaming.GraftStreaming.replicate(
          s, srcRoot, repRoot, freshRoot("q121ck")).awaitTermination()
        val replica = GraftDataset.load(s, repRoot)
        replica.toDF.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_price"))).cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH renamed AS (
          SELECT o_orderkey, o_orderstatus,
            CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 5
                 ELSE o_totalprice END AS o_price
          FROM orders
          UNION ALL
          SELECT o_orderkey + 40000000, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey <= 30)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_price AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM renamed WHERE o_orderkey % 11 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // decimal stat domain (r14): prices stored as DECIMAL(12,2),
    // price-clustered so files cover disjoint ranges; a selective
    // decimal range plus metadata MIN/MAX both answer from the
    // annotation-scale-decoded footer stats, value-pinned vs DuckDB
    QueryDef("q122_format_decimal_skipping",
      (s, dir) => {
        org.apache.spark.sql.graftnative.GraftExtensions.install(s)
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"),
            col("l_extendedprice").cast("decimal(12,2)").as("price"))
        val root = freshRoot("q122")
        val ds = IO.fromDataFrame(li, root)
        ds.compact(clusterBy = Seq("price"))
        ds.commit("price-clustered")
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_li_q122 " +
          s"USING graft OPTIONS (path '$root')")
        graft.QueryCleanup.registerTempView("graft_li_q122")
        // CROSS JOIN of two independent aggregates: the right side is
        // ungrouped MIN/MAX only, so the metadata rewrite collapses it
        // (CAST wrappers fold via literal substitution) — scalar
        // subqueries in one SELECT list would abort the rewrite and
        // quietly un-pin the fold from this oracle. String output
        // keeps the DuckDB decimal compare exact.
        s.sql("""SELECT * FROM
            (SELECT COUNT(*) AS n_range, CAST(SUM(price) AS DOUBLE) AS sum_range
               FROM graft_li_q122
              WHERE price >= 900.00 AND price < 2000.00)
          CROSS JOIN
            (SELECT CAST(MIN(price) AS STRING) AS lo,
                    CAST(MAX(price) AS STRING) AS hi
               FROM graft_li_q122)""")
      },
      Some("""SELECT * FROM
          (SELECT COUNT(*) AS n_range,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                AS sum_range
             FROM lineitem
            WHERE CAST(l_extendedprice AS DECIMAL(12,2)) >= 900.00
              AND CAST(l_extendedprice AS DECIMAL(12,2)) < 2000.00)
        CROSS JOIN
          (SELECT CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
                AS lo,
              CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
                AS hi
             FROM lineitem)""")),

    // class-label columns (r14 oracle upgrade for a spec-only row):
    // values are dictionary ids, the names ride in column metadata;
    // the safe string query coerces 'name' literals to ids on BOTH
    // comparison sides of the filter, and labelName() decodes ids back
    // for the grouped output — the oracle speaks plain lang strings
    QueryDef("q123_format_class_label",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "n_chars")
        val names = Seq("de", "en", "es", "fr", "zh")
        val root = freshRoot("q123")
        val ds = GraftDataset.create(s, root, org.apache.spark.sql.types
          .StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n_chars",
              org.apache.spark.sql.types.LongType))))
        ds.createTensor("lang_id", org.apache.spark.sql.types.LongType, names)
        val id = names.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (n, i)) =>
          when(col("lang") === n, lit(i.toLong)).otherwise(acc)
        }
        ds.append(d.select(col("doc_id"), col("n_chars").cast("long"),
          id.as("lang_id")))
        ds.commit("docs with class labels")
        ds.filterQuery("lang_id != 'zh' and n_chars > 500")
          .groupBy(ds.labelName("lang_id").as("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n,
          CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents WHERE lang <> 'zh' AND n_chars > 500
        GROUP BY lang ORDER BY lang""")),

    // CDC across ADDITIVE schema evolution (r15): the source adds a
    // nullable column MID-RANGE; the change feed extends its pin with
    // the added column (pre-add events null-backfill it, post-add
    // events carry its values, the add itself is a schema_change
    // event), and the replica stream adopts the column — the final
    // replica must answer an aggregate OVER THE ADDED COLUMN
    // row-for-row equal to the evolved source.
    QueryDef("q126_format_cdc_add_column",
      (s, dir) => {
        // a 60k-key slice: the pipeline cost is streaming-engine startups
        // plus per-commit deltas, so the full table only inflates the
        // bootstrap I/O without exercising anything more
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 60000)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val srcRoot = freshRoot("q126src")
        val ds = IO.fromDataFrame(o, srcRoot)
        ds.update(col("o_orderstatus") === "O",
          Map("o_totalprice" -> (col("o_totalprice") + 3)))
        ds.commit("pre-add mutate")
        ds.createTensor("o_note", org.apache.spark.sql.types.StringType)
        ds.append(o.filter(col("o_orderkey") <= 40)
          .select((col("o_orderkey") + 50000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"),
            concat(lit("a"), col("o_orderkey")).as("o_note")))
        ds.commit("add column + grow under it")
        ds.update(col("o_orderkey") % 5 === 0,
          Map("o_note" -> concat(lit("n"), col("o_orderkey"))))
        ds.commit("backfill across the add boundary")
        ds.pop(col("o_orderkey") % 13 === 0)
        ds.commit("post-add pop")
        val repRoot = freshRoot("q126rep")
        graft.streaming.GraftStreaming.replicate(
          s, srcRoot, repRoot, freshRoot("q126ck")).awaitTermination()
        val replica = GraftDataset.load(s, repRoot)
        replica.toDF.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"),
            count(col("o_note")).as("with_note"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH evolved AS (
          SELECT o_orderkey, o_orderstatus,
            CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 3
                 ELSE o_totalprice END AS o_totalprice,
            CAST(NULL AS VARCHAR) AS o_note
          FROM orders WHERE o_orderkey <= 60000
          UNION ALL
          SELECT o_orderkey + 50000000, o_orderstatus, o_totalprice,
            'a' || CAST(o_orderkey AS VARCHAR)
          FROM orders WHERE o_orderkey <= 40),
        noted AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice,
            CASE WHEN o_orderkey % 5 = 0
                 THEN 'n' || CAST(o_orderkey AS VARCHAR)
                 ELSE o_note END AS o_note
          FROM evolved)
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          COUNT(o_note) AS with_note
        FROM noted WHERE o_orderkey % 13 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
  )
}
