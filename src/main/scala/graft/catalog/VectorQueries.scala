package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.operators.{Dedup, Hnsw, KnnJoin, VectorSearch}
import graft.functions.{VectorFunctions => V}

/** Vector-search operator inventory (SURVEY.md §2.7) over the `embeddings`
  * table, plus embedding-based near-dup (LLM-pipeline layer).
  *
  * Determinism contract for oracle-checked queries: all similarity math
  * runs on the scaled-int64 grid (V.*Scaled), ties broken by vec_id, and
  * any floating score is rounded onto a 1e6 grid and emitted as BIGINT —
  * so Spark and DuckDB produce bit-identical values.
  *
  * DuckDB-side expression of the same math uses list_zip + list_transform
  * + list_sum over the same int64 grid.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // DuckDB: int64-grid quantization of a float list (matches V.qint)
  private def dq(c: String) =
    s"list_transform($c, x -> CAST(round(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT))"
  // DuckDB: exact int64 dot product of two quantized lists. Notes for the
  // driver's DuckDB 1.0: list_zip yields UNNAMED structs (numeric access
  // s[1]/s[2] only — s.list_1 is a binder error), and list_sum over BIGINT
  // returns HUGEINT (→ float64 in pandas), so every raw emission must be
  // CAST back to BIGINT to hash-match Spark's int64.
  private def ddot(a: String, b: String) =
    s"CAST(list_sum(list_transform(list_zip(${dq(a)}, ${dq(b)}), s -> s[1] * s[2])) AS BIGINT)"
  private def dl2(a: String, b: String) =
    s"CAST(list_sum(list_transform(list_zip(${dq(a)}, ${dq(b)}), s -> (s[1] - s[2]) * (s[1] - s[2]))) AS BIGINT)"
  private def dcos(a: String, b: String) =
    s"(CAST(${ddot(a, b)} AS DOUBLE) / (sqrt(CAST(${ddot(a, a)} AS DOUBLE)) * sqrt(CAST(${ddot(b, b)} AS DOUBLE))))"
  // dot of two ALREADY-quantized int64 lists (pairs with a prep CTE)
  private def qdot(a: String, b: String) =
    s"CAST(list_sum(list_transform(list_zip($a, $b), s -> s[1] * s[2])) AS BIGINT)"

  /** Recall audit for the approximate ANN families (ADVICE r11: the six
    * no_oracle rows). The approximate result set itself is un-oracle-able
    * — DuckDB cannot replay a graph walk or a trained quantizer — but the
    * QUALITY CONTRACT is: each returned id's EXACT scaled-int distance
    * (the grid q60/q61/q88/q99's oracles prove bit-identical to DuckDB)
    * is compared against the exact kth distance, and ≥ minHits of k must
    * land inside that radius (tie-robust containment: a returned id
    * counts iff its distance ≤ the kth exact distance, so boundary ties
    * can never fail it unfairly). Emitted per (idx, qid): the row count
    * the index returned, the exact kth distance — which the oracle
    * recomputes from the data with its own window top-k, keeping the
    * check data-dependent — and the recall verdict.
    *
    * The verdict is two-tier: the sum of hits over the family's query
    * batch must reach `minHits(idx)` — per-query IVF recall is
    * legitimately jumpy (a query whose true neighbors spread across many
    * cells can score 2/5 at nprobe=6 while the family mean sits well
    * above the spec floor; VectorStatsSpec asserts the MEAN for exactly
    * this reason) — AND every individual query must land at least ONE
    * true neighbor, so a zero-recall query can never hide inside a
    * passing batch. The per-query kth distances still pin each query's
    * exact geometry row by row.
    *
    * `approx` must carry (idx, qid, vec_id); `queries` is the bounded
    * (qid, vector) batch the caller already holds. Exposed (not private)
    * so the audit maths itself is spec-testable.
    *
    * 100 TB shape: the exact kth radius per query is a per-query
    * TakeOrderedAndProject (map-side top-k + driver merge of
    * parts × k rows) — NOT a corpus-wide window partitioned by qid,
    * which would funnel every corpus row through |queries| reducer
    * tasks. The audit joins are all broadcast (approx ≤ families·k
    * rows, queries ≤ batch, kth ≤ batch).
    */
  def recallAudit(e: DataFrame, approx: DataFrame,
                  queries: Seq[(Long, Seq[Float])], k: Int,
                  minHits: Map[String, Int]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val kth = queries.map { case (qid, qv) =>
      val qlit = array(qv.map(x => lit(x)): _*)
      e.withColumn("_l2", V.l2SqScaled(col("embedding"), qlit))
        .orderBy(col("_l2").asc, col("vec_id").asc).limit(k)
        .agg(max(col("_l2")).as("_kth"))
        .select(lit(qid).as("qid"), col("_kth"))
    }.reduce(_ unionByName _)
    val qdf = queries.toDF("qid", "_qvec")
    val minExpr = minHits.tail.foldLeft(
        when(col("idx") === minHits.head._1, lit(minHits.head._2))) {
      case (acc, (f, m)) => acc.when(col("idx") === f, lit(m))
    }
    e.select(col("vec_id"), col("embedding"))
      .join(broadcast(approx), "vec_id")
      .join(broadcast(qdf), "qid")
      .withColumn("_l2", V.l2SqScaled(col("embedding"), col("_qvec")))
      .join(broadcast(kth), "qid")
      .groupBy("idx", "qid")
      .agg(count(lit(1)).as("returned"),
        max(col("_kth")).as("kth_l2sq_scaled"),
        sum(when(col("_l2") <= col("_kth"), 1L).otherwise(0L)).as("_hits"))
      .withColumn("_famHits", sum(col("_hits")).over(Window.partitionBy("idx")))
      .select(col("idx"), col("qid"), col("returned"),
        col("kth_l2sq_scaled"),
        (col("_famHits") >= minExpr && col("_hits") >= lit(1L))
          .as("recall_ok"))
      .orderBy("idx", "qid")
  }

  /** DuckDB side of [[recallAudit]]: the exact kth distance per query via
    * the same int64-grid window top-k the q99 oracle uses, crossed with
    * the audited index families. recall_ok is the pinned contract
    * constant: the Spark side must find ≥ minHits of the true top-k.
    */
  private def recallOracle(idxNames: Seq[String], qidPred: String,
                           k: Int): String = {
    val idxVals = idxNames.map(n => s"('$n')").mkString(", ")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
        FROM embeddings WHERE $qidPred),
      d AS (SELECT q.qid, ${dl2("e.embedding", "q.qv")} AS l2,
        row_number() OVER (PARTITION BY q.qid
          ORDER BY ${dl2("e.embedding", "q.qv")} ASC, e.vec_id ASC) AS r
        FROM embeddings e, q),
      kth AS (SELECT qid, CAST(l2 AS BIGINT) AS kth_l2sq_scaled
        FROM d WHERE r = $k)
      SELECT i.idx, kth.qid, CAST($k AS BIGINT) AS returned,
        kth.kth_l2sq_scaled, TRUE AS recall_ok
      FROM kth, (VALUES $idxVals) i(idx) ORDER BY i.idx, kth.qid"""
  }

  val all: Seq[QueryDef] = Seq(

    // exact brute-force top-k, cosine — the FLAT-index-equivalent path
    QueryDef("q60_vector_topk_cosine",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.filter(col("vec_id") === 0L)
          .select(col("embedding").as("_qvec"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= 0L)
          .withColumn("cos_x1e6",
            round(V.cosineScaled(col("embedding"), col("_qvec")) * lit(1e6))
              .cast("long"))
          .orderBy(col("cos_x1e6").desc, col("vec_id").asc)
          .limit(10)
          .select("vec_id", "cos_x1e6")
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, CAST(round(${dcos("embedding", "qv")} * 1000000.0) AS BIGINT) AS cos_x1e6
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY cos_x1e6 DESC, vec_id ASC LIMIT 10""")),

    // exact top-k, l2 — pure int64 arithmetic end to end
    QueryDef("q61_vector_topk_l2",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.filter(col("vec_id") === 1L)
          .select(col("embedding").as("_qvec"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= 1L)
          .withColumn("l2sq_scaled",
            V.l2SqScaled(col("embedding"), col("_qvec")))
          .orderBy(col("l2sq_scaled").asc, col("vec_id").asc)
          .limit(10)
          .select("vec_id", "l2sq_scaled")
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
        SELECT vec_id, ${dl2("embedding", "qv")} AS l2sq_scaled
        FROM embeddings, q WHERE vec_id <> 1
        ORDER BY l2sq_scaled ASC, vec_id ASC LIMIT 10""")),

    // batched top-k: one corpus scan for a broadcast query batch
    QueryDef("q62_vector_batch_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val queries = e.filter(col("vec_id") < 3L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        VectorSearch.batchTopK(
            e, "embedding", "vec_id", queries, "qid", "qvec",
            metric = "l2", k = 5, exact = true)
          .withColumnRenamed("_score", "score")
          .select(col("query_id"), col("vec_id"), col("rank"),
            col("score").cast("long").as("l2sq_scaled"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 3),
        scored AS (SELECT q.query_id, e.vec_id,
          ${dl2("e.embedding", "q.qv")} AS l2sq_scaled
          FROM embeddings e, q),
        ranked AS (SELECT query_id, vec_id, l2sq_scaled,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY l2sq_scaled ASC, vec_id ASC) AS rank
          FROM scored)
        SELECT query_id, vec_id, rank, l2sq_scaled FROM ranked
        WHERE rank <= 5 ORDER BY query_id, rank""")),

    // embedding-cosine near-dup pairs: candidates from RP-LSH band
    // buckets (high-cardinality, bounded — never O(n²/|labels|)), the
    // label-equality constraint and the exact scaled-int cosine verified
    // on the candidate pairs. 8 planes × 16 bands ⇒ per-pair miss prob
    // (1-p^8)^16 with p = 1-θ/π; at the 0.99 threshold that is ≈ 7e-9 —
    // effectively exact, so the exact SQL oracle stays valid (bands are
    // one native expression pass, so extra bands are near-free).
    // CONSTRUCTED clones (vec_id < 15 duplicated at +200000, label kept)
    // make the green non-vacuous: the natural fixture has zero pairs at
    // cos ≥ 0.99, so without them both sides were trivially empty.
    // Identical vectors collide in EVERY band (any hash family), so LSH
    // recall is certain for exactly the pairs the all-pairs oracle emits.
    QueryDef("q63_embedding_near_dup",
      (s, dir) => {
        val e = emb(s, dir)
        val clones = e.filter(col("vec_id") < 15L)
          .withColumn("vec_id", col("vec_id") + lit(200000L))
        Dedup.embeddingNearDupLsh(e.unionByName(clones), "embedding", "vec_id",
          threshold = 0.99, planesPerBand = 8, bands = 16,
          equalCols = Seq("label"))
        .withColumn("cos_x1e6", round(col("cos_sim") * lit(1e6)).cast("long"))
        .select("vec_id_a", "vec_id_b", "cos_x1e6")
        .orderBy("vec_id_a", "vec_id_b")
      },
      // quantize + self-dot once per row, pair dot once per pair — the
      // same precompute shape as the Spark side
      Some(s"""WITH corpus AS (
          SELECT vec_id, label, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 200000, label, embedding FROM embeddings
          WHERE vec_id < 15),
        prep AS (SELECT vec_id, label, ${dq("embedding")} AS qv FROM corpus),
        normed AS (SELECT vec_id, label, qv,
          sqrt(CAST(${qdot("qv", "qv")} AS DOUBLE)) AS nrm FROM prep),
        pairs AS (SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
          CAST(${qdot("a.qv", "b.qv")} AS DOUBLE) / (a.nrm * b.nrm) AS cos
          FROM normed a JOIN normed b
            ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT vec_id_a, vec_id_b,
          CAST(round(cos * 1000000.0) AS BIGINT) AS cos_x1e6
        FROM pairs WHERE cos >= 0.99
        ORDER BY vec_id_a, vec_id_b""")),

    // SemDeDup-style semantic dedup (Abbas 2023): IVF cells as blocks,
    // exact scaled-int cosine verify inside each cell. Oracle-able
    // because the qualifying pairs are CONSTRUCTED exact clones
    // (vec_id < 25 duplicated at +100000): identical vectors get
    // identical cell assignments (deterministic argmin), so cell
    // blocking misses nothing at the 0.9999 threshold and the exact
    // all-pairs SQL is the true answer.
    QueryDef("q87_semantic_dedup",
      (s, dir) => {
        val e = emb(s, dir)
        val clones = e.filter(col("vec_id") < 25L)
          .withColumn("vec_id", col("vec_id") + lit(100000L))
        // maxCell unbounded HERE ONLY: the oracle is exact all-pairs, so
        // no cell may be dropped (same pattern as q51's maxBucket) — the
        // API default keeps the skew cap for the 100 TB path
        Dedup.semanticDedup(e.unionByName(clones), "embedding", "vec_id",
            nlist = 16, threshold = 0.9999, maxCell = Int.MaxValue)
          .withColumn("cos_x1e6", round(col("cos_sim") * lit(1e6)).cast("long"))
          .select("vec_id_a", "vec_id_b", "cos_x1e6")
          .orderBy("vec_id_a", "vec_id_b")
      },
      Some(s"""WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 25),
        prep AS (SELECT vec_id, ${dq("embedding")} AS qv FROM corpus),
        normed AS (SELECT vec_id, qv,
          sqrt(CAST(${qdot("qv", "qv")} AS DOUBLE)) AS nrm FROM prep),
        pairs AS (SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
          CAST(${qdot("a.qv", "b.qv")} AS DOUBLE) / (a.nrm * b.nrm) AS cos
          FROM normed a JOIN normed b ON a.vec_id < b.vec_id)
        SELECT vec_id_a, vec_id_b,
          CAST(round(cos * 1000000.0) AS BIGINT) AS cos_x1e6
        FROM pairs WHERE cos >= 0.9999
        ORDER BY vec_id_a, vec_id_b""")),

    // centroid aggregation per label: the building block of IVF build /
    // k-means — mean vector via exact int64 sums, emitted on the 1e6 grid
    QueryDef("q64_label_centroids",
      (s, dir) => emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(sum(round(col("x").cast("double") * lit(1e7)).cast("long")).as("sx"),
          count(lit(1)).as("n"))
        .withColumn("mean_x1e6",
          round(col("sx").cast("double") / col("n").cast("double") / lit(10.0))
            .cast("long"))
        .select("label", "dim", "mean_x1e6")
        .orderBy("label", "dim"),
      // DuckDB 1.0 lacks WITH ORDINALITY → index the 64-dim list via a
      // range() lateral instead (embedding[i] is 1-based).
      Some("""SELECT label, CAST(i - 1 AS INTEGER) AS dim,
        CAST(round(CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT)) AS DOUBLE) / COUNT(*) / 10.0) AS BIGINT) AS mean_x1e6
        FROM embeddings, range(1, 65) t(i)
        GROUP BY label, dim ORDER BY label, dim""")),

    // hybrid search: scalar filter + exact vector ranking in one plan
    // (reference "hybrid search engine", README.md:19)
    QueryDef("q68_hybrid_filter_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val qv = e.filter(col("vec_id") === 5L)
          .select("embedding").head().getSeq[Float](0)
        VectorSearch.hybridTopK(
            e.filter(col("vec_id") =!= 5L),
            col("label").isin(1, 3, 5), "embedding", "vec_id",
            qv, metric = "cosine", k = 8, exact = true)
          .withColumn("cos_x1e6", round(col("score") * lit(1e6)).cast("long"))
          .select("vec_id", "cos_x1e6")
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 5),
        scored AS (SELECT vec_id, ${dcos("embedding", "qv")} AS cos
          FROM embeddings, q
          WHERE vec_id <> 5 AND label IN (1, 3, 5))
        SELECT vec_id, CAST(round(cos * 1000000.0) AS BIGINT) AS cos_x1e6
        FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 8""")),

    // approximate paths — no SQL oracle (driver rows-only check):
    // IVF-lite probe search (SURVEY.md §2.7 IVFPQ analogue)
    // IVF at nprobe=6/16: approximate → the result SET is un-oracle-able,
    // but the recall contract is ([[recallAudit]]): ≥5/10 of the true
    // top-10 inside the exact kth radius (measured 7/10 at sf0.01 and
    // 6/10 at sf0.1 — margin on both sides of the gate), pinned against
    // a DuckDB-recomputed exact kth distance.
    QueryDef("q65_vector_ivf_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val first = e.filter(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0)
        val (assigned, centroids) = VectorSearch.ivfBuild(e, "embedding", "vec_id", nlist = 16)
        val approx = VectorSearch.ivfTopK(assigned, centroids, "embedding",
            "vec_id", first, metric = "l2", k = 10, nprobe = 6)
          .select(lit("ivf").as("idx"), lit(0L).as("qid"), col("vec_id"))
        recallAudit(e, approx, Seq(0L -> first), k = 10,
          minHits = Map("ivf" -> 5))
      },
      Some(recallOracle(Seq("ivf"), "vec_id = 0", 10))),

    // MinHash-LSH near-dup, PORTABLE md5 Carter-Wegman family: the oracle
    // replays the ENTIRE pipeline — per-shingle 32-bit md5 hash, (a·H+b)
    // mod p signature, mod-fold band buckets, candidate join, exact
    // Jaccard verify — so even the hash-dependent candidate set matches
    // bit-for-bit (the same trick that took q51/q67 off the no-oracle
    // list; the murmur3 family stays the fast default API path).
    // maxBucket unbounded HERE ONLY, mirroring q51/q87's oracle pattern.
    locally {
      val (nh, nb, n, t) = (32, 8, 3, 0.5)
      val rpb = nh / nb
      val (sa, sb) = Dedup.portableSeeds(nh)
      val p = Dedup.portableP
      val aList = sa.mkString("[", ", ", "]")
      val bList = sb.mkString("[", ", ", "]")
      // band bucket = left fold (acc·131 + mv) mod p over the band's
      // rowsPerBand signature slots, pivoted out of the (i, mv) rows
      val fold = (0 until rpb).map(j =>
          s"MAX(CASE WHEN i % $rpb = $j THEN mv END)")
        .foldLeft("0")((acc, v) =>
          s"(($acc * ${Dedup.portableBandMult} + $v) % $p)")
      QueryDef("q66_dedup_minhash_lsh",
        (s, dir) => Dedup.minHashLsh(
            Tables.load(s, dir, "documents"), "text", "doc_id",
            numHashes = nh, bands = nb, shingleN = n, threshold = t,
            portable = true, maxBucket = Int.MaxValue)
          .select("doc_id_a", "doc_id_b")
          .orderBy("doc_id_a", "doc_id_b"),
        Some(s"""WITH tk AS (SELECT doc_id, ${TextQueries.duckToks} AS ts
            FROM documents),
          sh AS (SELECT doc_id,
              list_distinct(${TextQueries.duckNgrams("ts", n)}) AS s
            FROM tk WHERE len(ts) >= $n),
          ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
          h AS (SELECT doc_id,
              CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % $p AS hv
            FROM ex),
          sig AS (SELECT doc_id, i,
              MIN(($aList[CAST(i AS INTEGER) + 1] * hv +
                   $bList[CAST(i AS INTEGER) + 1]) % $p) AS mv
            FROM h, range(0, $nh) r(i) GROUP BY 1, 2),
          bkt AS (SELECT doc_id, CAST(i // $rpb AS INTEGER) AS band,
              $fold AS bucket
            FROM sig GROUP BY 1, 2),
          cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bkt a JOIN bkt b
              ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id),
          cnt AS (SELECT doc_id, len(s) AS c FROM sh),
          inter AS (SELECT c.da, c.db, COUNT(*) AS iv
            FROM cand c
            JOIN ex a ON a.doc_id = c.da
            JOIN ex b ON b.doc_id = c.db AND b.g = a.g
            GROUP BY 1, 2)
          SELECT da AS doc_id_a, db AS doc_id_b
          FROM inter
          JOIN cnt ca ON ca.doc_id = da
          JOIN cnt cb ON cb.doc_id = db
          WHERE CAST(iv AS DOUBLE) / (ca.c + cb.c - iv) >= $t
          ORDER BY 1, 2"""))
    },

    // INCREMENTAL dedup: even doc_ids are the existing corpus (a
    // persisted minHashState), odd doc_ids the new batch; the result is
    // the batch's SURVIVORS — dropped iff near-dup of the corpus or of
    // an earlier (smaller-id) batch row. corpus×corpus pairs are never
    // generated. Portable family again, so the oracle replays the split
    // pipeline bit-for-bit; maxBucket unbounded (q66 oracle pattern).
    locally {
      val (nh, nb, n, t) = (32, 8, 3, 0.5)
      val rpb = nh / nb
      val (sa, sb) = Dedup.portableSeeds(nh)
      val p = Dedup.portableP
      val aList = sa.mkString("[", ", ", "]")
      val bList = sb.mkString("[", ", ", "]")
      val fold = (0 until rpb).map(j =>
          s"MAX(CASE WHEN i % $rpb = $j THEN mv END)")
        .foldLeft("0")((acc, v) =>
          s"(($acc * ${Dedup.portableBandMult} + $v) % $p)")
      QueryDef("q101_dedup_incremental",
        (s, dir) => {
          val docsDf = Tables.load(s, dir, "documents")
          val corpus = docsDf.filter(col("doc_id") % 2 === 0)
          val delta = docsDf.filter(col("doc_id") % 2 === 1)
          val state = Dedup.minHashState(corpus, "text", "doc_id",
            numHashes = nh, shingleN = n, portable = true)
          Dedup.minHashLshIncremental(state, delta, "text", "doc_id",
              numHashes = nh, bands = nb, shingleN = n, threshold = t,
              portable = true, maxBucket = Int.MaxValue)
            .select("doc_id").orderBy("doc_id")
        },
        Some(s"""WITH tk AS (SELECT doc_id, ${TextQueries.duckToks} AS ts
            FROM documents),
          sh AS (SELECT doc_id,
              list_distinct(${TextQueries.duckNgrams("ts", n)}) AS s
            FROM tk WHERE len(ts) >= $n),
          ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
          h AS (SELECT doc_id,
              CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % $p AS hv
            FROM ex),
          sig AS (SELECT doc_id, i,
              MIN(($aList[CAST(i AS INTEGER) + 1] * hv +
                   $bList[CAST(i AS INTEGER) + 1]) % $p) AS mv
            FROM h, range(0, $nh) r(i) GROUP BY 1, 2),
          bkt AS (SELECT doc_id, CAST(i // $rpb AS INTEGER) AS band,
              $fold AS bucket
            FROM sig GROUP BY 1, 2),
          cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bkt a JOIN bkt b
              ON a.band = b.band AND a.bucket = b.bucket
                AND b.doc_id % 2 = 1
                AND (a.doc_id % 2 = 0 OR a.doc_id < b.doc_id)
                AND a.doc_id <> b.doc_id),
          cnt AS (SELECT doc_id, len(s) AS c FROM sh),
          inter AS (SELECT c.da, c.db, COUNT(*) AS iv
            FROM cand c
            JOIN ex a ON a.doc_id = c.da
            JOIN ex b ON b.doc_id = c.db AND b.g = a.g
            GROUP BY 1, 2),
          dup AS (SELECT DISTINCT db AS doc_id FROM inter
            JOIN cnt ca ON ca.doc_id = da
            JOIN cnt cb ON cb.doc_id = db
            WHERE CAST(iv AS DOUBLE) / (ca.c + cb.c - iv) >= $t)
          SELECT doc_id FROM documents
          WHERE doc_id % 2 = 1
            AND doc_id NOT IN (SELECT doc_id FROM dup)
          ORDER BY doc_id"""))
    },

    // label-free near-dup via random-hyperplane LSH blocks, PORTABLE
    // integer path: md5-derived plane weights dotted with the 1e7-scaled
    // qint vectors in exact int64, so the oracle replays bucket
    // generation, the candidate join, and the exact cosine verify
    // bit-for-bit — the same full-pipeline trick as q66. maxBucket
    // unbounded HERE ONLY (q51/q66/q87 oracle pattern).
    locally {
      val (planes, bands, dim, t) = (10, 4, 64, 0.99)
      // clones (vec_id < 20 at +100000) make the green non-vacuous — the
      // natural fixture has zero pairs at cos ≥ 0.99. The oracle replays
      // the full LSH pipeline, so exactness needs no recall argument.
      QueryDef("q69_embedding_near_dup_lsh",
        (s, dir) => {
          val e = emb(s, dir)
          val clones = e.filter(col("vec_id") < 20L)
            .withColumn("vec_id", col("vec_id") + lit(100000L))
          Dedup.embeddingNearDupLsh(e.unionByName(clones), "embedding",
            "vec_id", threshold = t, planesPerBand = planes, bands = bands,
            maxBucket = Int.MaxValue, portableDim = dim)
          .select("vec_id_a", "vec_id_b")
          .orderBy("vec_id_a", "vec_id_b")
        },
        Some(s"""WITH corpus AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, embedding FROM embeddings
            WHERE vec_id < 20),
          qv AS (SELECT vec_id, ${dq("embedding")} AS q
            FROM corpus WHERE len(embedding) = $dim),
          w AS (SELECT b, p, i,
              CAST(concat('0x', substr(md5(
                CAST(b AS VARCHAR) || ':' || CAST(p AS VARCHAR) || ':' ||
                CAST(i AS VARCHAR)), 1, 5)) AS BIGINT) - 524288 AS wt
            FROM range(0, $bands) rb(b), range(0, $planes) rp(p),
              range(0, $dim) ri(i)),
          ex AS (SELECT vec_id, i, q[CAST(i AS INTEGER) + 1] AS x
            FROM qv, range(0, $dim) ri(i)),
          proj AS (SELECT vec_id, b, p, SUM(x * wt) AS s
            FROM ex JOIN w USING (i) GROUP BY 1, 2, 3),
          bkt AS (SELECT vec_id, b,
              CAST(SUM(CASE WHEN s >= 0
                THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
                ELSE 0 END) AS BIGINT) AS bucket
            FROM proj GROUP BY 1, 2),
          cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
            FROM bkt a JOIN bkt b
              ON a.b = b.b AND a.bucket = b.bucket
                AND a.vec_id < b.vec_id),
          normed AS (SELECT vec_id, q,
            sqrt(CAST(${qdot("q", "q")} AS DOUBLE)) AS nrm FROM qv)
          SELECT c.va AS vec_id_a, c.vb AS vec_id_b
          FROM cand c
          JOIN normed a ON a.vec_id = c.va
          JOIN normed b ON b.vec_id = c.vb
          WHERE CAST(${qdot("a.q", "b.q")} AS DOUBLE) / (a.nrm * b.nrm) >= $t
          ORDER BY 1, 2"""))
    },

    // IVF with nprobe = nlist is EXHAUSTIVE: probing every cell makes the
    // candidate set the whole corpus, so the index path must return
    // exactly the brute-force top-k — an oracle-checked pin on the IVF
    // build/assign/probe machinery itself (cell assignment bugs, dropped
    // cells, or probe-ranking bugs all break it). q65 keeps the
    // approximate nprobe=4 configuration this pin underwrites.
    QueryDef("q88_vector_ivf_probe_all",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.filter(col("vec_id") === 2L)
          .select("embedding").head().getSeq[Float](0)
        val (assigned, centroids) =
          VectorSearch.ivfBuild(e, "embedding", "vec_id", nlist = 16)
        VectorSearch.ivfTopK(assigned, centroids, "embedding", "vec_id", q,
            metric = "l2", k = 10, nprobe = 16, exact = true)
          .withColumnRenamed("score", "l2sq_scaled")
          .orderBy(col("l2sq_scaled").asc, col("vec_id").asc)
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2)
        SELECT vec_id, ${dl2("embedding", "qv")} AS l2sq_scaled
        FROM embeddings, q
        ORDER BY l2sq_scaled ASC, vec_id ASC LIMIT 10""")),

    // SimHash fingerprints, md5-portable token hash: the vote-fold is
    // reproduced verbatim in SQL (per-bit ±1 sums via a range(0,60)
    // lateral), so the 60-bit fingerprint itself hash-matches DuckDB.
    // The native murmur3 simHash32 stays the fast default; its
    // equivalence to the HOF fold is pinned in NativeExpressionsSpec.
    QueryDef("q67_dedup_simhash",
      (s, dir) => Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), Dedup.simHash60Md5(col("text")).as("simhash"))
        .orderBy("doc_id"),
      Some(TextQueries.duckSimHash60 +
        """ SELECT doc_id, simhash FROM fp ORDER BY doc_id""")),

    // product-quantization ANN (reference IVFPQ index type,
    // faiss_index.py:133-272): train codebooks from a deterministic
    // sample, encode to m ints per row, ADC table-lookup scan + exact
    // re-rank of the best candidates. Approximate → recall-audited
    // oracle ([[recallAudit]]); VectorStatsSpec holds the lossless +
    // recall proofs.
    QueryDef("q78_vector_pq_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val model = VectorSearch.pqTrain(e, "embedding", "vec_id",
          m = 8, k = 64)
        val q = e.filter(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0)
        val approx = VectorSearch.pqTopK(
            VectorSearch.pqEncode(e, "embedding", model),
            "embedding", "vec_id", model, q, topK = 10, rerank = 100)
          .select(lit("pq").as("idx"), lit(0L).as("qid"), col("vec_id"))
        recallAudit(e, approx, Seq(0L -> q), k = 10,
          minHits = Map("pq" -> 6))
      },
      Some(recallOracle(Seq("pq"), "vec_id = 0", 10))),

    // graph ANN (reference HNSWFLAT index type): per-partition navigable
    // small-world graphs, greedy beam probes, global top-k merge.
    // Approximate → recall-audited oracle; VectorStatsSpec holds the
    // recall proof.
    QueryDef("q79_vector_hnsw_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.filter(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0)
        val approx = Hnsw.topK(Hnsw.build(e, "embedding", "vec_id"),
            q, 10, ef = 64)
          .select(lit("hnsw").as("idx"), lit(0L).as("qid"),
            col("ext_id").as("vec_id"))
        recallAudit(e, approx, Seq(0L -> q), k = 10,
          minHits = Map("hnsw" -> 8))
      },
      Some(recallOracle(Seq("hnsw"), "vec_id = 0", 10))),

    // DiskANN-style graph ANN (reference DISKANN index type,
    // diskann_index.py:1-186): per-partition Vamana graphs (α-robust
    // prune), beam walk on PQ/ADC distances, full vectors touched only
    // for the exact re-rank — the on-disk access-cost model. Approximate
    // → recall-audited oracle; VectorStatsSpec holds the recall +
    // degree-cap proofs.
    QueryDef("q93_vector_diskann_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.filter(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0)
        val approx = graft.operators.Vamana.topK(
            graft.operators.Vamana.build(e, "embedding", "vec_id"),
            q, 10, beam = 64, rerank = 100)
          .select(lit("diskann").as("idx"), lit(0L).as("qid"),
            col("ext_id").as("vec_id"))
        recallAudit(e, approx, Seq(0L -> q), k = 10,
          minHits = Map("diskann" -> 8))
      },
      Some(recallOracle(Seq("diskann"), "vec_id = 0", 10))),

    // batched graph-ANN search (the reference's batched `vector_search`
    // over its graph index types, vector_search_ops.py:84-101): the query
    // batch is broadcast, each subgraph is reassembled ONCE per task and
    // walked once per query — ONE index pass for N queries, on both graph
    // index families. Approximate → recall-audited oracle per
    // (family, query); batch-vs-single parity proofs in VectorStatsSpec.
    QueryDef("q97_vector_graph_batch_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val queries = e.filter(col("vec_id") < 3L)
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
        val hnsw = Hnsw.batchTopK(
            Hnsw.build(e, "embedding", "vec_id"),
            queries, k = 5, ef = 64, colocated = true)
          .select(lit("hnsw").as("idx"), col("query_id").as("qid"),
            col("ext_id").as("vec_id"))
        val vamana = graft.operators.Vamana.batchTopK(
            graft.operators.Vamana.build(e, "embedding", "vec_id"),
            queries, k = 5, beam = 64, rerank = 64, colocated = true)
          .select(lit("vamana").as("idx"), col("query_id").as("qid"),
            col("ext_id").as("vec_id"))
        recallAudit(e, hnsw.unionByName(vamana), queries,
          k = 5, minHits = Map("hnsw" -> 12, "vamana" -> 12))
      },
      Some(recallOracle(Seq("hnsw", "vamana"), "vec_id < 3", 5))),

    // batched IVF + PQ search (closes the r10 gap: the reference batches
    // `vector_search` over EVERY index type, vector_search_ops.py:84-101
    // — r10 batched FLAT + both graph families, this adds the IVF/PQ
    // families): per-query probe sets broadcast as one pairs table, the
    // union of probed cells scanned ONCE for all queries; PQ codes
    // scored by a per-query ADC blob in ONE codegen'd lookup pass.
    // Approximate → recall-audited oracle per (family, query);
    // batch-vs-single parity proofs live in VectorStatsSpec.
    QueryDef("q98_vector_ivf_pq_batch_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val queries = e.filter(col("vec_id") < 3L)
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
        val (assigned, centroids) =
          VectorSearch.ivfBuild(e, "embedding", "vec_id", nlist = 16)
        val ivf = VectorSearch.ivfBatchTopK(assigned, centroids,
            "embedding", "vec_id", queries, metric = "l2", k = 5,
            nprobe = 6)
          .select(lit("ivf").as("idx"), col("query_id").as("qid"),
            col("vec_id"))
        val model = VectorSearch.pqTrain(e, "embedding", "vec_id",
          m = 8, k = 64)
        val pq = VectorSearch.pqBatchTopK(
            VectorSearch.pqEncode(e, "embedding", model),
            "embedding", "vec_id", model, queries, k = 5, rerank = 128)
          .select(lit("pq").as("idx"), col("query_id").as("qid"),
            col("vec_id"))
        recallAudit(e, ivf.unionByName(pq), queries,
          k = 5, minHits = Map("ivf" -> 8, "pq" -> 10))
      },
      Some(recallOracle(Seq("ivf", "pq"), "vec_id < 3", 5))),

    // batched IVF at nprobe=nlist on the exact scaled-int path: with
    // every cell probed the batch result provably equals per-query exact
    // brute-force top-k — which DuckDB reproduces with a window over the
    // same int64 grid. Oracle-pins the BATCH machinery (probe-pair join,
    // per-query window, tie-breaks) the same way q88 pins single-query
    // IVF.
    QueryDef("q99_vector_ivf_batch_probe_all",
      (s, dir) => {
        val e = emb(s, dir)
        val queries = e.filter(col("vec_id") < 3L)
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
        val (assigned, centroids) =
          VectorSearch.ivfBuild(e, "embedding", "vec_id", nlist = 16)
        VectorSearch.ivfBatchTopK(assigned, centroids, "embedding",
            "vec_id", queries, metric = "l2", k = 5, nprobe = 16,
            exact = true)
          .select(col("query_id"), col("vec_id"), col("rank"),
            col("score").cast("long").as("l2sq_scaled"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 3),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 ${dl2("e.embedding", "q.qv")} AS l2sq_scaled,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${dl2("e.embedding", "q.qv")} ASC,
                            e.vec_id ASC) AS rank
          FROM embeddings e, q)
        SELECT query_id, vec_id, rank, l2sq_scaled
        FROM scored WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // dataset-route vector search (reference create_vector_index +
    // vector_search, vector_search_ops.py:18-48,84-101): embeddings
    // round-trip into a graft table, a FLAT index binding is created,
    // and the search runs through ds.vectorSearch on the exact
    // scaled-int path; row identity maps back to vec_id through the
    // registered data source's withUuid read. Oracle-pins the index
    // routing + uuid plumbing end to end, not just the distance math.
    // De-fixtured (r10): the corpus is ingested SHUFFLED across multiple
    // append files (uuid order ≠ vec_id order) and carries 15 exact
    // clones of the query vector — 16 zero-distance rows straddling the
    // k=10 boundary — so the green requires the tieBreakCols path to
    // resolve score ties by vec_id exactly as the oracle does, not an
    // ingest-order accident.
    QueryDef("q94_format_vector_flat_search",
      (s, dir) => {
        val e = emb(s, dir)
        val clones = e.filter(col("vec_id") === 2L)
          .crossJoin(s.range(0, 15).withColumnRenamed("id", "_i"))
          .withColumn("vec_id", col("_i") + lit(300000L))
          .select(e.columns.map(col).toIndexedSeq: _*)
        val corpus = e.unionByName(clones)
        val root = graft.QueryCleanup.tempRoot("q94")
        val ds = graft.format.GraftDataset.create(s, root, e.schema)
        ds.append(corpus.repartition(8, pmod(col("vec_id"), lit(8))))
        ds.commit("ingest shuffled")
        ds.createVectorIndex("embedding", indexType = "FLAT")
        val q = e.filter(col("vec_id") === 2L)
          .select("embedding").head().getSeq[Float](0)
        val hits = ds.vectorSearch("embedding", q, k = 10,
          metric = "l2", exact = true, tieBreakCols = Seq("vec_id"))
        val withU = s.read.format("graft").option("withUuid", "true")
          .load(root)
        hits.join(withU, hits("row_uuid") === withU("_uuid"))
          .select(col("vec_id"), col("score").cast("long").as("l2sq_scaled"))
          .orderBy(col("l2sq_scaled").asc, col("vec_id").asc)
      },
      Some(s"""WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT 300000 + i, embedding FROM embeddings, range(0, 15) t(i)
          WHERE embeddings.vec_id = 2),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2)
        SELECT vec_id, ${dl2("embedding", "qv")} AS l2sq_scaled
        FROM corpus, q
        ORDER BY l2sq_scaled ASC, vec_id ASC LIMIT 10""")),

    // INCREMENTAL vector-index maintenance, oracle-checked end to end:
    // 90% of the corpus is indexed, the remaining 10% arrives as an
    // append and updateVectorIndex assigns it to the EXISTING cells
    // (delta fraction 0.11 < the 0.5 rebuild threshold — the assign
    // path, not a rebuild). The query vector is itself a DELTA row, so
    // its distance-0 self-hit exists ONLY in the incrementally-appended
    // cell partitions; probe-all + exact scoring makes the whole result
    // brute-force-equal, which DuckDB recomputes.
    QueryDef("q109_vector_index_incremental",
      (s, dir) => {
        val e = emb(s, dir)
        val root = graft.QueryCleanup.tempRoot("q109")
        val ds = graft.format.GraftDataset.create(s, root, e.schema)
        ds.append(e.filter(col("vec_id") % 10 =!= 9))
        ds.commit("ninety percent")
        ds.createVectorIndex("embedding", nlist = 16, indexType = "IVF")
        ds.append(e.filter(col("vec_id") % 10 === 9))
        ds.commit("delta tenth")
        ds.updateVectorIndex("embedding")
        val q = e.filter(col("vec_id") === 9L)
          .select("embedding").head().getSeq[Float](0)
        val hits = ds.vectorSearch("embedding", q, k = 10,
          metric = "l2", nprobe = 16, exact = true)
        val withU = s.read.format("graft").option("withUuid", "true")
          .load(root)
        hits.join(withU, hits("row_uuid") === withU("_uuid"))
          .select(col("vec_id"), col("score").cast("long").as("l2sq_scaled"))
          .orderBy(col("l2sq_scaled").asc, col("vec_id").asc)
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 9)
        SELECT vec_id, ${dl2("embedding", "qv")} AS l2sq_scaled
        FROM embeddings, q
        ORDER BY l2sq_scaled ASC, vec_id ASC LIMIT 10""")),

    // safe-eval attribute access (reference safe_evaluator.py:46-84):
    // `.size`/`.shape[k]`/`.min`/`.max`/`.mean` over the embedding tensor
    // translate to size()/array_min()/array_max()/aggregate() — whole
    // string query stays a codegen'd Catalyst predicate
    QueryDef("q76_expr_attr_access",
      (s, dir) => graft.operators.SafeExpr.filter(emb(s, dir),
          "embedding.size == 64 and embedding.max >= 0.29 and label < 3")
        .select("vec_id", "label").orderBy("vec_id"),
      Some("""SELECT vec_id, label FROM embeddings
        WHERE len(embedding) = 64
          AND list_aggregate(embedding, 'max') >= 0.29
          AND label < 3 ORDER BY vec_id""")),

    // RESIDUAL IVFPQ (r15) — PQ codes over v − centroid(cell), the
    // faiss IVFPQ layout: RecallSoak measured raw-vector PQ collapsing
    // to 0.17 recall@10 on clustered corpora (same-cluster members
    // quantize identically) while the residual build holds 0.93 at the
    // retuned defaults. This pins the batched residual search
    // (per-(query,cell) ADC tables over query residuals + exact rerank)
    // under the recall-audit oracle.
    QueryDef("q128_vector_ivfpq_residual",
      (s, dir) => {
        val e = emb(s, dir)
        val queries = e.filter(col("vec_id") < 3L)
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
        val (assigned, centroids) =
          VectorSearch.ivfBuild(e, "embedding", "vec_id", nlist = 16)
        val (enc, model) = VectorSearch.ivfPqResidualBuild(
          assigned, centroids, "embedding", "vec_id", m = 8, k = 64)
        val res = VectorSearch.ivfPqResidualBatchTopK(enc, centroids,
            "embedding", "vec_id", model, queries, k = 5, nprobe = 8,
            rerank = 128)
          .select(lit("ivfpq_res").as("idx"), col("query_id").as("qid"),
            col("vec_id"))
        recallAudit(e, res, queries, k = 5,
          minHits = Map("ivfpq_res" -> 12))
      },
      Some(recallOracle(Seq("ivfpq_res"), "vec_id < 3", 5))),

    // SHARD-ROUTED graph ANN (r18, VERDICT r17 #2): clustered builds
    // persist a k-means centroid per subgraph shard; each query walks
    // only its probeParts nearest shards instead of all of them — the
    // IVF nprobe design (reference faiss_index.py:133-272) applied to
    // the graph families, making graph search sub-linear in shard count
    // (10^4 shards at 100 TB ⇒ p beam walks, not 10^4). Probe-all stays
    // the exactness fallback; sentinel-less shards are always probed.
    // Recall-audited oracle; the p-directories-read and routes-equal-
    // probe-all proofs live in GraphRoutingSpec.
    QueryDef("q131_vector_graph_routed_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val queries = e.filter(col("vec_id") < 3L)
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
        // NOT pinned, unlike q132: at suite scale the routed batch
        // reads the index twice (sentinel routing + walk) and two cheap
        // re-evaluations beat a persist's materialization cost
        // (measured 4.2 s pinned vs 2.8-3.2 s unpinned at sf0.1)
        val hnsw = Hnsw.batchTopK(
            Hnsw.build(e, "embedding", "vec_id", numPartitions = 8,
              clustered = true),
            queries, k = 5, ef = 64, colocated = true, probeParts = 4)
          .select(lit("hnsw_routed").as("idx"), col("query_id").as("qid"),
            col("ext_id").as("vec_id"))
        val vamana = graft.operators.Vamana.batchTopK(
            graft.operators.Vamana.build(e, "embedding", "vec_id",
              numPartitions = 8, clustered = true),
            queries, k = 5, beam = 64, rerank = 64, colocated = true,
            probeParts = 4)
          .select(lit("vamana_routed").as("idx"), col("query_id").as("qid"),
            col("ext_id").as("vec_id"))
        recallAudit(e, hnsw.unionByName(vamana), queries,
          k = 5, minHits = Map("hnsw_routed" -> 12, "vamana_routed" -> 12))
      },
      Some(recallOracle(Seq("hnsw_routed", "vamana_routed"), "vec_id < 3", 5))),

    // DataFrame-native routed k-NN JOIN (r19, VERDICT r18 #2): every row
    // of a 500-row query TABLE finds its k nearest in the indexed corpus
    // — the corpus-scale form of the reference's batched `vector_search`
    // (vector_search_ops.py:84-101). The query table never touches the
    // driver: each query row routes itself to its probeParts nearest
    // cells via one codegen'd expression (broadcast |shards| centroids),
    // then a cogroup equi-join on shard id walks each shard's graph once
    // for exactly the queries routed to it (operators/KnnJoin.scala; the
    // no-cartesian / no-collect plan proofs live in KnnJoinSpec). The
    // audit's exact truth is inherently |q|·|corpus| — computed as ONE
    // broadcast(bounded query table) cross + per-qid window, an audit
    // cost, not an operator cost.
    QueryDef("q132_vector_knn_join",
      (s, dir) => {
        val e = emb(s, dir)
        val qdf = e.filter(col("vec_id") < 500L)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        // persist the indexes, as a real deployment would (the format
        // layer pins or part-partitions them): the join's shard-list
        // pass and the walk re-read the index, and an unpersisted build
        // lineage would re-run graph construction for each
        def pin(df: DataFrame): DataFrame = {
          val p = df.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count(); p
        }
        val hIdx = pin(Hnsw.build(e, "embedding", "vec_id",
          numPartitions = 8, clustered = true))
        val vIdx = pin(graft.operators.Vamana.build(e, "embedding",
          "vec_id", numPartitions = 8, clustered = true))
        val hnsw = KnnJoin.hnsw(hIdx, qdf, "qid", "qv", k = 5,
            probeParts = 4)
          .select(lit("hnsw_knn").as("idx"), col("query_id").as("qid"),
            col("ext_id").as("vec_id"))
        val vamana = KnnJoin.vamana(vIdx, qdf, "qid", "qv", k = 5,
            rerank = 64, probeParts = 4)
          .select(lit("vamana_knn").as("idx"), col("query_id").as("qid"),
            col("ext_id").as("vec_id"))
        // the p=4-of-8 recall on this near-uniform synthetic table is
        // DETERMINISTIC (hash-seeded builds, no RNG): measured famHits
        // 1995/1995 (sf0.01) and 1982/1926 (sf0.1) of 2500 — the floor
        // sits under both with ~7% margin
        knnRecallAudit(e, hnsw.unionByName(vamana), qdf, k = 5,
          minHits = Map("hnsw_knn" -> 1800, "vamana_knn" -> 1800))
      },
      Some(recallOracle(Seq("hnsw_knn", "vamana_knn"), "vec_id < 500", 5))),

    // IVF k-NN JOIN, probe-all + exact scoring (r19): the IVF flavor of
    // the DataFrame-native knn join — queries route to cells with the
    // same codegen'd expression, one equi-join on cell scores pairs on
    // the scaled-int grid. At nprobe = nlist the result PROVABLY equals
    // per-query brute force, so unlike the graph families' recall
    // audits this oracle pins every row and score EXACTLY — 500 queries
    // against the corpus, no driver collect of either side (KnnJoinSpec
    // holds the routed-nprobe and batch-parity proofs).
    QueryDef("q133_vector_ivf_knn_join",
      (s, dir) => {
        val e = emb(s, dir)
        val qdf = e.filter(col("vec_id") < 500L)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val (assigned, centroids) =
          VectorSearch.ivfBuild(e, "embedding", "vec_id", nlist = 16)
        KnnJoin.ivf(assigned, centroids, "embedding", "vec_id", qdf,
            "qid", "qv", metric = "l2", k = 5, nprobe = 16, exact = true)
          .select(col("query_id"), col("ext_id").as("vec_id"),
            col("rank"), col("score").cast("long").as("l2sq_scaled"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 500),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 ${dl2("e.embedding", "q.qv")} AS l2sq_scaled,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${dl2("e.embedding", "q.qv")} ASC,
                            e.vec_id ASC) AS rank
          FROM embeddings e, q)
        SELECT query_id, vec_id, rank, l2sq_scaled
        FROM scored WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // SEMANTIC DEDUP VIA THE K-NN SELF-JOIN (r20, VERDICT r19 #2): the
    // retrieval-shaped form of q87 for the 100 TB pipeline — instead of
    // blocking into IVF cells and verifying all pairs inside each cell,
    // EVERY corpus row queries the index for its nearest OTHER row (the
    // corpus IS the query table; one cell-routed equi-join, no driver
    // collect of either side), and a row is a duplicate iff that
    // neighbor clears the threshold from a LOWER id — SemDeDup's keep-
    // min-id rule (Abbas 2023; reference README.md:19's hybrid-search
    // motivation applied to dedup). At nprobe = nlist with exact
    // scaled-int cosine the join provably equals per-row brute force
    // (q133's guarantee), so the oracle pins every row: nearest-other
    // id, exact cosine on the 1e6 grid, and the drop verdict. At scale,
    // nprobe < nlist routes each row to its few nearest cells and the
    // top-k window sees |rows|·k candidates, never the corpus²; the
    // KnnJoinSoak dedup leg measures that form against this exact one.
    QueryDef("q134_semantic_dedup_knn_join",
      (s, dir) => {
        val e = emb(s, dir)
        val clones = e.filter(col("vec_id") < 25L)
          .withColumn("vec_id", col("vec_id") + lit(100000L))
        val corpus = e.unionByName(clones).select("vec_id", "embedding")
        val qdf = corpus.select(col("vec_id").as("qid"),
          col("embedding").as("qv"))
        val (assigned, centroids) =
          VectorSearch.ivfBuild(corpus, "embedding", "vec_id", nlist = 16)
        // k=2 suffices for nearest-OTHER: the self row (cos 1.0) can
        // displace at most one of the two returned rows
        KnnJoin.ivf(assigned, centroids, "embedding", "vec_id", qdf,
            "qid", "qv", metric = "cosine", k = 2, nprobe = 16,
            exact = true)
          .filter(col("ext_id") =!= col("query_id"))
          .withColumn("_r", row_number().over(Window
            .partitionBy("query_id")
            .orderBy(col("score").desc, col("ext_id").asc)))
          .filter(col("_r") === 1)
          .select(col("query_id").as("vec_id"),
            col("ext_id").as("nn_id"),
            round(col("score") * lit(1e6)).cast("long").as("cos_x1e6"),
            (col("score") >= lit(0.9999) &&
              col("ext_id") < col("query_id")).as("is_dup"))
          .orderBy("vec_id")
      },
      Some(s"""WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 25),
        prep AS (SELECT vec_id, ${dq("embedding")} AS qv FROM corpus),
        normed AS (SELECT vec_id, qv,
          sqrt(CAST(${qdot("qv", "qv")} AS DOUBLE)) AS nrm FROM prep),
        pairs AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
            CAST(${qdot("a.qv", "b.qv")} AS DOUBLE) / (a.nrm * b.nrm) AS cos
          FROM normed a JOIN normed b ON a.vec_id <> b.vec_id),
        nn AS (SELECT vec_id, nn_id, cos,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, nn_id ASC) AS r
          FROM pairs)
        SELECT vec_id, nn_id,
          CAST(round(cos * 1000000.0) AS BIGINT) AS cos_x1e6,
          (cos >= 0.9999 AND nn_id < vec_id) AS is_dup
        FROM nn WHERE r = 1
        ORDER BY vec_id"""))
  )

  /** [[recallAudit]] for the knn JOIN, where queries are a DataFrame:
    * the exact kth radius comes from one broadcast cross of the BOUNDED
    * query table (≤500 rows by the caller's predicate) against the
    * corpus + a per-qid window — |q| separate TakeOrdered jobs (the
    * driver-batch audit's shape) would be |q| full corpus scans here.
    * Verdict contract identical to [[recallAudit]]: family hit total ≥
    * minHits AND every query lands ≥1 true neighbor.
    */
  def knnRecallAudit(e: DataFrame, approx: DataFrame, qdf: DataFrame,
                     k: Int, minHits: Map[String, Int]): DataFrame = {
    // r21: the |corpus|×|q| exact-truth scoring ran in ONE task (the
    // corpus is a single parquet file → one scan partition; measured
    // 3.0 s of q132's 3.3 s) — spread it over the cores first (guide
    // §2.5 input skew). The kth radius itself is a per-query top-k:
    // the partial top-k aggregate reduces each task's pairs to ≤ k per
    // query before the exchange (|q|·k rows), where the row_number
    // window this replaces shuffled every scored pair (identical
    // (score asc, id asc) order; scores are non-null by the same
    // dropped-null-vector contract the joined families already hold).
    val par = e.sparkSession.sparkContext.defaultParallelism
    val kth = e.select(col("vec_id"), col("embedding"))
      .repartition(par)
      .crossJoin(broadcast(qdf)) // bounded: |queries| ≤ 500 rows
      .withColumn("_l2", V.l2SqScaled(col("embedding"), col("qv")))
      // vectors shed before the rank exchange
      .select(col("qid"), col("vec_id"), col("_l2"))
      .groupBy(col("qid"))
      .agg(graft.functions.NativeExpressions.topKPairs(
        col("_l2"), col("vec_id"), k, asc = true).as("_tk"))
      // kth element absent (corpus < k rows) drops the qid, exactly as
      // the window's `_r === k` filter did
      .select(col("qid"), get(col("_tk"), lit(k - 1)).getField("score")
        .as("_kth"))
      .filter(col("_kth").isNotNull)
    val minExpr = minHits.tail.foldLeft(
        when(col("idx") === minHits.head._1, lit(minHits.head._2))) {
      case (acc, (f, m)) => acc.when(col("idx") === f, lit(m))
    }
    e.select(col("vec_id"), col("embedding"))
      .join(broadcast(approx), "vec_id")
      .join(broadcast(qdf), "qid")
      .withColumn("_l2", V.l2SqScaled(col("embedding"), col("qv")))
      .join(broadcast(kth), "qid")
      .groupBy("idx", "qid")
      .agg(count(lit(1)).as("returned"),
        max(col("_kth")).as("kth_l2sq_scaled"),
        sum(when(col("_l2") <= col("_kth"), 1L).otherwise(0L)).as("_hits"))
      .withColumn("_famHits", sum(col("_hits")).over(Window.partitionBy("idx")))
      .select(col("idx"), col("qid"), col("returned"),
        col("kth_l2sq_scaled"),
        (col("_famHits") >= minExpr && col("_hits") >= lit(1L))
          .as("recall_ok"))
      .orderBy("idx", "qid")
  }
}
