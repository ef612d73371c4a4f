package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.functions.{VectorFunctions => V}

/** Vector (ANN) search over an embedding column — the Spark-native
  * replacement for MULLER's faiss/diskann vector indexes
  * (reference: muller/core/vector/algorithms/faiss_index.py:133-272,
  * mixins/query.py:264-270; search surface dataset.py:1564-1568).
  *
  * Paths:
  *   - `bruteForceTopK` — exact FLAT-equivalent: distance expression +
  *     sort+limit (Spark TakeOrderedAndProject ⇒ per-partition top-k then
  *     k-way merge on the driver — no full sort, no full shuffle).
  *   - `ivfTopK` — IVF-style approximate path: k-means-lite centroid
  *     assignment (centroids = deterministic sample), search only the
  *     `nprobe` closest cells. The 100 TB shape: centroid table is tiny →
  *     broadcast; data shuffled once by cell at index-build time.
  *   - `batchTopK` — many queries at once: broadcast the query batch,
  *     one pass over the data, per-query window top-k.
  *
  * Metrics: `cosine`, `l2`, `ip` (muller/core/vector/utils.py:25-29).
  */
object VectorSearch {

  /** Score column for a metric; `exact=true` uses the scaled-int
    * deterministic path (for oracle-checked runs).
    */
  def score(metric: String, a: Column, b: Column, exact: Boolean): Column =
    (metric, exact) match {
      case ("cosine", true)  => V.cosineScaled(a, b)
      case ("cosine", false) => V.cosine(a, b)
      case ("l2", true)      => V.l2SqScaled(a, b)
      case ("l2", false)     => V.l2Sq(a, b)
      case ("ip", true)      => V.dotScaled(a, b).cast("double")
      case ("ip", false)     => V.dot(a, b)
      case (m, _) => throw new IllegalArgumentException(s"bad metric $m")
    }

  /** Higher score = better match (l2 ascending). Null scores (corrupt or
    * dimension-mismatched vectors) always rank LAST — `asc` alone would
    * put nulls first for l2 and displace real neighbors.
    */
  private[operators] def rankOrder(metric: String, s: Column): Column =
    if (metric == "l2") s.asc_nulls_last else s.desc_nulls_last

  /** Per-group top-k of `(groupCol, idCol, scoreCol)` with MAP-SIDE
    * PARTIAL COMBINE ([[graft.functions.NativeExpressions.topKPairs]],
    * r20): each task reduces its scored pairs to ≤ k per group before
    * the exchange, so the rank shuffle carries |groups|·k rows instead
    * of EVERY scored (row, query) pair — the window formulation it
    * replaces shuffled all of them (a 105k-row knn self-join spent
    * >100 s there). Ordering is the windows' exactly: (score asc/desc
    * nulls-last, id asc); output appends int `rank` 1..k. Rows with a
    * NULL id are dropped on BOTH paths — a hit without identity is
    * unusable downstream (every consumer joins/tie-breaks on the id),
    * and the aggregate's long id slot cannot carry one; the window
    * fallback (non-integral id columns) filters them explicitly so the
    * result set never depends on the id column's TYPE.
    */
  private[operators] def topKPerGroup(df: DataFrame, groupCol: String,
                                      idCol: String, scoreCol: String,
                                      asc: Boolean, k: Int): DataFrame = {
    val idT = df.schema(idCol).dataType
    idT match {
      case LongType | IntegerType | ShortType | ByteType =>
        df.groupBy(col(groupCol))
          .agg(graft.functions.NativeExpressions.topKPairs(
            col(scoreCol), col(idCol).cast("long"), k, asc).as("_tk"))
          .select(col(groupCol),
            posexplode(col("_tk")).as(Seq("_pos", "_hit")))
          .select(col(groupCol),
            col("_hit.ext_id").cast(idT).as(idCol),
            col("_hit.score").as(scoreCol),
            (col("_pos") + 1).cast("int").as("rank"))
      case _ =>
        val ord = if (asc) col(scoreCol).asc_nulls_last
                  else col(scoreCol).desc_nulls_last
        val w = Window.partitionBy(groupCol).orderBy(ord, col(idCol).asc)
        df.filter(col(idCol).isNotNull)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col(groupCol), col(idCol), col(scoreCol), col("rank"))
    }
  }

  /** Exact top-k for one query vector (as a literal array). */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Float], metric: String, k: Int,
                     exact: Boolean = false,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    val q = array(query.map(x => lit(x)): _*)
    // score ties at the k boundary resolve by the caller's tieBreak
    // columns first (a user-visible identity like vec_id), then idCol —
    // so the result set is deterministic regardless of ingest order
    val order = (rankOrder(metric, col("_score")) +:
      tieBreak.map(col(_).asc)) :+ col(idCol).asc
    df.withColumn("_score", score(metric, col(vecCol), q, exact))
      .orderBy(order: _*)
      .limit(k)
      .select(col(idCol), col("_score").as("score"))
  }

  /** Batched top-k: one scan of the corpus for all queries. The query
    * batch (id, vector) is broadcast; per-query ranking via window top-k —
    * the idiomatic replacement for faiss batch search
    * (exp_scripts/vector_filter.py:85-101).
    */
  def batchTopK(df: DataFrame, vecCol: String, idCol: String,
                queries: DataFrame, qIdCol: String, qVecCol: String,
                metric: String, k: Int, exact: Boolean = false): DataFrame = {
    val joined = df.crossJoin(broadcast(
        queries.select(col(qIdCol).as("_qid"), col(qVecCol).as("_qvec"))))
      .withColumn("_score", score(metric, col(vecCol), col("_qvec"), exact))
    // vectors shed at the scoring projection, then the partial top-k
    // aggregate — the rank exchange carries |q|·k rows, never the
    // corpus×batch pair set (r20, found via KnnJoin.ivf's 105k self-join)
    topKPerGroup(joined.select(col("_qid"), col(idCol), col("_score")),
        "_qid", idCol, "_score", asc = metric == "l2", k)
      .select(col("_qid").as("query_id"), col(idCol), col("rank"),
        col("_score").as("score"))
  }

  /** Hybrid search (the paper's "hybrid search engine", reference
    * README.md:19; exp_scripts/run_vector_filter_exp.sh): scalar/text
    * predicate and vector ranking in ONE plan — pre-filter then exact
    * top-k. Catalyst pushes the predicate to the scan, so the distance
    * math runs only on surviving rows; with a selective predicate this
    * beats ANN-then-refilter both in cost and in recall (no post-filter
    * starvation).
    */
  def hybridTopK(df: DataFrame, pred: Column, vecCol: String, idCol: String,
                 query: Seq[Float], metric: String, k: Int,
                 exact: Boolean = false): DataFrame =
    bruteForceTopK(df.filter(pred), vecCol, idCol, query, metric, k, exact)

  /** Deterministic IVF-lite index: `nlist` centroids = the rows with the
    * smallest `xxhash64(id)` — a deterministic uniform pseudo-random
    * sample (k-means seeding without the iterations — good enough for
    * cell routing). The sample is a per-partition top-k merged on the
    * driver (TakeOrderedAndProject): no global sort, no single-partition
    * exchange, no extra count pass — the shape that survives 100 TB,
    * unlike a row_number window over the whole corpus.
    * Returns (cellAssignments, centroids).
    */
  /** The centroid-sample frame (exposed so specs can assert its physical
    * plan is a TakeOrderedAndProject with NO single-partition exchange).
    * Null vectors are dropped — a null in the sample would become a null
    * centroid and NPE cell assignment on the driver.
    */
  def ivfSample(df: DataFrame, vecCol: String, idCol: String,
                nlist: Int): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .orderBy(xxhash64(col("_id")).asc, col("_id").asc)
      .limit(nlist)

  def ivfBuild(df: DataFrame, vecCol: String, idCol: String,
               nlist: Int, refineIters: Int = 1): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val sampled = ivfSample(df, vecCol, idCol, nlist)
      .collect() // nlist rows only — bounded by construction
    val cells = sampled.toIndexedSeq.zipWithIndex.map { case (r, i) =>
      (i, r.getSeq[Float](1))
    }
    import spark.implicits._
    val seeded = cells.toDF("cell", "_centroid")
    val centroids = ivfRefine(df, vecCol, seeded, refineIters)
    val assigned = assignCells(df, vecCol, centroids)
    (assigned, centroids)
  }

  /** Lloyd refinement of the seeded centroids: `iters` passes of
    * assign → recompute cell means. The mean computation is a
    * per-partition PARTIAL aggregate (cell → sum-vector, count) inside
    * one `mapPartitions`, merged on the driver — the reduced state is
    * `nlist × dim` floats regardless of corpus size (the tree-aggregate
    * shape), so a refinement pass costs one scan and no shuffle. Empty
    * cells keep their previous centroid. The k-means++-style seed from
    * [[ivfSample]] plus 1–3 refinement passes is the standard IVF build
    * (reference trains faiss IVF the same way, faiss_index.py:133-272).
    */
  def ivfRefine(df: DataFrame, vecCol: String, centroids: DataFrame,
                iters: Int): DataFrame = {
    require(iters >= 0, s"bad iters $iters")
    val spark = df.sparkSession
    import spark.implicits._
    var cents = centroids
    for (_ <- 0 until iters) {
      val cl = cents.collect().map(r => (r.getAs[Int]("cell"),
        r.getSeq[Float](1).toArray)).sortBy(_._1)
      val cvecs = cl.map(_._2)
      val dim = cvecs.head.length
      val partials = df
        .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
        .select(col(vecCol))
        .mapPartitions { rows =>
          val sums = Array.fill(cvecs.length)(new Array[Double](dim))
          val counts = new Array[Long](cvecs.length)
          rows.foreach { r =>
            val v = r.getSeq[Float](0)
            var best = 0; var bestD = Double.MaxValue; var c = 0
            while (c < cvecs.length) {
              var d = 0.0; var i = 0
              val cv = cvecs(c)
              while (i < dim) { val x = v(i) - cv(i); d += x * x; i += 1 }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            val s = sums(best); var i = 0
            while (i < dim) { s(i) += v(i); i += 1 }
            counts(best) += 1
          }
          Iterator.tabulate(cvecs.length)(c =>
            (c, sums(c).toSeq, counts(c))).filter(_._3 > 0)
        }
        .collect() // ≤ partitions × nlist rows; merged below
      val merged = Array.fill(cvecs.length)(new Array[Double](dim))
      val total = new Array[Long](cvecs.length)
      partials.foreach { case (c, s, n) =>
        var i = 0; while (i < dim) { merged(c)(i) += s(i); i += 1 }
        total(c) += n
      }
      val next = cl.indices.map { c =>
        val vec = if (total(c) == 0) cvecs(c).toSeq
          else merged(c).map(x => (x / total(c)).toFloat).toSeq
        (cl(c)._1, vec) // keep the caller's cell ids
      }
      cents = next.toDF("cell", "_centroid")
    }
    cents
  }

  /** Assign every row to its nearest centroid cell (broadcast centroids,
    * argmin inside one projection — no shuffle).
    */
  def assignCells(df: DataFrame, vecCol: String, centroids: DataFrame): DataFrame = {
    val cents = centroids.collect().map(r =>
      (r.getAs[Int]("cell"), r.getSeq[Float](1))) // nlist rows — bounded
    require(cents.nonEmpty, "no centroids")
    val dim = cents.head._2.length
    val flat = new Array[Float](cents.length * dim)
    cents.iterator.zipWithIndex.foreach { case ((_, v), i) =>
      var j = 0; while (j < dim) { flat(i * dim + j) = v(j); j += 1 }
    }
    // ONE codegen'd argmin expression carrying the centroid matrix as a
    // flat reference object. The previous Column-algebra form (aggregate
    // over nlist struct literals) grew the PLAN by nlist·dim literal
    // nodes — 13 MiB task binaries at nlist=1024, measured — capping
    // nlist far below the √n sizing guidance. Wrong-dim/null vec → null
    // cell (dropped by cell joins and the dedup NULL-cell filters).
    val idx = graft.functions.NativeExpressions.nearestCell(
      col(vecCol), cents.length, dim, flat)
    val ids = cents.map(_._1)
    val cell = // common case: ivfBuild emits dense 0..nlist-1 ids
      if (ids.sameElements(ids.indices)) idx
      else element_at(typedlit(ids.toSeq), idx + lit(1))
    df.withColumn("cell", cell)
  }

  // ---- product quantization (IVFPQ path — reference
  // faiss_index.py:133-272's IVFPQ index type, re-expressed as
  // codebook-broadcast expressions instead of a native faiss handle) ----

  /** PQ codebooks: `m` subspaces × `k` centroids × `dim/m` floats,
    * flattened `[subspace][centroid][subDim]`. Small by construction
    * (m·k·subDim = k·dim floats) — rides the plan as a reference object.
    */
  final case class PqModel(m: Int, k: Int, dim: Int, codebooks: Array[Float]) {
    def subDim: Int = dim / m
  }

  /** Train codebooks from a deterministic sample: the `k` rows with the
    * smallest `xxhash64(id)` contribute their subvectors as centroids —
    * the same seeding-without-iterations strategy as [[ivfBuild]], and the
    * same TakeOrderedAndProject shape (per-partition top-k, driver merges
    * k rows — no global sort at 100 TB).
    */
  def pqTrain(df: DataFrame, vecCol: String, idCol: String,
              m: Int, k: Int, refineIters: Int = 1): PqModel = {
    val sampled = ivfSample(df, vecCol, idCol, k).collect()
    require(sampled.nonEmpty, "empty corpus")
    val dim = sampled.head.getSeq[Float](1).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val kk = sampled.length // may be < requested k on a small corpus
    val cb = new Array[Float](m * kk * sub)
    for ((r, ki) <- sampled.zipWithIndex) {
      val v = r.getSeq[Float](1)
      for (mi <- 0 until m; j <- 0 until sub)
        cb((mi * kk + ki) * sub + j) = v(mi * sub + j)
    }
    pqRefine(df, vecCol, PqModel(m, kk, dim, cb), refineIters)
  }

  /** Per-subspace Lloyd refinement of PQ codebooks — the same bounded
    * partial-aggregate shape as [[ivfRefine]]: each pass is ONE
    * `mapPartitions` emitting per-partition (sum, count) state of size
    * `m·k·subDim` (= k·dim floats, corpus-independent), merged on the
    * driver into new per-subspace means. Empty codes keep their
    * centroid; per-row work equals one [[pqEncode]] pass.
    */
  def pqRefine(df: DataFrame, vecCol: String, model: PqModel,
               iters: Int): PqModel = {
    require(iters >= 0, s"bad iters $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val (m, k, sub, dim) = (model.m, model.k, model.subDim, model.dim)
    var cb = model.codebooks
    for (_ <- 0 until iters) {
      val bcb = cb
      val partials = df
        .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
        .select(col(vecCol))
        .mapPartitions { rows =>
          val sums = new Array[Double](m * k * sub)
          val counts = new Array[Long](m * k)
          rows.foreach { r =>
            val v = r.getSeq[Float](0)
            var mi = 0
            while (mi < m) {
              var best = 0; var bestD = Double.MaxValue; var ki = 0
              while (ki < k) {
                var d = 0.0; var j = 0
                val off = (mi * k + ki) * sub
                while (j < sub) {
                  val x = v(mi * sub + j) - bcb(off + j); d += x * x; j += 1
                }
                if (d < bestD) { bestD = d; best = ki }
                ki += 1
              }
              val off = (mi * k + best) * sub
              var j = 0
              while (j < sub) { sums(off + j) += v(mi * sub + j); j += 1 }
              counts(mi * k + best) += 1
              mi += 1
            }
          }
          Iterator.single((sums, counts))
        }
        .collect() // one (k·dim, m·k) state blob per partition
      val sums = new Array[Double](m * k * sub)
      val counts = new Array[Long](m * k)
      partials.foreach { case (s, c) =>
        var i = 0; while (i < sums.length) { sums(i) += s(i); i += 1 }
        i = 0; while (i < counts.length) { counts(i) += c(i); i += 1 }
      }
      val next = new Array[Float](m * k * sub)
      var cell = 0
      while (cell < m * k) {
        var j = 0
        while (j < sub) {
          next(cell * sub + j) =
            if (counts(cell) == 0) cb(cell * sub + j)
            else (sums(cell * sub + j) / counts(cell)).toFloat
          j += 1
        }
        cell += 1
      }
      cb = next
    }
    model.copy(codebooks = cb)
  }

  /** Encode every vector to `m` centroid ids (the PQ code — m ints
    * instead of dim floats; the compressed representation scanned at
    * search time). One codegen'd argmin pass per row.
    */
  def pqEncode(df: DataFrame, vecCol: String, model: PqModel,
               codeCol: String = "_pq"): DataFrame =
    df.withColumn(codeCol, graft.functions.NativeExpressions.pqEncode(
      col(vecCol), model.m, model.k, model.subDim, model.codebooks))

  /** ADC distance table for one query: `table[m][k]` = squared L2 between
    * the query's subvector and each centroid. Computed driver-side (m·k
    * entries), broadcast with the expression.
    */
  def adcTable(model: PqModel, query: Seq[Float]): Array[Double] = {
    require(query.length == model.dim, "query dimension mismatch")
    val sub = model.subDim
    val t = new Array[Double](model.m * model.k)
    for (mi <- 0 until model.m; ki <- 0 until model.k) {
      var d = 0.0
      val off = (mi * model.k + ki) * sub
      for (j <- 0 until sub) {
        val diff = query(mi * sub + j).toDouble - model.codebooks(off + j)
        d += diff * diff
      }
      t(mi * model.k + ki) = d
    }
    t
  }

  /** Approximate top-k over PQ codes: one table-lookup sum per row
    * (TakeOrderedAndProject — per-partition top-k), optional exact
    * re-rank of the `rerank` best candidates against the true vectors.
    * Compose with IVF cell pruning by passing the probed subset.
    */
  def pqTopK(encoded: DataFrame, vecCol: String, idCol: String,
             model: PqModel, query: Seq[Float], topK: Int,
             rerank: Int = 0, codeCol: String = "_pq"): DataFrame = {
    val scored = encoded.withColumn("_adc",
      graft.functions.NativeExpressions.pqAdc(
        col(codeCol), model.m, model.k, adcTable(model, query)))
    if (rerank <= 0)
      scored.orderBy(col("_adc").asc_nulls_last, col(idCol).asc)
        .limit(topK)
        .select(col(idCol), col("_adc").as("score"))
    else {
      val cand = scored.orderBy(col("_adc").asc_nulls_last, col(idCol).asc)
        .limit(math.max(rerank, topK))
      bruteForceTopK(cand, vecCol, idCol, query, "l2", topK)
    }
  }

  /** IVF search: probe the `nprobe` nearest cells only. At scale the
    * assignments table is written partitioned by `cell`, so this prunes
    * to nprobe/nlist of the data before any distance math.
    * `exact = true` scores candidates on the scaled-int path — with
    * `nprobe = nlist` (exhaustive probing) the result then provably
    * equals exact brute-force top-k, which is what q88's oracle pins.
    */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, vecCol: String,
              idCol: String, query: Seq[Float], metric: String, k: Int,
              nprobe: Int, exact: Boolean = false): DataFrame = {
    val q = array(query.map(lit): _*)
    val probeCells = centroids
      .withColumn("_d", V.l2Sq(col("_centroid"), q))
      .orderBy(col("_d").asc).limit(nprobe)
      .select("cell")
    assigned.join(broadcast(probeCells), "cell")
      .withColumn("_score", score(metric, col(vecCol), q, exact))
      .orderBy(rankOrder(metric, col("_score")), col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("_score").as("score"))
  }

  /** Largest subspace count ≤ 8 that divides `dim` — the default PQ
    * split when the caller doesn't pick one.
    */
  def autoSubspaces(dim: Int): Int =
    (8 to 1 by -1).find(dim % _ == 0).get

  // ---- batched search for the IVF/PQ index families (the reference's
  // `vector_search` batches over EVERY index type,
  // vector_search_ops.py:84-101; r10 batched FLAT + both graph families,
  // these close the gap: one pass over the probed/encoded rows for N
  // queries instead of N passes) --------------------------------------

  /** Batched IVF search: the per-query probe sets are computed DRIVER-side
    * from the bounded centroid table and broadcast as one
    * (query_id, cell, query-vector) pairs table (|queries|·nprobe rows);
    * joining it to the cell-partitioned assignments scans the union of
    * all probed cells ONCE, scores each surviving (row, query) pair with
    * the codegen'd metric, and takes per-query top-k via window — the
    * exact per-query result [[ivfTopK]] would produce, at one pass.
    * Output: (query_id, idCol, rank, score).
    */
  def ivfBatchTopK(assigned: DataFrame, centroids: DataFrame, vecCol: String,
                   idCol: String, queries: Seq[(Long, Seq[Float])],
                   metric: String, k: Int, nprobe: Int,
                   exact: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    val spark = assigned.sparkSession
    import spark.implicits._
    val cents = centroids.collect() // nlist rows — bounded by construction
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Float](1)))
    val pairs = queries.flatMap { case (qid, qv) =>
      cents.map { case (cell, cv) =>
        var d = 0.0; var i = 0
        val n = math.min(qv.length, cv.length)
        while (i < n) { val x = qv(i) - cv(i); d += x * x; i += 1 }
        (d, cell)
      }.sortBy(p => (p._1, p._2)).take(nprobe)
        .map { case (_, cell) => (qid, cell, qv) }
    }
    val pairsDf = pairs.toDF("_qid", "cell", "_qvec")
    val scored = assigned.join(broadcast(pairsDf), "cell")
      .withColumn("_score", score(metric, col(vecCol), col("_qvec"), exact))
      // vectors shed at the scoring projection (see batchTopK)
      .select(col("_qid"), col(idCol), col("_score"))
    topKPerGroup(scored, "_qid", idCol, "_score",
        asc = metric == "l2", k)
      .select(col("_qid").as("query_id"), col(idCol),
        col("rank"), col("_score").as("score"))
  }

  /** Batched PQ search: one ADC table per query is computed driver-side
    * and flattened into a single `[query][m][k]` blob riding the plan as
    * a reference object; the encoded corpus is crossed with the broadcast
    * (dense-index, query_id, query-vector) batch and every (row, query)
    * pair scored by ONE codegen'd table-lookup loop
    * ([[graft.functions.NativeExpressions.pqAdcBatch]]). Per-query
    * candidate top-`max(rerank, k)` via window, then one exact re-rank
    * pass against the true vectors (when `rerank > 0`) — the same
    * rerank-candidate set [[pqTopK]] would pick per query.
    * Output: (query_id, idCol, rank, score).
    */
  def pqBatchTopK(encoded: DataFrame, vecCol: String, idCol: String,
                  model: PqModel, queries: Seq[(Long, Seq[Float])], k: Int,
                  rerank: Int = 0, codeCol: String = "_pq"): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    val spark = encoded.sparkSession
    import spark.implicits._
    val mm = model.m; val kk = model.k
    val tables = new Array[Double](queries.size * mm * kk)
    queries.iterator.zipWithIndex.foreach { case ((_, qv), qi) =>
      System.arraycopy(adcTable(model, qv), 0, tables, qi * mm * kk, mm * kk)
    }
    val qdf = queries.zipWithIndex
      .map { case ((qid, qv), qi) => (qi, qid, qv) }
      .toDF("_qidx", "_qid", "_qvec")
    // ADC needs only (_qidx → table offset): neither the query vector
    // nor the corpus vector/code rides past the scoring projection, so
    // the window's corpus×batch exchange moves 32-byte rows (r20 —
    // previously vec + code + _qvec multiplied it ~50×)
    val scored = encoded
      .crossJoin(broadcast(qdf.select(col("_qidx"), col("_qid"))))
      .withColumn("_adc", graft.functions.NativeExpressions.pqAdcBatch(
        col(codeCol), col("_qidx"), mm, kk, tables))
      .select(col("_qid"), col("_qidx"), col(idCol), col("_adc"))
    if (rerank <= 0)
      topKPerGroup(scored.select(col("_qid"), col(idCol), col("_adc")),
          "_qid", idCol, "_adc", asc = true, k)
        .select(col("_qid").as("query_id"), col(idCol),
          col("rank"), col("_adc").as("score"))
    else adcRerank(scored.select(col("_qid"), col(idCol), col("_adc")),
      encoded, qdf.select(col("_qid"), col("_qvec")), vecCol, idCol,
      k, rerank)
  }

  /** Exact re-rank tail shared by the ADC search paths: pick each
    * query's best `max(rerank, k)` ADC candidates (partial top-k
    * aggregate), recover true vectors for that BOUNDED set
    * (≤ |q|·rerank rows) via one column-pruned corpus pass + broadcast
    * join — never by dragging vec/code columns through the corpus-wide
    * ADC exchange — and rank the exact scores. The _qid→_qvec join is
    * sound because the candidate ranking was per _qid already. Inputs:
    * `scored` = (_qid, idCol, _adc), `qvecDf` = (_qid, _qvec).
    * Output: (query_id, idCol, rank, score).
    */
  private def adcRerank(scored: DataFrame, encoded: DataFrame,
                        qvecDf: DataFrame, vecCol: String, idCol: String,
                        k: Int, rerank: Int): DataFrame = {
    val cand = topKPerGroup(scored, "_qid", idCol, "_adc", asc = true,
        math.max(rerank, k))
      .join(broadcast(qvecDf), "_qid")
    val rescored = encoded.select(col(idCol), col(vecCol))
      .join(broadcast(cand), Seq(idCol))
      .withColumn("_exact",
        score("l2", col(vecCol), col("_qvec"), exact = false))
      .select(col("_qid"), col(idCol), col("_exact"))
    topKPerGroup(rescored, "_qid", idCol, "_exact", asc = true, k)
      .select(col("_qid").as("query_id"), col(idCol),
        col("rank"), col("_exact").as("score"))
  }

  /** Batched IVFPQ search: per-query cell pruning (driver-computed probe
    * pairs, as [[ivfBatchTopK]]) composed with the batched ADC scan —
    * each encoded row in a probed cell is scored only against the
    * queries probing that cell, then exact-re-ranked per query.
    * Output: (query_id, idCol, rank, score).
    */
  def ivfPqBatchTopK(encoded: DataFrame, centroids: DataFrame,
                     vecCol: String, idCol: String, model: PqModel,
                     queries: Seq[(Long, Seq[Float])], k: Int, nprobe: Int,
                     rerank: Int): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    val spark = encoded.sparkSession
    import spark.implicits._
    val mm = model.m; val kk = model.k
    val tables = new Array[Double](queries.size * mm * kk)
    queries.iterator.zipWithIndex.foreach { case ((_, qv), qi) =>
      System.arraycopy(adcTable(model, qv), 0, tables, qi * mm * kk, mm * kk)
    }
    val cents = centroids.collect()
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Float](1)))
    val pairs = queries.zipWithIndex.flatMap { case ((qid, qv), qi) =>
      cents.map { case (cell, cv) =>
        var d = 0.0; var i = 0
        val n = math.min(qv.length, cv.length)
        while (i < n) { val x = qv(i) - cv(i); d += x * x; i += 1 }
        (d, cell)
      }.sortBy(p => (p._1, p._2)).take(nprobe)
        .map { case (_, cell) => (qi, qid, cell, qv) }
    }
    val pairsDf = pairs.toDF("_qidx", "_qid", "cell", "_qvec")
    // probe pairs ride WITHOUT the query vector, and the scoring
    // projection sheds code/vec columns before the window's exchange
    // (see pqBatchTopK — same 100 TB shuffle-width economics)
    val scored = encoded
      .join(broadcast(pairsDf.select(col("_qidx"), col("_qid"),
        col("cell"))), "cell")
      .withColumn("_adc", graft.functions.NativeExpressions.pqAdcBatch(
        col("_pq"), col("_qidx"), mm, kk, tables))
      .select(col("_qid"), col(idCol), col("_adc"))
    val qvecDf = queries.map { case (qid, qv) => (qid, qv) }
      .toDF("_qid", "_qvec")
    adcRerank(scored, encoded, qvecDf, vecCol, idCol, k, rerank)
  }

  /** Residual IVFPQ build — the reference's actual faiss IVFPQ layout
    * (faiss_index.py:133-272): PQ codebooks trained and codes stored
    * over RESIDUALS `v − centroid(cell)`, not raw vectors. Raw-vector
    * PQ cannot separate neighbors inside a tight cluster — every member
    * quantizes to (nearly) the same code, so ADC ranks them arbitrarily;
    * `RecallSoak` measured recall@10 collapse to ~0.17 on 256-cluster
    * data. Residuals re-center each cell at the origin, spending the
    * codebook's full resolution on the within-cell geometry that
    * actually ranks near neighbors.
    *
    * Input: cell-assigned rows + centroids ([[ivfBuild]]). The centroid
    * table joins via `broadcast` (no plan-literal bloat — the
    * [[assignCells]] lesson) and the residual is a `zip_with` subtract,
    * build-time only. Output keeps the RAW `vecCol` for exact reranking
    * beside the residual `_pq` codes.
    */
  def ivfPqResidualBuild(assigned: DataFrame, centroids: DataFrame,
                         vecCol: String, idCol: String, m: Int, k: Int,
                         refineIters: Int = 1): (DataFrame, PqModel) = {
    val withRes = assigned
      .join(broadcast(centroids.select(col("cell"),
        col("_centroid").as("_cc"))), "cell")
      .withColumn("_res", zip_with(col(vecCol), col("_cc"),
        (a, b) => a - b))
      .drop("_cc")
    val model = pqTrain(withRes, "_res", idCol, m, k, refineIters)
    (pqEncode(withRes, "_res", model).drop("_res"), model)
  }

  /** Batched residual-IVFPQ search: one ADC table per (query, probed
    * cell) pair over the QUERY residual `q − centroid(cell)` — the
    * table block is `|queries|·nprobe·m·k` doubles, bounded by the
    * batch, broadcast once; each encoded row in a probed cell scores
    * against exactly that pair's table, then the best `rerank`
    * candidates per query re-rank on true vectors. Output:
    * (query_id, idCol, rank, score).
    */
  def ivfPqResidualBatchTopK(encoded: DataFrame, centroids: DataFrame,
                             vecCol: String, idCol: String, model: PqModel,
                             queries: Seq[(Long, Seq[Float])], k: Int,
                             nprobe: Int, rerank: Int): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    val spark = encoded.sparkSession
    import spark.implicits._
    val mm = model.m; val kk = model.k
    val cents = centroids.collect()
      .map(r => (r.getAs[Int]("cell"), r.getSeq[Float](1)))
    val pairs = queries.zipWithIndex.flatMap { case ((qid, qv), qi) =>
      cents.map { case (cell, cv) =>
        var d = 0.0; var i = 0
        val n = math.min(qv.length, cv.length)
        while (i < n) { val x = qv(i) - cv(i); d += x * x; i += 1 }
        (d, cell, cv)
      }.sortBy(p => (p._1, p._2)).take(nprobe)
        .map { case (_, cell, cv) =>
          val res = Seq.tabulate(qv.length)(j => qv(j) - cv(j))
          (qid, cell, qv, res)
        }
    }
    val tables = new Array[Double](pairs.size * mm * kk)
    pairs.iterator.zipWithIndex.foreach { case ((_, _, _, res), pi) =>
      System.arraycopy(adcTable(model, res), 0, tables, pi * mm * kk,
        mm * kk)
    }
    val pairsDf = pairs.zipWithIndex
      .map { case ((qid, cell, _, _), pi) => (pi, qid, cell) }
      .toDF("_pidx", "_qid", "cell")
    // probe pairs ride WITHOUT the query vector; code/vec shed before
    // the window exchange; true vectors return for the bounded
    // candidate set only (see pqBatchTopK — same shuffle-width rule)
    val scored = encoded.join(broadcast(pairsDf), "cell")
      .withColumn("_adc", graft.functions.NativeExpressions.pqAdcBatch(
        col("_pq"), col("_pidx"), mm, kk, tables))
      .select(col("_qid"), col(idCol), col("_adc"))
    val qvecDf = queries.map { case (qid, qv) => (qid, qv) }
      .toDF("_qid", "_qvec")
    adcRerank(scored, encoded, qvecDf, vecCol, idCol, k, rerank)
  }

  /** IVFPQ search (the reference's faiss IVFPQ index type + its
    * `refine_factor` search param): prune to the `nprobe` nearest cells,
    * scan only PQ codes there (ADC table lookups), exact-re-rank the
    * best `rerank` candidates against true vectors. Same partition-pruned
    * I/O as [[ivfTopK]] with the scan cost of [[pqTopK]].
    */
  def ivfPqTopK(encoded: DataFrame, centroids: DataFrame, vecCol: String,
                idCol: String, model: PqModel, query: Seq[Float], k: Int,
                nprobe: Int, rerank: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val probeCells = centroids
      .withColumn("_d", V.l2Sq(col("_centroid"), q))
      .orderBy(col("_d").asc).limit(nprobe)
      .select("cell")
    pqTopK(encoded.join(broadcast(probeCells), "cell"), vecCol, idCol,
      model, query, k, rerank)
  }
}
