package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, d: Int) = (0 until n).map { i =>
    (i.toLong, (0 until d).map(j =>
      math.sin(i * 31 + j).toFloat).toSeq)
  }.toDF("vec_id", "embedding")

  test("brute-force top-k: self is the best cosine match") {
    val df = vecs(50, 8)
    val q = df.filter($"vec_id" === 7L).head().getSeq[Float](1)
    val top = VectorSearch.bruteForceTopK(df, "embedding", "vec_id", q,
      "cosine", 3).as[(Long, Double)].collect()
    assert(top.head._1 == 7L)
    assert(math.abs(top.head._2 - 1.0) < 1e-9)
    assert(top.map(_._2).sliding(2).forall(p => p(0) >= p(1))) // descending
  }

  test("batch top-k matches per-query brute force") {
    val df = vecs(40, 8)
    val queries = df.filter($"vec_id" < 3L)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val batch = VectorSearch.batchTopK(df, "embedding", "vec_id",
      queries, "qid", "qvec", "l2", 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1)
    for (q <- 0L until 3L) {
      val single = VectorSearch.bruteForceTopK(df, "embedding", "vec_id",
        df.filter($"vec_id" === q).head().getSeq[Float](1), "l2", 5)
        .as[(Long, Double)].collect().map(_._1).toSeq
      assert(batch(q).sortBy(_._3).map(_._2).toSeq == single)
    }
  }

  test("l2 top-k ranks null scores (dimension-mismatched vectors) last") {
    val df = vecs(20, 8)
    // corrupt one row to a different dimensionality → null score
    val corrupt = df.withColumn("embedding",
      when($"vec_id" === 7L, slice($"embedding", 1, 3)).otherwise($"embedding"))
    val q = df.filter($"vec_id" === 0L).head().getSeq[Float](1)
    val top = VectorSearch.bruteForceTopK(corrupt, "embedding", "vec_id",
      q, "l2", 5).collect()
    assert(!top.map(_.getLong(0)).contains(7L),
      "null-scored row must not displace real neighbors")
    assert(top.forall(!_.isNullAt(1)))
  }

  test("ivfBuild sample plan: per-partition top-k, no single-partition exchange") {
    val df = vecs(100, 8).repartition(4)
    val plan = VectorSearch.ivfSample(df, "embedding", "vec_id", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sample should be a TakeOrderedAndProject, got:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"sample must not funnel the corpus through one partition:\n$plan")
    // null vectors are excluded from the sample (they would NPE assignCells)
    val withNull = df.withColumn("embedding",
      when($"vec_id" === 1L, lit(null)).otherwise($"embedding"))
    val (_, centroids) = VectorSearch.ivfBuild(withNull, "embedding", "vec_id", 8)
    assert(centroids.count() == 8)
  }

  test("HNSW: high recall at wide beam, parquet round-trip, deterministic") {
    val df = vecs(500, 16)
    val idx = Hnsw.build(df, "embedding", "vec_id", numPartitions = 4)
    val qids = 0L until 5L
    def recall(index: org.apache.spark.sql.DataFrame, ef: Int): Double = {
      val rs = qids.map { qid =>
        val q = df.filter($"vec_id" === qid).head().getSeq[Float](1)
        val exact = VectorSearch.bruteForceTopK(df, "embedding", "vec_id",
          q, "l2", 10).select("vec_id").as[Long].collect().toSet
        val got = Hnsw.topK(index, q, 10, ef = ef)
          .select("ext_id").as[Long].collect().toSet
        (exact intersect got).size / 10.0
      }
      rs.sum / rs.size
    }
    assert(recall(idx, ef = 200) >= 0.9, "wide beam ≈ exhaustive per shard")
    // narrower beam trades recall for probe cost but stays useful
    assert(recall(idx, ef = 32) >= 0.5)
    // persisted graph serves identically
    val dir = tmpDir("hnsw") + "/idx"
    idx.write.partitionBy("part").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val q0 = df.filter($"vec_id" === 0L).head().getSeq[Float](1)
    assert(Hnsw.topK(reloaded, q0, 10, ef = 200)
      .select("ext_id").as[Long].collect().toSeq ==
      Hnsw.topK(idx, q0, 10, ef = 200)
        .select("ext_id").as[Long].collect().toSeq)
    // the nearest neighbor of a corpus point is itself
    assert(Hnsw.topK(idx, q0, 1, ef = 64).head().getLong(0) == 0L)
  }

  test("Vamana/DiskANN: recall on both walk modes, degree cap, round-trip") {
    val df = vecs(500, 16)
    val idx = Vamana.build(df, "embedding", "vec_id", numPartitions = 4,
      r = 24, alpha = 1.2, buildBeam = 64)
    val qids = 0L until 5L
    def recall(index: org.apache.spark.sql.DataFrame, beam: Int,
               rerank: Int): Double = {
      val rs = qids.map { qid =>
        val q = df.filter($"vec_id" === qid).head().getSeq[Float](1)
        val exact = VectorSearch.bruteForceTopK(df, "embedding", "vec_id",
          q, "l2", 10).select("vec_id").as[Long].collect().toSet
        val got = Vamana.topK(index, q, 10, beam = beam, rerank = rerank)
          .select("ext_id").as[Long].collect().toSet
        (exact intersect got).size / 10.0
      }
      rs.sum / rs.size
    }
    // exact-distance walk (rerank=0): wide beam ≈ exhaustive per shard
    assert(recall(idx, beam = 200, rerank = 0) >= 0.9)
    // PQ/ADC walk + exact re-rank — the on-disk cost model — holds recall
    assert(recall(idx, beam = 200, rerank = 200) >= 0.9)
    assert(recall(idx, beam = 32, rerank = 64) >= 0.5)
    // α-robust prune respects the degree budget R
    val maxDeg = idx.filter($"node" >= 0)
      .select(size($"adj")).as[Int].collect().max
    assert(maxDeg <= 24, s"degree $maxDeg exceeds R=24")
    // persisted graph serves identically (partitionBy round-trip)
    val dir = tmpDir("vamana") + "/idx"
    idx.write.partitionBy("part").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val q0 = df.filter($"vec_id" === 0L).head().getSeq[Float](1)
    assert(Vamana.topK(reloaded, q0, 10, beam = 200)
      .select("ext_id").as[Long].collect().toSeq ==
      Vamana.topK(idx, q0, 10, beam = 200)
        .select("ext_id").as[Long].collect().toSeq)
    // the nearest neighbor of a corpus point is itself, via the PQ walk
    assert(Vamana.topK(idx, q0, 1, beam = 64, rerank = 32)
      .head().getLong(0) == 0L)
  }

  test("graph batch search: one index pass per batch matches per-query topK") {
    val df = vecs(400, 16)
    val queries = (0L until 4L).map(qid =>
      qid -> df.filter($"vec_id" === qid).head().getSeq[Float](1))
    val hidx = Hnsw.build(df, "embedding", "vec_id", numPartitions = 4)
    // colocated=true: build output already has one part per task — the
    // batch walk must run with NO part shuffle and still match
    val hbatch = Hnsw.batchTopK(hidx, queries, k = 10, ef = 200,
      colocated = true)
    queries.foreach { case (qid, q) =>
      val single = Hnsw.topK(hidx, q, 10, ef = 200)
        .select("ext_id").as[Long].collect().toSeq
      val batch = hbatch.filter($"query_id" === qid).orderBy("rank")
        .select("ext_id").as[Long].collect().toSeq
      assert(batch == single, s"HNSW qid=$qid")
    }
    val vidx = Vamana.build(df, "embedding", "vec_id", numPartitions = 4,
      r = 24, alpha = 1.2, buildBeam = 64)
    // PQ/ADC walk: one ADC table per query, one graph reassembly per task
    val vbatch = Vamana.batchTopK(vidx, queries, k = 10, beam = 200,
      rerank = 200, colocated = true)
    queries.foreach { case (qid, q) =>
      val single = Vamana.topK(vidx, q, 10, beam = 200, rerank = 200)
        .select("ext_id").as[Long].collect().toSeq
      val batch = vbatch.filter($"query_id" === qid).orderBy("rank")
        .select("ext_id").as[Long].collect().toSeq
      assert(batch == single, s"Vamana qid=$qid")
    }
  }

  test("persisted graph search is exchange-free and matches the shuffled path") {
    val df = vecs(400, 16)
    val q0 = df.filter($"vec_id" === 0L).head().getSeq[Float](1)
    val hdir = tmpDir("hnswnx") + "/idx"
    Hnsw.build(df, "embedding", "vec_id", numPartitions = 4)
      .write.partitionBy("part").parquet(hdir)
    val fast = Hnsw.topKPersisted(spark, hdir, q0, 10, ef = 200)
    val slow = Hnsw.topK(spark.read.parquet(hdir), q0, 10, ef = 200)
    assert(fast.select("ext_id").as[Long].collect().toSeq ==
      slow.select("ext_id").as[Long].collect().toSeq)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"persisted-layout search must not shuffle the index:\n$plan")
    val vdir = tmpDir("vamananx") + "/idx"
    Vamana.build(df, "embedding", "vec_id", numPartitions = 4,
      r = 24, alpha = 1.2, buildBeam = 64)
      .write.partitionBy("part").parquet(vdir)
    val vfast = Vamana.topKPersisted(spark, vdir, q0, 10,
      beam = 200, rerank = 200)
    val vslow = Vamana.topK(spark.read.parquet(vdir), q0, 10,
      beam = 200, rerank = 200)
    assert(vfast.select("ext_id").as[Long].collect().toSeq ==
      vslow.select("ext_id").as[Long].collect().toSeq)
    val vplan = vfast.queryExecution.executedPlan.toString
    assert(!vplan.contains("Exchange"),
      s"persisted-layout search must not shuffle the index:\n$vplan")
  }

  test("PQ with k >= corpus size is lossless: ADC top-k == brute force") {
    val df = vecs(40, 16)
    // every vector contributes its own subvectors to each codebook →
    // encoding is exact → ADC == true squared L2
    val model = VectorSearch.pqTrain(df, "embedding", "vec_id", m = 4, k = 40)
    val encoded = VectorSearch.pqEncode(df, "embedding", model)
    val q = df.filter($"vec_id" === 5L).head().getSeq[Float](1)
    val pq = VectorSearch.pqTopK(encoded, "embedding", "vec_id", model, q, 10)
      .select("vec_id").as[Long].collect().toSeq
    val exact = VectorSearch.bruteForceTopK(df, "embedding", "vec_id",
      q, "l2", 10).select("vec_id").as[Long].collect().toSeq
    assert(pq == exact)
  }

  test("lossy PQ: ADC recall reasonable, exact re-rank recovers the rest") {
    val df = vecs(400, 16)
    val model = VectorSearch.pqTrain(df, "embedding", "vec_id", m = 4, k = 32)
    val encoded = VectorSearch.pqEncode(df, "embedding", model)
    val recalls = (0L until 5L).map { qid =>
      val q = df.filter($"vec_id" === qid).head().getSeq[Float](1)
      val exact = VectorSearch.bruteForceTopK(df, "embedding", "vec_id",
        q, "l2", 10).select("vec_id").as[Long].collect().toSet
      val adc = VectorSearch.pqTopK(encoded, "embedding", "vec_id",
        model, q, 10).select("vec_id").as[Long].collect().toSet
      val rr = VectorSearch.pqTopK(encoded, "embedding", "vec_id",
        model, q, 10, rerank = 100).select("vec_id").as[Long].collect().toSet
      ((exact intersect adc).size / 10.0, (exact intersect rr).size / 10.0)
    }
    val (adcMean, rrMean) =
      (recalls.map(_._1).sum / recalls.size, recalls.map(_._2).sum / recalls.size)
    assert(adcMean >= 0.2, s"ADC recall@10 $adcMean")
    assert(rrMean >= 0.6, s"reranked recall@10 $rrMean")
    assert(rrMean >= adcMean) // re-rank can only help
  }

  test("ivfRefine: Lloyd passes never increase quantization error, keep cell ids") {
    val df = vecs(300, 8)
    val (_, seed) =
      VectorSearch.ivfBuild(df, "embedding", "vec_id", 8, refineIters = 0)
    val refined = VectorSearch.ivfRefine(df, "embedding", seed, iters = 2)
    assert(refined.select("cell").as[Int].collect().sorted.toSeq ==
      (0 until 8))
    def sse(cents: org.apache.spark.sql.DataFrame): Double =
      VectorSearch.assignCells(df, "embedding", cents)
        .join(cents, "cell")
        .select(sum(graft.functions.VectorFunctions
          .l2Sq($"embedding", $"_centroid")).as("s"))
        .head().getDouble(0)
    assert(sse(refined) <= sse(seed) + 1e-6) // the k-means objective
    // zero iterations is the identity
    assert(VectorSearch.ivfRefine(df, "embedding", seed, 0)
      .collect().toSet == seed.collect().toSet)
  }

  test("pqRefine: reconstruction error is non-increasing over Lloyd passes") {
    val df = vecs(300, 16)
    val seed = VectorSearch.pqTrain(df, "embedding", "vec_id",
      m = 4, k = 8, refineIters = 0)
    val refined = VectorSearch.pqRefine(df, "embedding", seed, iters = 2)
    def sse(model: VectorSearch.PqModel): Double =
      VectorSearch.pqEncode(df, "embedding", model)
        .select("embedding", "_pq").collect().map { r =>
          val v = r.getSeq[Float](0)
          val code = r.getSeq[Int](1)
          (0 until model.m).map { mi =>
            val off = (mi * model.k + code(mi)) * model.subDim
            (0 until model.subDim).map { j =>
              val d = v(mi * model.subDim + j) - model.codebooks(off + j)
              d.toDouble * d
            }.sum
          }.sum
        }.sum
    assert(sse(refined) <= sse(seed) + 1e-6)
    assert(VectorSearch.pqRefine(df, "embedding", seed, 0) == seed)
  }

  test("IVF probe search finds the exact neighbor when probing enough cells") {
    val df = vecs(100, 8)
    val (assigned, centroids) = VectorSearch.ivfBuild(df, "embedding", "vec_id", 8)
    assert(assigned.select("cell").distinct().count() <= 8)
    val q = df.filter($"vec_id" === 42L).head().getSeq[Float](1)
    val hit = VectorSearch.ivfTopK(assigned, centroids, "embedding", "vec_id",
      q, "l2", 1, nprobe = 8).head()
    assert(hit.getLong(0) == 42L) // nprobe = nlist ⇒ exhaustive ⇒ exact
  }

  test("IVF recall@10 vs brute force (reference test_vector_search_recall)") {
    val df = vecs(400, 16)
    val (assigned, centroids) =
      VectorSearch.ivfBuild(df, "embedding", "vec_id", nlist = 16)
    val queries = (0L until 10L)
    val recalls = queries.map { qid =>
      val q = df.filter($"vec_id" === qid).head().getSeq[Float](1)
      val exact = VectorSearch.bruteForceTopK(df, "embedding", "vec_id",
        q, "l2", 10).select("vec_id").as[Long].collect().toSet
      val approx = VectorSearch.ivfTopK(assigned, centroids, "embedding",
        "vec_id", q, "l2", 10, nprobe = 4).select("vec_id")
        .as[Long].collect().toSet
      (exact intersect approx).size.toDouble / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@10 $mean below 0.6 (nprobe=4/16)")
    // probing every cell is exhaustive → perfect recall
    val q0 = df.filter($"vec_id" === 0L).head().getSeq[Float](1)
    val all = VectorSearch.ivfTopK(assigned, centroids, "embedding",
      "vec_id", q0, "l2", 10, nprobe = 16).select("vec_id")
      .as[Long].collect().toSet
    val exact0 = VectorSearch.bruteForceTopK(df, "embedding", "vec_id",
      q0, "l2", 10).select("vec_id").as[Long].collect().toSet
    assert(all == exact0)
  }

  test("columnStatistics: counts, nulls, numeric moments") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "a", 2.0), Row(2L, null, 4.0), Row(3L, "c", null)),
      StructType(Seq(StructField("id", LongType), StructField("s", StringType),
        StructField("x", DoubleType))))
    val st = Statistics.columnStatistics(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(st("id").getLong(2) == 3 && st("id").getLong(3) == 0)
    assert(st("s").getLong(3) == 1) // one null
    assert(st("x").getDouble(5) == 2.0 && st("x").getDouble(6) == 4.0)
    assert(st("x").getDouble(7) == 3.0) // mean over non-null
    assert(st("s").isNullAt(5)) // no numeric stats for strings
  }

  test("approximate quantiles bracket the exact ones") {
    val df = (1 to 1001).toDF("v")
    val q = Statistics.quantiles(df, "v", Seq(0.25, 0.5, 0.75))
    assert(math.abs(q(0) - 251) <= 2 && math.abs(q(1) - 501) <= 2 &&
      math.abs(q(2) - 751) <= 2)
  }

  test("histogram buckets cover the range") {
    val df = (1 to 100).toDF("v")
    val h = Statistics.histogram(df, "v", 0, 100, 10)
      .as[(Long, Long, Double, Double)].collect()
    assert(h.map(_._2).sum == 100)
    assert(h.length == 10)
  }

  test("compute pipeline: expression + row stages compose, eval into table") {
    import graft.format.GraftDataset
    val clean = Compute.compute("clean")(df =>
      df.withColumn("t", lower(trim($"t"))))
    val explodeWords = Compute.rowStage(StructType(Seq(
      StructField("t", StringType), StructField("word", StringType)))) { r =>
      r.getString(0).split(" ").map(w => Row(r.getString(0), w))
    }
    val pipe = clean.andThen(Compute.compute("words")(explodeWords))
    val out = pipe.eval(Seq("  Hello World ").toDF("t"))
    assert(out.select("word").as[String].collect().toSeq == Seq("hello", "world"))
    val ds = GraftDataset.create(spark, tmpDir("compute"),
      StructType(Seq(StructField("t", StringType), StructField("word", StringType))))
    pipe.eval(Seq("A B").toDF("t").withColumn("t", lower($"t")), ds, "computed")
    assert(ds.toDF.count() == 2)
  }

  test("rowStage ignoreErrors drops throwing rows; default stays fail-fast") {
    val schema = StructType(Seq(StructField("n", IntegerType)))
    def f(r: Row): Seq[Row] = {
      if (r.getInt(0) % 3 == 0) throw new IllegalStateException("corrupt")
      Seq(Row(r.getInt(0) * 10))
    }
    val in = (1 to 9).toDF("n")
    val kept = Compute.rowStage(schema, ignoreErrors = true)(f)(in)
      .as[Int].collect().sorted.toSeq
    assert(kept == Seq(10, 20, 40, 50, 70, 80)) // 3,6,9 dropped
    intercept[org.apache.spark.SparkException] {
      Compute.rowStage(schema)(f)(in).collect()
    }
  }

  test("multimodal: real PNG/BMP decode via the in-JVM codec") {
    // 4x2 grayscale gradient: pixel (x,y) = 32*(y*4+x) → known exact mean
    def png(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        4, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 2; x <- 0 until 4)
        img.getRaster.setSample(x, y, 0, 32 * (y * 4 + x))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val expectedMean = (0 until 8).map(_ * 32).sum / 8.0 // 112.0
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("img"))
    val rows = java.util.List.of(
      Row(1L, png("png"), null, "png"),
      Row(2L, png("bmp"), null, "bmp"),
      // not an image → stub fallback keeps the pipeline total
      Row(3L, Array[Byte](1, 2, 3, 4), Seq(9, 9, 1), "raw"))
    val df = spark.createDataFrame(rows, schema)
    val dec = Multimodal.decodeImages(df, "img").collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(dec(id).getAs[Int]("height") == 2)
      assert(dec(id).getAs[Int]("width") == 4)
      assert(dec(id).getAs[Int]("channels") == 1)
      assert(dec(id).getAs[Double]("mean_intensity") == expectedMean)
    }
    assert(dec(3L).getAs[Int]("height") == 9) // stub honored declared shape
  }

  test("multimodal: real WAV/PCM decode via javax.sound, stub for others") {
    // 16-bit mono 8kHz, 4 known samples → exact mean |amplitude|
    val samples = Array[Short](16384, -16384, 32767, 0)
    def wav(): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      for ((s, i) <- samples.zipWithIndex) {
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val expMean = samples.map(s => math.abs(s.toInt) / 32768.0).sum / 4
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("aud"))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1L, wav(), null, "wav"),
      Row(2L, Array[Byte](1, 2, 3, 4), null, "mp3")), schema) // → stub
    val dec = Multimodal.decodeAudio(df, "aud").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(dec(1L).getAs[Int]("sample_rate") == 8000)
    assert(dec(1L).getAs[Int]("channels") == 1)
    assert(dec(1L).getAs[Long]("num_frames") == 4L)
    assert(math.abs(dec(1L).getAs[Double]("duration_sec") - 4.0 / 8000) < 1e-9)
    assert(math.abs(dec(1L).getAs[Double]("mean_amplitude") - expMean) < 1e-9)
    // non-audio payload: deterministic stub keeps the pipeline total
    assert(dec(2L).getAs[Int]("sample_rate") == 16000)
    assert(dec(2L).getAs[Long]("num_frames") == 4L)
  }

  test("multimodal: mp3/flac header metadata decode, ID3 skip, truncated → stub") {
    // synthetic MPEG1 Layer III stream: 44.1 kHz, 128 kbps, stereo, no
    // padding → frame length floor(144 * 128000 / 44100) = 417 bytes,
    // 1152 samples/frame. Header ff fb 90 00; payload zeros.
    def mp3(nFrames: Int, id3: Boolean): Array[Byte] = {
      val frame = new Array[Byte](417)
      frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte
      frame(2) = 0x90.toByte; frame(3) = 0x00.toByte
      val id3Tag = if (!id3) Array.emptyByteArray else {
        // "ID3" v2.3, no flags, syncsafe size 130 = 0x01 0x02 → 130 bytes
        val t = new Array[Byte](10 + 130)
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 3
        t(8) = 0x01; t(9) = 0x02
        t
      }
      id3Tag ++ Array.fill(nFrames)(frame).flatten
    }
    val direct = Multimodal.decodeMp3(mp3(40, id3 = false))
    val tagged = Multimodal.decodeMp3(mp3(40, id3 = true))
    for (d <- Seq(direct, tagged)) {
      assert(d.isDefined)
      val (rate, ch, samples, dur, _) = d.get
      assert(rate == 44100 && ch == 2)
      assert(samples == 40L * 1152)
      assert(math.abs(dur - 40.0 * 1152 / 44100) < 1e-9)
    }
    // a single frame (or random bytes) must NOT parse — two-frame guard
    assert(Multimodal.decodeMp3(mp3(1, id3 = false)).isEmpty)
    assert(Multimodal.decodeMp3(Array.fill(2000)(0x55.toByte)).isEmpty)
    // FLAC STREAMINFO: 44.1 kHz stereo, 88200 total samples (2.0 s)
    val flac: Array[Byte] = {
      val si = new Array[Byte](34)
      si(10) = 0x0a; si(11) = 0xc4.toByte; si(12) = 0x42 // rate 44100, 2ch
      si(13) = 0xf0.toByte                               // bps 16, smp hi 0
      si(15) = 0x01; si(16) = 0x58; si(17) = 0x88.toByte // samples 88200
      Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++ si
    }
    val fd = Multimodal.decodeFlac(flac)
    assert(fd.contains((44100, 2, 88200L, 2.0, null)), s"got $fd")
    // through the pipeline: mp3 rows get real metadata, flac rows stub
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("aud"))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1L, mp3(40, id3 = true), null, "mp3"),
      Row(2L, Array[Byte](102, 76, 97, 67, 9), null, "flac")), schema)
    val dec = Multimodal.decodeAudio(df, "aud").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(dec(1L).getAs[Int]("sample_rate") == 44100)
    assert(dec(1L).getAs[Int]("channels") == 2)
    assert(dec(1L).getAs[Long]("num_frames") == 40L * 1152)
    // metadata-only decode: amplitude is null ("not computed"), NOT 0.0
    assert(dec(1L).isNullAt(dec(1L).fieldIndex("mean_amplitude")))
    assert(dec(2L).getAs[Int]("sample_rate") == 16000) // stub
  }

  test("FLAC full-sample decode: amplitude matches WAV on identical PCM") {
    // In-test FLAC ENCODER (public format spec / RFC 9639): the
    // container has no JVM encoder, so the spec writes its own frames —
    // verbatim, constant, fixed-order-2 + Rice residuals, left/side
    // stereo, wasted bits — and the decoder under test must fold them
    // to the same mean amplitude the WAV path computes on the same PCM.
    final class BW {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      private var cur = 0; private var nb = 0
      def bit(b: Int): Unit = {
        cur = (cur << 1) | (b & 1); nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
      }
      def bits(v: Long, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
      }
      def align(): Unit = while (nb != 0) bit(0)
      def out: Array[Byte] = { align(); buf.toArray }
    }
    def streamInfo(rate: Int, ch: Int, bps: Int, total: Long): BW = {
      val w = new BW
      w.bits('f', 8); w.bits('L', 8); w.bits('a', 8); w.bits('C', 8)
      w.bits(1, 1); w.bits(0, 7); w.bits(34, 24) // last block, STREAMINFO
      w.bits(16, 16); w.bits(65535, 16)          // min/max block size
      w.bits(0, 24); w.bits(0, 24)               // min/max frame size
      w.bits(rate, 20); w.bits(ch - 1, 3); w.bits(bps - 1, 5)
      w.bits(total, 36)
      (0 until 16).foreach(_ => w.bits(0, 8))    // md5 (unchecked)
      w
    }
    def frameHeader(w: BW, n: Int, chanAssign: Int,
                    sizeCode: Int = 0): Unit = {
      w.bits(0x3ffe, 14); w.bits(0, 2)     // sync, reserved, fixed-size
      w.bits(7, 4); w.bits(0, 4)           // bs: 16-bit follows; rate: SI
      w.bits(chanAssign, 4); w.bits(sizeCode, 3); w.bits(0, 1)
      w.bits(0, 8)                          // frame number 0 (1-byte UTF8)
      w.bits(n - 1, 16)                     // block size − 1
      w.bits(0, 8)                          // header CRC (decoder skips)
    }
    def s16(w: BW, v: Int, bits: Int = 16): Unit =
      w.bits(v.toLong & ((1L << bits) - 1), bits)
    def subVerbatim(w: BW, xs: Seq[Int], bps: Int = 16,
                    wasted: Int = 0): Unit = {
      w.bit(0); w.bits(1, 6)
      if (wasted == 0) w.bit(0)
      else { w.bit(1); (0 until wasted - 1).foreach(_ => w.bit(0)); w.bit(1) }
      xs.foreach(v => s16(w, v >> wasted, bps - wasted))
    }
    def subConstant(w: BW, v: Int, bps: Int = 16): Unit = {
      w.bit(0); w.bits(0, 6); w.bit(0); s16(w, v, bps)
    }
    def rice4(w: BW, res: Seq[Long], rice: Int): Unit = {
      w.bits(0, 2); w.bits(0, 4) // Rice 4-bit params, one partition
      w.bits(rice, 4)
      res.foreach { r =>
        val u = (r << 1) ^ (r >> 63) // zigzag
        val q = (u >>> rice).toInt
        (0 until q).foreach(_ => w.bit(0)); w.bit(1)
        w.bits(u & ((1L << rice) - 1), rice)
      }
    }
    def subFixed2(w: BW, xs: Seq[Int], rice: Int): Unit = {
      w.bit(0); w.bits(10, 6); w.bit(0) // FIXED order 2
      s16(w, xs(0)); s16(w, xs(1))      // warmup
      rice4(w, xs.indices.drop(2)
        .map(i => xs(i).toLong - 2 * xs(i - 1) + xs(i - 2)), rice)
    }
    // order-2 LPC, coefs (c1,c2) at precision/shift: the residual is
    // x[i] − ((c1·x[i−1] + c2·x[i−2]) >> shift), exactly the decoder's
    // prediction arithmetic — real-world FLAC is mostly LPC frames
    def subLpc2(w: BW, xs: Seq[Int], c1: Long, c2: Long, precision: Int,
                shift: Int, rice: Int): Unit = {
      w.bit(0); w.bits(32 + 1, 6); w.bit(0) // LPC order 2 (0b100001)
      s16(w, xs(0)); s16(w, xs(1))          // warmup
      w.bits(precision - 1, 4); w.bits(shift, 5)
      w.bits(c1 & ((1L << precision) - 1), precision)
      w.bits(c2 & ((1L << precision) - 1), precision)
      rice4(w, xs.indices.drop(2).map { i =>
        val pred = (c1 * xs(i - 1) + c2 * xs(i - 2)) >> shift
        xs(i).toLong - pred
      }, rice)
    }
    def endFrame(w: BW): Unit = { w.align(); w.bits(0, 16) }

    val n = 600
    val left = (0 until n).map(i => (math.sin(i * 0.07) * 12000).toInt)
    val right = (0 until n).map(i => (math.sin(i * 0.05) * 8000).toInt)

    // (a) mono: verbatim + fixed+rice + constant + wasted-bit + LPC frames
    val monoAll = left ++ left ++ Seq.fill(200)(-4242) ++
      left.map(_ & ~1) ++ left
    val mono = {
      val w = streamInfo(16000, 1, 16, monoAll.length)
      frameHeader(w, n, 0); subVerbatim(w, left); endFrame(w)
      frameHeader(w, n, 0); subFixed2(w, left, rice = 10); endFrame(w)
      frameHeader(w, 200, 0); subConstant(w, -4242); endFrame(w)
      frameHeader(w, n, 0)
      subVerbatim(w, left.map(_ & ~1), wasted = 1); endFrame(w)
      // ≈ 2cos(0.07)·x[i−1] − x[i−2]: the sine's own recurrence, so the
      // residuals are small and the Rice path is exercised realistically
      frameHeader(w, n, 0)
      subLpc2(w, left, c1 = (2 * math.cos(0.07) * 1024).round, c2 = -1024,
        precision = 14, shift = 10, rice = 6)
      endFrame(w)
      w.out
    }
    // the WAV truth for the same PCM, via the already-proven decodeWav
    def wav(xs: Seq[Int], channels: Int): Array[Byte] = {
      val data = new Array[Byte](xs.length * 2)
      xs.indices.foreach { i =>
        data(2 * i) = (xs(i) & 0xff).toByte
        data(2 * i + 1) = ((xs(i) >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, channels,
        true, false)
      val out = new java.io.ByteArrayOutputStream
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt,
          xs.length / channels),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val fm = Multimodal.decodeFlac(mono).get
    val wm = Multimodal.decodeWav(wav(monoAll, 1)).get
    assert(fm._1 == 16000 && fm._2 == 1 && fm._3 == monoAll.length)
    assert(fm._5 != null, "full decode must yield a computed amplitude")
    assert(math.abs(fm._5 - wm._5) < 1e-12,
      s"flac amplitude ${fm._5} != wav ${wm._5}")

    // (b) stereo left/side decorrelation: side = left − right, 17 bits
    val stereo = {
      val w = streamInfo(16000, 2, 16, n)
      frameHeader(w, n, 8) // chanAssign 8 = left/side
      subVerbatim(w, left)
      subVerbatim(w, left.zip(right).map { case (l, r) => l - r }, bps = 17)
      endFrame(w)
      w.out
    }
    val interleaved = (0 until n).flatMap(i => Seq(left(i), right(i)))
    val fs = Multimodal.decodeFlac(stereo).get
    val ws = Multimodal.decodeWav(wav(interleaved, 2)).get
    assert(fs._2 == 2 && fs._3 == n)
    assert(math.abs(fs._5 - ws._5) < 1e-12,
      s"stereo flac ${fs._5} != wav ${ws._5}")

    // (c) a truncated frame degrades to metadata-only (null amplitude),
    // never a wrong number
    val cut = Multimodal.decodeFlac(mono.dropRight(mono.length / 3)).get
    assert(cut._5 == null)

    // (d) per-frame sample-size override (sizeCode 1 = 8 bps inside a
    // 16-bit stream): amplitudes must normalize by the bps the frame's
    // samples were DECODED at, not STREAMINFO's — the stream default
    // would halve them (÷32768 instead of ÷128)
    val xs8 = (0 until n).map(i => (math.sin(i * 0.11) * 100).toInt)
    val over = {
      val w = streamInfo(16000, 1, 16, n)
      frameHeader(w, n, 0, sizeCode = 1)
      subVerbatim(w, xs8, bps = 8); endFrame(w)
      w.out
    }
    val fo = Multimodal.decodeFlac(over).get
    val expect8 = xs8.map(x => math.min(math.abs(x) / 128.0, 1.0)).sum / n
    assert(math.abs(fo._5 - expect8) < 1e-12,
      s"frame-bps override: ${fo._5} != $expect8")
  }

  test("image helpers: grayscale luma, real resize, EXIF extraction") {
    // 2x2 pure-red PNG → grayscale luma floor(299*255/1000) = 76
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) img.setRGB(x, y, 0xff0000)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("img"))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, out.toByteArray, null, "png")), schema)
    val gray = Multimodal.convertImages(df, "img", "L")
    val g = Multimodal.decodeImages(gray, "img").head()
    assert(g.getAs[Int]("channels") == 1)
    assert(g.getAs[Double]("mean_intensity") == 76.0)
    val resized = Multimodal.decodeImages(
      Multimodal.resizeImages(df, "img", 4, 6), "img").head()
    assert(resized.getAs[Int]("height") == 4 &&
      resized.getAs[Int]("width") == 6)
    // EXIF: synthetic JPEG APP1 segment, little-endian TIFF, 3 IFD entries
    val bb = java.nio.ByteBuffer.allocate(20 + 2 + 3 * 12 + 4 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Array[Byte](0x49, 0x49)); bb.putShort(42); bb.putInt(8) // TIFF hdr
    bb.putShort(3) // entry count
    bb.putShort(0x0112.toShort); bb.putShort(3); bb.putInt(1); bb.putInt(6)
    bb.putShort(0x0128.toShort); bb.putShort(3); bb.putInt(1); bb.putInt(2)
    // XResolution RATIONAL at offset 50 (from TIFF start): 72/1
    bb.putShort(0x011a.toShort); bb.putShort(5); bb.putInt(1); bb.putInt(50)
    bb.putInt(0) // next-IFD pointer
    bb.putInt(72); bb.putInt(1)
    val tiff = bb.array()
    val app1 = Array[Byte]("Exif".getBytes("US-ASCII"): _*) ++
      Array[Byte](0, 0) ++ tiff
    val seg = java.nio.ByteBuffer.allocate(4)
      .putShort(0xffe1.toShort).putShort((app1.length + 2).toShort).array()
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++ seg ++ app1 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val tags = Exif.exifTags(jpeg)
    assert(tags("Orientation") == "Rotate 90 CW")
    assert(tags("ResolutionUnit") == "Inches")
    assert(tags("XResolution") == "72")
    // distributed form appends the map column; garbage bytes → empty map
    val withExif = Exif.exifImages(spark.createDataFrame(
      java.util.List.of(Row(1L, jpeg, null, "jpg"),
        Row(2L, Array[Byte](1, 2, 3), null, "jpg")), schema), "img")
      .collect().map(r => r.getLong(0) ->
        r.getAs[Map[String, String]]("exif")).toMap
    assert(withExif(1L)("Orientation") == "Rotate 90 CW")
    assert(withExif(2L).isEmpty)
  }

  test("tiled ingest: bounded tile rows round-trip to identical payloads") {
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("img"))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1L, payload, null, "raw"),
      Row(2L, Array[Byte](7), null, "raw"),
      Row(3L, null, null, "raw")), schema)
    val tiled = Multimodal.tile(df, "img", tileBytes = 3)
    // 10 bytes / 3 → 4 tiles, each ≤ 3 bytes; single-tile and null rows
    assert(tiled.filter($"id" === 1L).count() == 4)
    assert(tiled.filter($"id" === 2L).count() == 1)
    assert(tiled.filter($"id" === 3L).count() == 1)
    assert(tiled.filter(length($"tile_bytes") > 3).count() == 0)
    val back = Multimodal.assemble(tiled, "img", Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("img_bytes"))
      .toMap
    assert(back(1L).toSeq == payload.toSeq)
    assert(back(2L).toSeq == Seq(7.toByte))
    assert(back(3L) == null)
    // metadata columns survive the round trip
    assert(Multimodal.assemble(tiled, "img", Seq("id")).columns.toSet ==
      Set("id", "img_shape", "img_format", "img_bytes"))
  }

  test("multimodal: decode stub plumbing, resize plan, frame sampling") {
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("img"))
    val rows = java.util.List.of(
      Row(1L, Array[Byte](10, 20, 30), Seq(4, 6, 3), "png"),
      Row(2L, Array[Byte](1, 2, 3, 4), null, "jpg"))
    val df = spark.createDataFrame(rows, schema)
    val dec = Multimodal.decodeImages(df, "img").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(dec(1L).getAs[Int]("height") == 4 && dec(1L).getAs[Int]("width") == 6)
    assert(dec(1L).getAs[Double]("mean_intensity") == 20.0)
    assert(dec(2L).getAs[Int]("channels") == 3) // default when shape absent
    val rs = Multimodal.resizePlan(df, "img", 2, 2)
      .filter($"id" === 1L).head().getAs[scala.collection.Seq[Int]]("img_shape")
    assert(rs.toSeq == Seq(2, 2, 3))
    val frames = Multimodal.sampleFrames(
      Seq((1L, 10)).toDF("id", "n_frames"), "n_frames", 3)
      .select("frame_index").as[Int].collect().toSeq
    assert(frames == Seq(0, 3, 6, 9))
  }

  test("multimodal: mp4 moov/mvhd metadata decode (v0 + v1), stub for mkv") {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val size = 8 + payload.length
      Array[Byte](((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        typ.getBytes("US-ASCII") ++ payload
    }
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32((v >> 32).toInt) ++ be32(v.toInt)
    // v0 mvhd: version+flags, creation, modification, timescale 600,
    // duration 1200 -> 2.0 s; two empty trak children
    val mvhd0 = box("mvhd", Array[Byte](0, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(600) ++ be32(1200))
    val mp4v0 = box("ftyp", "isom0000".getBytes("US-ASCII")) ++
      box("moov", mvhd0 ++ box("trak", Array.emptyByteArray) ++
        box("trak", Array.emptyByteArray))
    assert(Multimodal.decodeMp4(mp4v0).contains((600, 2.0, 2)))
    // v1 mvhd: 64-bit creation/modification/duration, 32-bit timescale
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(90000) ++ be64(450000L))
    val mp4v1 = box("moov", mvhd1 ++ box("trak", Array.emptyByteArray))
    assert(Multimodal.decodeMp4(mp4v1).contains((90000, 5.0, 1)))
    // not ISO BMFF / no moov -> None
    assert(Multimodal.decodeMp4(Array.fill(64)(0x42.toByte)).isEmpty)
    assert(Multimodal.decodeMp4(
      box("ftyp", "isom0000".getBytes("US-ASCII"))).isEmpty)
    // pipeline: mp4 rows decode for real, mkv-ish payloads stub
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("vid"))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1L, mp4v0, null, "mp4"),
      Row(2L, Array.fill(3000)(0x1a.toByte), null, "mkv")), schema)
    val dec = Multimodal.decodeVideo(df, "vid").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(dec(1L).getAs[Int]("timescale") == 600)
    assert(dec(1L).getAs[Double]("duration_sec") == 2.0)
    assert(dec(1L).getAs[Int]("track_count") == 2)
    assert(dec(2L).getAs[Int]("timescale") == 1000) // stub
    assert(dec(2L).getAs[Double]("duration_sec") == 3.0)
  }

  test("multimodal: ogg vorbis/opus metadata decode") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def page(granule: Long, payload: Array[Byte]): Array[Byte] =
      "OggS".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ le(granule, 8) ++
        le(1, 4) ++ le(0, 4) ++ le(0, 4) ++
        Array[Byte](1, payload.length.toByte) ++ payload
    // Vorbis: id header page (granule 0) + a data page carrying the
    // final granule position 88200 -> 2.0 s at 44.1 kHz stereo
    val vorbisId = Array[Byte](0x01) ++ "vorbis".getBytes("US-ASCII") ++
      le(0, 4) ++ Array[Byte](2) ++ le(44100, 4) ++ le(0, 12)
    val ogg = page(0, vorbisId) ++ page(88200, Array.fill(8)(0x00.toByte))
    val od = Multimodal.decodeOgg(ogg)
    assert(od.contains((44100, 2, 88200L, 2.0, null)), s"got $od")
    // Opus: granules run at 48 kHz; preskip 312 subtracts from the tail
    val opusId = "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, 1) ++
      le(312, 2) ++ le(16000, 4) ++ le(0, 3)
    val opus = page(0, opusId) ++ page(96312, Array.fill(8)(0x00.toByte))
    val op = Multimodal.decodeOgg(opus)
    assert(op.contains((16000, 1, 96000L, 2.0, null)), s"got $op")
    // not ogg / unknown codec -> None
    assert(Multimodal.decodeOgg(Array.fill(64)(0x4f.toByte)).isEmpty)
    assert(Multimodal.decodeOgg(
      page(0, Array.fill(19)(0x7e.toByte))).isEmpty)
  }

  test("multimodal: ogg vorbis FULL synthesis matches the analytic signal") {
    // A minimal but spec-valid Vorbis I stream built here bit-by-bit
    // (LSB-first packing, MSB-first huffman codewords): mono, 8 kHz,
    // blocksizes 256/256, one mode/mapping, floor1 with zero partitions
    // (a flat y0=y1=255 line -> linear amplitude exactly 1.0), residue
    // type 2 over [0,128) in 4 partitions with a 2-entry classbook and
    // a 3-entry {-1,0,+1} lookup-1 value book. Every audio packet
    // encodes a single +1 at spectral bin K, so the decoded time signal
    // is ANALYTIC: imdct of a unit bin through the vorbis window and
    // equal-size overlap-add, computable here from the spec formulas
    // alone - independent of the decoder's internals.
    final class BitW {
      private val out = new java.io.ByteArrayOutputStream()
      private var cur = 0; private var nb = 0
      def bit(b: Int): Unit = {
        cur |= (b & 1) << nb; nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
      }
      def bits(v: Long, n: Int): Unit =         // raw ints: LSB first
        (0 until n).foreach(i => bit(((v >> i) & 1).toInt))
      def code(c: Int, len: Int): Unit =        // huffman: MSB first
        (len - 1 to 0 by -1).foreach(j => bit((c >> j) & 1))
      def bytes: Array[Byte] = {
        if (nb > 0) { out.write(cur); cur = 0; nb = 0 }
        out.toByteArray
      }
    }
    def vorbisFloat(v: Double): Long = { // 21-bit mantissa, biased exp
      val sign = if (v < 0) 0x80000000L else 0L
      val m = math.abs(v).toLong              // integers only, exp 788
      sign | (788L << 21) | m
    }
    val n = 256; val n2 = 128; val binK = 9
    val ident = {
      val w = new BitW
      w.bits(1, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(0, 32); w.bits(1, 8); w.bits(8000, 32)
      w.bits(0, 32); w.bits(0, 32); w.bits(0, 32)
      w.bits(8 | (8 << 4), 8) // blocksize0 = blocksize1 = 2^8
      w.bit(1)
      w.bytes
    }
    val comment = {
      val w = new BitW
      w.bits(3, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(0, 32); w.bits(0, 32); w.bit(1)
      w.bytes
    }
    val setup = {
      val w = new BitW
      w.bits(5, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(1, 8) // 2 codebooks
      // book 0 (classbook): dim 1, 2 entries, lengths [1,1], no lookup
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(2, 24)
      w.bit(0); w.bit(0) // unordered, non-sparse
      w.bits(0, 5); w.bits(0, 5) // lengths - 1
      w.bits(0, 4) // lookup 0
      // book 1 (values): dim 1, 3 entries, lengths [1,2,2], lookup 1
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(3, 24)
      w.bit(0); w.bit(0)
      w.bits(0, 5); w.bits(1, 5); w.bits(1, 5)
      w.bits(1, 4) // lookup type 1
      w.bits(vorbisFloat(-1.0), 32) // minimum
      w.bits(vorbisFloat(1.0), 32)  // delta
      w.bits(1, 4) // value_bits - 1 = 1 -> 2 bits each
      w.bit(0)     // sequence_p
      Seq(0, 1, 2).foreach(m => w.bits(m, 2)) // values -1, 0, +1
      // time domain: 1 transform, type 0
      w.bits(0, 6); w.bits(0, 16)
      // floors: 1 of type 1, zero partitions, multiplier 1, rangebits 7
      w.bits(0, 6); w.bits(1, 16)
      w.bits(0, 5)      // partitions
      w.bits(0, 2)      // multiplier - 1
      w.bits(7, 4)      // rangebits -> x list [0, 128]
      // residues: 1 of type 2
      w.bits(0, 6); w.bits(2, 16)
      w.bits(0, 24); w.bits(128, 24); w.bits(31, 24) // begin/end/psize-1
      w.bits(0, 6)      // classifications - 1 = 0 -> 1 class
      w.bits(0, 8)      // classbook = book 0
      w.bits(1, 3); w.bit(0) // cascade[0] = 1 (pass 0 only)
      w.bits(1, 8)      // books[0][pass0] = book 1
      // mappings: 1 of type 0, no flags -> 1 submap, no coupling
      w.bits(0, 6); w.bits(0, 16)
      w.bit(0); w.bit(0); w.bits(0, 2)
      w.bits(0, 8); w.bits(0, 8); w.bits(0, 8) // time/floor/residue = 0
      // modes: 1, blockflag 0
      w.bits(0, 6)
      w.bit(0); w.bits(0, 16); w.bits(0, 16); w.bits(0, 8)
      w.bit(1)
      w.bytes
    }
    val audio = {
      val w = new BitW
      w.bit(0) // audio packet; mode number = ilog(0) = 0 bits
      // floor ch0: voiced, y0 = y1 = 255 (8 bits each: ilog(255) = 8)
      w.bit(1); w.bits(255, 8); w.bits(255, 8)
      // residue: 4 partitions x (1 classword bit + 32 values);
      // values: entry1 '10' = 0 everywhere except bin K -> entry2 '11'
      for (p <- 0 until 4) {
        w.code(0, 1) // classword: entry 0
        for (i <- 0 until 32) {
          val bin = p * 32 + i
          if (bin == binK) w.code(3, 2) else w.code(2, 2)
        }
      }
      w.bytes
    }
    def le(v: Long, nB: Int): Array[Byte] =
      (0 until nB).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def page(tpe: Int, granule: Long, seq: Int,
             packets: Seq[Array[Byte]]): Array[Byte] = {
      val lacing = packets.flatMap { p =>
        val full = Seq.fill(p.length / 255)(255.toByte)
        full :+ (p.length % 255).toByte
      }
      "OggS".getBytes ++ Array[Byte](0, tpe.toByte) ++ le(granule, 8) ++
        le(7, 4) ++ le(seq, 4) ++ le(0, 4) ++
        Array(lacing.length.toByte) ++ lacing ++ packets.flatten
    }
    val nPackets = 5 // first primes the overlap; 4 x 128 samples emitted
    val ogg = page(2, 0, 0, Seq(ident)) ++
      page(0, 0, 1, Seq(comment, setup)) ++
      page(4, 4 * n2, 2, Seq.fill(nPackets)(audio))
    // ---- analytic expectation from the SPEC formulas -------------------
    def slope(i: Int, sn: Int): Double =
      math.sin(math.Pi / 2 * math.pow(
        math.sin(math.Pi / 2 * (i + 0.5) / sn), 2))
    val wnd = Array.tabulate(n)(i =>
      if (i < n2) slope(i, n2) else slope(n - 1 - i, n2))
    val t = Array.tabulate(n)(i => math.cos(
      math.Pi / (2.0 * n) * (2 * i + 1 + n2) * (2 * binK + 1)))
    val steady = Array.tabulate(n2)(i =>
      t(n2 + i) * wnd(n2 + i) + t(i) * wnd(i))
    val expectMean = steady.map(s =>
      math.abs(math.max(-1.0, math.min(1.0, s)))).sum / n2
    // ---- decode through the public surface ----------------------------
    val od = Multimodal.decodeOgg(ogg)
    assert(od.isDefined, "fixture must parse as ogg-vorbis")
    val (rate, ch, samples, dur, amp) = od.get
    assert(rate == 8000 && ch == 1 && samples == 4L * n2)
    assert(math.abs(dur - 512.0 / 8000) < 1e-9)
    assert(amp != null, "full vorbis synthesis must produce an amplitude")
    assert(math.abs(amp.doubleValue - expectMean) < 1e-4,
      s"decoded mean ${amp.doubleValue} vs analytic $expectMean")
    // degradation: a stream whose setup is corrupted keeps its metadata
    // and reports amplitude null (the parse-fail -> metadata boundary)
    val broken = page(2, 0, 0, Seq(ident)) ++
      page(0, 0, 1, Seq(comment, setup.take(20))) ++
      page(4, 4 * n2, 2, Seq.fill(nPackets)(audio))
    val bd = Multimodal.decodeOgg(broken)
    assert(bd.isDefined && bd.get._5 == null,
      s"corrupt setup must degrade to metadata-only, got $bd")
    // adversarial dim=0 codebook (would spin the lookup-values search
    // forever without the shape guard): must degrade, never hang
    val evilSetup = {
      val w = new BitW
      w.bits(5, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(0, 8) // 1 codebook
      w.bits(0x564342, 24); w.bits(0, 16); w.bits(3, 24) // dim = 0 !
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(1, 5); w.bits(1, 5)
      w.bits(1, 4); w.bits(vorbisFloat(-1.0), 32); w.bits(vorbisFloat(1.0), 32)
      w.bits(1, 4); w.bit(0)
      w.bytes
    }
    val evil = page(2, 0, 0, Seq(ident)) ++
      page(0, 0, 1, Seq(comment, evilSetup)) ++
      page(4, 4 * n2, 2, Seq(audio))
    val ed = Multimodal.decodeOgg(evil)
    assert(ed.isDefined && ed.get._5 == null,
      s"dim-0 codebook must degrade to metadata-only, got $ed")
    // adversarial VQ minimum with a near-top packed exponent: the
    // unpacked Float overflows to Inf, Inf-Inf = NaN in the synthesis
    // sums, and NaN passes through min/max clamps — must degrade, not
    // escape as a poisoned (NaN) amplitude
    val infSetup = {
      val w = new BitW
      w.bits(5, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(1, 8)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(2, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(0, 5); w.bits(0, 4)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(3, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(1, 5); w.bits(1, 5)
      w.bits(1, 4)
      w.bits((1023L << 21) | 1L, 32) // minimum = 1 * 2^235 -> Float Inf
      w.bits(vorbisFloat(1.0), 32)
      w.bits(1, 4); w.bit(0); Seq(0, 1, 2).foreach(m => w.bits(m, 2))
      w.bytes // truncated tail is fine — the require fires first
    }
    val infOgg = page(2, 0, 0, Seq(ident)) ++
      page(0, 0, 1, Seq(comment, infSetup)) ++
      page(4, 4 * n2, 2, Seq(audio))
    val ifd = Multimodal.decodeOgg(infOgg)
    assert(ifd.isDefined && ifd.get._5 == null,
      s"non-finite VQ params must degrade to metadata-only, got $ifd")
    // END-OF-PACKET mid-audio-decode is NORMAL (truncated final packet):
    // the packet keeps what was decoded — here EOP hits in the first
    // floor read, so the last block synthesizes silence and the final
    // overlap slice carries only the previous block's windowed tail
    val eopOgg = page(2, 0, 0, Seq(ident)) ++
      page(0, 0, 1, Seq(comment, setup)) ++
      page(4, 4 * n2, 2, Seq.fill(nPackets - 1)(audio) :+ audio.take(1))
    val eopExpect = {
      val steadySum = steady.map(s =>
        math.abs(math.max(-1.0, math.min(1.0, s)))).sum
      val tailOnly = (0 until n2).map(i =>
        math.abs(math.max(-1.0, math.min(1.0, t(n2 + i) * wnd(n2 + i))))).sum
      (3 * steadySum + tailOnly) / (4.0 * n2)
    }
    val eod = Multimodal.decodeOgg(eopOgg)
    assert(eod.isDefined && eod.get._5 != null,
      s"EOP mid-decode must still produce audio, got $eod")
    assert(math.abs(eod.get._5.doubleValue - eopExpect) < 1e-4,
      s"EOP decoded mean ${eod.get._5.doubleValue} vs analytic $eopExpect")

    // ---- stereo + square-polar coupling + negative residues ------------
    // magnitude channel carries +1 at binK; the angle channel carries -1
    // at binK2 (magnitude 0 there). Inverse coupling (spec 4.3.5):
    //   at binK : M=1, A=0  -> ch0 += bin, ch1 += bin
    //   at binK2: M=0, A=-1 -> ch0 = 0-(-1) = +1, ch1 = 0
    // so ch0 is a TWO-bin signal and ch1 a one-bin signal - all of it
    // decoded through the interleaved residue-2 vector.
    val binK2 = 40
    val ident2 = {
      val w = new BitW
      w.bits(1, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(0, 32); w.bits(2, 8); w.bits(8000, 32)
      w.bits(0, 32); w.bits(0, 32); w.bits(0, 32)
      w.bits(8 | (8 << 4), 8); w.bit(1)
      w.bytes
    }
    val setup2 = {
      val w = new BitW
      w.bits(5, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(1, 8)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(2, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(0, 5); w.bits(0, 4)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(3, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(1, 5); w.bits(1, 5)
      w.bits(1, 4); w.bits(vorbisFloat(-1.0), 32); w.bits(vorbisFloat(1.0), 32)
      w.bits(1, 4); w.bit(0); Seq(0, 1, 2).foreach(m => w.bits(m, 2))
      w.bits(0, 6); w.bits(0, 16)
      w.bits(0, 6); w.bits(1, 16)
      w.bits(0, 5); w.bits(0, 2); w.bits(7, 4)
      // residue 2 over the INTERLEAVED stereo vector [0, 256)
      w.bits(0, 6); w.bits(2, 16)
      w.bits(0, 24); w.bits(256, 24); w.bits(31, 24)
      w.bits(0, 6); w.bits(0, 8)
      w.bits(1, 3); w.bit(0); w.bits(1, 8)
      // mapping: 1 submap, ONE coupling step mag=0 ang=1
      w.bits(0, 6); w.bits(0, 16)
      w.bit(0)          // submaps flag -> 1
      w.bit(1)          // coupling flag
      w.bits(0, 8)      // steps - 1
      w.bits(0, 1); w.bits(1, 1) // mag 0, ang 1 (ilog(1) = 1 bit)
      w.bits(0, 2)
      w.bits(0, 8); w.bits(0, 8); w.bits(0, 8)
      w.bits(0, 6)
      w.bit(0); w.bits(0, 16); w.bits(0, 16); w.bits(0, 8)
      w.bit(1)
      w.bytes
    }
    val audio2 = {
      val w = new BitW
      w.bit(0)
      // two voiced flat floors
      w.bit(1); w.bits(255, 8); w.bits(255, 8)
      w.bit(1); w.bits(255, 8); w.bits(255, 8)
      // interleaved residue: 8 partitions x (1 classword + 32 values);
      // +1 at interleaved 2*binK (ch0), -1 at 2*binK2+1 (ch1)
      for (p <- 0 until 8) {
        w.code(0, 1)
        for (i <- 0 until 32) {
          val pos = p * 32 + i
          if (pos == 2 * binK) w.code(3, 2)        // +1
          else if (pos == 2 * binK2 + 1) w.code(0, 1) // -1
          else w.code(2, 2)                         // 0
        }
      }
      w.bytes
    }
    val ogg2 = page(2, 0, 0, Seq(ident2)) ++
      page(0, 0, 1, Seq(comment, setup2)) ++
      page(4, 4 * n2, 2, Seq.fill(nPackets)(audio2))
    val t2 = Array.tabulate(n)(i => math.cos(
      math.Pi / (2.0 * n) * (2 * i + 1 + n2) * (2 * binK2 + 1)))
    def steadyOf(sig: Array[Double]): Array[Double] =
      Array.tabulate(n2)(i => sig(n2 + i) * wnd(n2 + i) + sig(i) * wnd(i))
    val ch0 = steadyOf(Array.tabulate(n)(i => t(i) + t2(i)))
    val ch1 = steadyOf(t)
    val expect2 = (ch0 ++ ch1).map(s =>
      math.abs(math.max(-1.0, math.min(1.0, s)))).sum / (2.0 * n2)
    val od2 = Multimodal.decodeOgg(ogg2)
    assert(od2.isDefined && od2.get._2 == 2 && od2.get._3 == 4L * n2)
    val amp2 = od2.get._5
    assert(amp2 != null, "stereo coupled synthesis must decode")
    assert(math.abs(amp2.doubleValue - expect2) < 1e-4,
      s"stereo decoded mean ${amp2.doubleValue} vs analytic $expect2")

    // ---- mixed long/short blocks (64/256): the general unequal-size
    // window slopes and center-aligned overlap-add. Packet pattern
    // long, short, long, short, long with the long blocks' window
    // flags marking their short neighbors. Mono, one +1 bin per block.
    val nS = 64; val nL = 256
    val ident3 = {
      val w = new BitW
      w.bits(1, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(0, 32); w.bits(1, 8); w.bits(8000, 32)
      w.bits(0, 32); w.bits(0, 32); w.bits(0, 32)
      w.bits(6 | (8 << 4), 8) // blocksize0 = 2^6, blocksize1 = 2^8
      w.bit(1)
      w.bytes
    }
    val setup3 = {
      val w = new BitW
      w.bits(5, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(1, 8)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(2, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(0, 5); w.bits(0, 4)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(3, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(1, 5); w.bits(1, 5)
      w.bits(1, 4); w.bits(vorbisFloat(-1.0), 32); w.bits(vorbisFloat(1.0), 32)
      w.bits(1, 4); w.bit(0); Seq(0, 1, 2).foreach(m => w.bits(m, 2))
      w.bits(0, 6); w.bits(0, 16)
      w.bits(0, 6); w.bits(1, 16)
      w.bits(0, 5); w.bits(0, 2); w.bits(7, 4)
      w.bits(0, 6); w.bits(2, 16)
      w.bits(0, 24); w.bits(128, 24); w.bits(31, 24)
      w.bits(0, 6); w.bits(0, 8)
      w.bits(1, 3); w.bit(0); w.bits(1, 8)
      w.bits(0, 6); w.bits(0, 16)
      w.bit(0); w.bit(0); w.bits(0, 2)
      w.bits(0, 8); w.bits(0, 8); w.bits(0, 8)
      // TWO modes: 0 = short, 1 = long (same mapping)
      w.bits(1, 6)
      w.bit(0); w.bits(0, 16); w.bits(0, 16); w.bits(0, 8)
      w.bit(1); w.bits(0, 16); w.bits(0, 16); w.bits(0, 8)
      w.bit(1)
      w.bytes
    }
    def audio3(long: Boolean, prevLong: Boolean, nextLong: Boolean) = {
      val w = new BitW
      w.bit(0)
      w.bits(if (long) 1 else 0, 1) // mode number (ilog(1) = 1 bit)
      if (long) { w.bit(if (prevLong) 1 else 0); w.bit(if (nextLong) 1 else 0) }
      w.bit(1); w.bits(255, 8); w.bits(255, 8)
      val n2here = (if (long) nL else nS) / 2
      val parts = math.min(128, n2here) / 32
      for (p <- 0 until parts) {
        w.code(0, 1)
        for (i <- 0 until 32)
          if (p * 32 + i == binK) w.code(3, 2) else w.code(2, 2)
      }
      w.bytes
    }
    val pkts = Seq(
      audio3(long = true, prevLong = true, nextLong = false),
      audio3(long = false, prevLong = false, nextLong = false),
      audio3(long = true, prevLong = false, nextLong = false),
      audio3(long = false, prevLong = false, nextLong = false),
      audio3(long = true, prevLong = false, nextLong = true))
    // emitted: 4 transitions x (prevN/4 + curN/4) = 4 x 80
    val total3 = 4 * (nL / 4 + nS / 4)
    val ogg3 = page(2, 0, 0, Seq(ident3)) ++
      page(0, 0, 1, Seq(comment, setup3)) ++
      page(4, total3, 2, pkts)
    // analytic: spec window shapes (slopes sized by the smaller
    // neighbor, centered at n/4 and 3n/4) and center-aligned lap
    def wndOf(nn: Int, leftN: Int, rightN: Int): Array[Double] = {
      val ls = nn / 4 - leftN / 2
      val rs = 3 * nn / 4 - rightN / 2
      Array.tabulate(nn) { i =>
        if (i < ls) 0.0
        else if (i < ls + leftN) slope(i - ls, leftN)
        else if (i < rs) 1.0
        else if (i < rs + rightN) slope(rightN - 1 - (i - rs), rightN)
        else 0.0
      }
    }
    def sig(nn: Int): Array[Double] = Array.tabulate(nn)(i => math.cos(
      math.Pi / (2.0 * nn) * (2 * i + 1 + nn / 2) * (2 * binK + 1)))
    val blocks = Seq( // (n, leftN, rightN) per packet
      (nL, nL / 2, nS / 2), (nS, nS / 2, nS / 2), (nL, nS / 2, nS / 2),
      (nS, nS / 2, nS / 2), (nL, nS / 2, nL / 2))
    val windowed3 = blocks.map { case (nn, l, r) =>
      val w = wndOf(nn, l, r); val s0 = sig(nn)
      Array.tabulate(nn)(i => s0(i) * w(i))
    }
    val expected3 = (1 until 5).flatMap { b =>
      val pN = blocks(b - 1)._1; val cN = blocks(b)._1
      val curT0 = 3 * pN / 4 - cN / 4
      (0 until pN / 4 + cN / 4).map { j =>
        val tAbs = pN / 2 + j
        var v = 0.0
        if (tAbs < pN) v += windowed3(b - 1)(tAbs)
        val ci = tAbs - curT0
        if (ci >= 0 && ci < cN) v += windowed3(b)(ci)
        v
      }
    }
    val expect3 = expected3.map(s =>
      math.abs(math.max(-1.0, math.min(1.0, s)))).sum / total3
    val od3 = Multimodal.decodeOgg(ogg3)
    assert(od3.isDefined && od3.get._3 == total3.toLong, s"got $od3")
    val amp3 = od3.get._5
    assert(amp3 != null, "long/short synthesis must decode")
    assert(math.abs(amp3.doubleValue - expect3) < 1e-4,
      s"long/short decoded mean ${amp3.doubleValue} vs analytic $expect3")

    // ---- residue type 0 (stride interleave) with a dim-2 SPARSE book:
    // entry d of VQ step k lands at d*(psize/dim)+k, so a +1 emitted as
    // vector slot 0 of step 9 hits bin 9 while slot 1 of step 10 hits
    // bin 26 — a sequential (type-1) reading would place them at 18/21
    // and fail the analytic compare.
    val setup4 = {
      val w = new BitW
      w.bits(5, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(1, 8) // 2 codebooks
      // book 0: classbook (dim 1, 2 entries, lengths [1,1])
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(2, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(0, 5); w.bits(0, 4)
      // book 1: dim 2, 9 entries, SPARSE (only 4,5,7 used), lookup 1:
      // lv = 3, values (e%3 - 1, e/3%3 - 1): e4=(0,0) e5=(1,0) e7=(0,1)
      w.bits(0x564342, 24); w.bits(2, 16); w.bits(9, 24)
      w.bit(0); w.bit(1) // unordered, sparse
      for (e <- 0 until 9) {
        if (e == 4) { w.bit(1); w.bits(0, 5) }       // len 1
        else if (e == 5 || e == 7) { w.bit(1); w.bits(1, 5) } // len 2
        else w.bit(0)
      }
      w.bits(1, 4); w.bits(vorbisFloat(-1.0), 32); w.bits(vorbisFloat(1.0), 32)
      w.bits(1, 4); w.bit(0); Seq(0, 1, 2).foreach(m => w.bits(m, 2))
      w.bits(0, 6); w.bits(0, 16)
      w.bits(0, 6); w.bits(1, 16)
      w.bits(0, 5); w.bits(0, 2); w.bits(7, 4)
      // residue TYPE 0
      w.bits(0, 6); w.bits(0, 16)
      w.bits(0, 24); w.bits(128, 24); w.bits(31, 24)
      w.bits(0, 6); w.bits(0, 8)
      w.bits(1, 3); w.bit(0); w.bits(1, 8)
      w.bits(0, 6); w.bits(0, 16)
      w.bit(0); w.bit(0); w.bits(0, 2)
      w.bits(0, 8); w.bits(0, 8); w.bits(0, 8)
      w.bits(0, 6)
      w.bit(0); w.bits(0, 16); w.bits(0, 16); w.bits(0, 8)
      w.bit(1)
      w.bytes
    }
    val audio4 = {
      val w = new BitW
      w.bit(0)
      w.bit(1); w.bits(255, 8); w.bits(255, 8)
      for (p <- 0 until 4) { // 4 partitions x (classword + 16 VQ steps)
        w.code(0, 1)
        for (k <- 0 until 16) {
          if (p == 0 && k == 9) w.code(2, 2)       // e5 -> +1 at bin 9
          else if (p == 0 && k == 10) w.code(3, 2) // e7 -> +1 at bin 26
          else w.code(0, 1)                        // e4 -> zeros
        }
      }
      w.bytes
    }
    val ogg4 = page(2, 0, 0, Seq(ident)) ++
      page(0, 0, 1, Seq(comment, setup4)) ++
      page(4, 4 * n2, 2, Seq.fill(nPackets)(audio4))
    val t26 = Array.tabulate(n)(i => math.cos(
      math.Pi / (2.0 * n) * (2 * i + 1 + n2) * (2 * 26 + 1)))
    val steady4 = steadyOf(Array.tabulate(n)(i => t(i) + t26(i)))
    val expect4 = steady4.map(s =>
      math.abs(math.max(-1.0, math.min(1.0, s)))).sum / n2
    val od4 = Multimodal.decodeOgg(ogg4)
    assert(od4.isDefined && od4.get._5 != null,
      s"residue-0 stream must decode, got $od4")
    assert(math.abs(od4.get._5.doubleValue - expect4) < 1e-4,
      s"residue-0 decoded mean ${od4.get._5.doubleValue} vs analytic $expect4")

    // ---- UNCOUPLED stereo, residue type 1: the spec interleaves
    // classwords and partition payloads ACROSS the submap's channels
    // (cw0 cw1 pay0 pay1 per partition group) — a per-channel
    // sequential walk reads every bit after ch0's first partition at
    // the wrong offset. ch0 carries +1 at bin 9, ch1 carries -1 at
    // bin 40; the analytic compare fails under any misalignment.
    val setup5 = {
      val w = new BitW
      w.bits(5, 8); "vorbis".getBytes.foreach(c => w.bits(c, 8))
      w.bits(1, 8)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(2, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(0, 5); w.bits(0, 4)
      w.bits(0x564342, 24); w.bits(1, 16); w.bits(3, 24)
      w.bit(0); w.bit(0); w.bits(0, 5); w.bits(1, 5); w.bits(1, 5)
      w.bits(1, 4); w.bits(vorbisFloat(-1.0), 32); w.bits(vorbisFloat(1.0), 32)
      w.bits(1, 4); w.bit(0); Seq(0, 1, 2).foreach(m => w.bits(m, 2))
      w.bits(0, 6); w.bits(0, 16)
      w.bits(0, 6); w.bits(1, 16)
      w.bits(0, 5); w.bits(0, 2); w.bits(7, 4)
      // residue TYPE 1, per-channel vectors [0, 128)
      w.bits(0, 6); w.bits(1, 16)
      w.bits(0, 24); w.bits(128, 24); w.bits(31, 24)
      w.bits(0, 6); w.bits(0, 8)
      w.bits(1, 3); w.bit(0); w.bits(1, 8)
      // mapping: 1 submap, NO coupling, both channels in it
      w.bits(0, 6); w.bits(0, 16)
      w.bit(0); w.bit(0); w.bits(0, 2)
      w.bits(0, 8); w.bits(0, 8); w.bits(0, 8)
      w.bits(0, 6)
      w.bit(0); w.bits(0, 16); w.bits(0, 16); w.bits(0, 8)
      w.bit(1)
      w.bytes
    }
    val audio5 = {
      val w = new BitW
      w.bit(0)
      w.bit(1); w.bits(255, 8); w.bits(255, 8) // floor ch0
      w.bit(1); w.bits(255, 8); w.bits(255, 8) // floor ch1
      for (p <- 0 until 4) {
        w.code(0, 1) // classword ch0
        w.code(0, 1) // classword ch1
        for (i <- 0 until 32) { // payload ch0, partition p
          if (p * 32 + i == binK) w.code(3, 2) else w.code(2, 2)
        }
        for (i <- 0 until 32) { // payload ch1, partition p
          if (p * 32 + i == binK2) w.code(0, 1) else w.code(2, 2) // -1 at binK2
        }
      }
      w.bytes
    }
    val ogg5 = page(2, 0, 0, Seq(ident2)) ++ // stereo ident
      page(0, 0, 1, Seq(comment, setup5)) ++
      page(4, 4 * n2, 2, Seq.fill(nPackets)(audio5))
    val ch0s = steadyOf(t)
    val ch1s = steadyOf(Array.tabulate(n)(i => math.cos(
      math.Pi / (2.0 * n) * (2 * i + 1 + n2) * (2 * binK2 + 1))))
    val expect5 = (ch0s ++ ch1s).map(s =>
      math.abs(math.max(-1.0, math.min(1.0, s)))).sum / (2.0 * n2)
    val od5 = Multimodal.decodeOgg(ogg5)
    assert(od5.isDefined && od5.get._2 == 2 && od5.get._5 != null,
      s"uncoupled stereo residue-1 must decode, got $od5")
    assert(math.abs(od5.get._5.doubleValue - expect5) < 1e-4,
      s"residue-1 stereo decoded mean ${od5.get._5.doubleValue} vs analytic $expect5")

    // ---- mutation fuzz: bit-flipped / truncated variants of the valid
    // fixtures must DEGRADE (amplitude null or a changed-but-finite
    // value), never hang or throw out of decodeOgg — the one contract
    // an ingest pipeline fed arbitrary blobs depends on. A hang shows
    // up as this suite timing out.
    val rndm = new scala.util.Random(260814)
    val bases = Seq(ogg, ogg2, ogg3, ogg4, ogg5)
    for (trial <- 0 until 300) {
      val base = bases(trial % bases.length)
      val mutant = base.clone()
      rndm.nextInt(3) match {
        case 0 => // flip 1-4 random bits
          for (_ <- 0 to rndm.nextInt(4)) {
            val i = rndm.nextInt(mutant.length)
            mutant(i) = (mutant(i) ^ (1 << rndm.nextInt(8))).toByte
          }
        case 1 => // zero a random run
          val i = rndm.nextInt(mutant.length)
          val len = math.min(1 + rndm.nextInt(16), mutant.length - i)
          java.util.Arrays.fill(mutant, i, i + len, 0.toByte)
        case _ => () // truncation handled below
      }
      val cut =
        if (trial % 3 == 2) mutant.take(rndm.nextInt(mutant.length))
        else mutant
      val out = Multimodal.decodeOgg(cut) // must return, not throw/hang
      out.foreach { o =>
        val a = o._5
        assert(a == null || !a.doubleValue.isNaN,
          s"trial $trial: decode produced NaN amplitude")
      }
    }
  }

  test("vorbis iMDCT: FFT factorization matches the direct spec sum") {
    // The hot-path imdct is the O(n log n) FFT factorization; imdctDirect
    // is the literal spec 4.3.6 transcription. Random spectra across every
    // legal Vorbis block size must agree to float precision (both
    // accumulate in double; disagreement scales with the spectrum's L1
    // norm, so the bound is relative).
    val rnd = new scala.util.Random(41)
    for (n2 <- Seq(32, 64, 128, 512, 1024, 4096); trial <- 0 until 3) {
      val spec = Array.fill(n2)((rnd.nextFloat() * 2 - 1) * 4f)
      val fast = VorbisFrames.imdct(spec)
      val slow = VorbisFrames.imdctDirect(spec)
      assert(fast.length == slow.length && fast.length == 2 * n2)
      val scale = spec.map(v => math.abs(v.toDouble)).sum.max(1.0)
      var i = 0
      while (i < fast.length) {
        assert(math.abs(fast(i) - slow(i)) <= 1e-5 * scale,
          s"n2=$n2 trial=$trial i=$i: ${fast(i)} vs ${slow(i)}")
        i += 1
      }
    }
    // sparse spectra (the analytic-fixture shape): exact agreement band
    for (n2 <- Seq(128, 1024)) {
      val spec = new Array[Float](n2); spec(n2 / 3) = 1f
      val fast = VorbisFrames.imdct(spec)
      val slow = VorbisFrames.imdctDirect(spec)
      (0 until 2 * n2).foreach(i =>
        assert(math.abs(fast(i) - slow(i)) < 1e-6))
    }
  }

  test("multimodal: MJPEG-in-AVI frame decode, real per-frame JPEG") {
    def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(tpe: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ payload)
    def jpegGray(w: Int, h: Int, v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, w, h)
      g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", out))
      out.toByteArray
    }
    def strl(fccType: String, handler: String,
             strfComp: String): Array[Byte] = {
      val strh = new Array[Byte](56)
      fccType.getBytes("US-ASCII").copyToArray(strh, 0)
      handler.getBytes("US-ASCII").copyToArray(strh, 4)
      val strf = new Array[Byte](40) // BITMAPINFOHEADER
      le32(40).copyToArray(strf, 0)
      strfComp.getBytes("US-ASCII").copyToArray(strf, 16)
      list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    }
    def avi(streams: Seq[Array[Byte]], movi: Array[Byte]): Array[Byte] = {
      val avih = new Array[Byte](56)
      le32(40000).copyToArray(avih, 0) // 25 fps
      le32(3).copyToArray(avih, 16)    // total frames
      le32(streams.size).copyToArray(avih, 24)
      val body = list("hdrl", chunk("avih", avih) ++
        streams.flatten.toArray) ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length + 4) ++
        "AVI ".getBytes("US-ASCII") ++ body
    }
    // audio stream FIRST so the video stream index is 1, frames in 01dc;
    // one frame grouped inside a `rec ` LIST
    val grays = Seq(40, 104, 200)
    val fs = grays.map(v => jpegGray(32, 24, v))
    val movi = list("movi", chunk("01dc", fs(0)) ++
      list("rec ", chunk("01dc", fs(1))) ++ chunk("01db", fs(2)) ++
      chunk("00wb", Array.fill(16)(0.toByte))) // audio chunk: ignored
    val bytes = avi(Seq(strl("auds", "    ", "    "),
      strl("vids", "MJPG", "MJPG")), movi)
    val frames = Multimodal.decodeAviMjpegFrames(bytes)
    assert(frames.isDefined && frames.get.size == 3, s"got $frames")
    for (((w, h, mean), v) <- frames.get.zip(grays)) {
      assert(w == 32 && h == 24)
      assert(math.abs(mean - v) <= 7, s"luma $mean vs solid $v")
    }
    // maxFrames bounds the per-row work
    assert(Multimodal.decodeAviMjpegFrames(bytes, maxFrames = 2)
      .get.size == 2)
    // the metadata path still reads the same container
    val md = Multimodal.decodeAvi(bytes)
    assert(md.contains((25, 0.12, 2)), s"avih metadata: $md")
    // handler detected from strf biCompression when strh says DIB
    val bytes2 = avi(Seq(strl("vids", "    ", "mjpg")),
      list("movi", chunk("00dc", fs(0))))
    assert(Multimodal.decodeAviMjpegFrames(bytes2).exists(_.size == 1))
    // non-MJPEG video stream → None (no silent wrong-codec decode)
    val h264 = avi(Seq(strl("vids", "H264", "H264")),
      list("movi", chunk("00dc", fs(0))))
    assert(Multimodal.decodeAviMjpegFrames(h264).isEmpty)
    // a corrupt frame poisons the row — partial decodes never escape
    val bad = avi(Seq(strl("vids", "MJPG", "MJPG")),
      list("movi", chunk("00dc", fs(0)) ++
        chunk("00dc", Array.fill(64)(7.toByte))))
    assert(Multimodal.decodeAviMjpegFrames(bad).isEmpty)
    // non-AVI payload → None
    assert(Multimodal.decodeAviMjpegFrames("hello".getBytes).isEmpty)
    // DataFrame surface: features for MJPEG rows, nulls for the rest
    val df = Seq((1L, bytes), (2L, h264), (3L, "nope".getBytes))
      .toDF("id", "video_bytes")
    val out = Multimodal.decodeVideoFrames(df, "video")
      .select("id", "frames_decoded", "frame_width", "frame_height",
        "mean_frame_luma")
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 3 && out(0).getInt(2) == 32 &&
      out(0).getInt(3) == 24)
    assert(math.abs(out(0).getDouble(4) - grays.sum / 3.0) <= 7)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1),
      "non-MJPEG rows must read as null features")
    // MIXED frame dimensions poison the row: frame_width/height describe
    // every frame, so a stream that changes size mid-video must degrade
    // to null features, not report frame 0's size with an all-frame mean
    val mixed = avi(Seq(strl("vids", "MJPG", "MJPG")),
      list("movi", chunk("00dc", jpegGray(32, 24, 40)) ++
        chunk("00dc", jpegGray(16, 12, 200))))
    val mout = Multimodal.decodeVideoFrames(
      Seq((1L, mixed)).toDF("id", "video_bytes"), "video")
      .select("frames_decoded", "frame_width", "mean_frame_luma")
      .collect()(0)
    assert(mout.isNullAt(0) && mout.isNullAt(1) && mout.isNullAt(2),
      s"mixed-dimension stream must read as null features: $mout")
    // the raw per-frame decoder still reports both faithfully
    assert(Multimodal.decodeAviMjpegFrames(mixed).get.map(f => (f._1, f._2))
      == Seq((32, 24), (16, 12)))
  }

  test("multimodal: avi RIFF and mkv EBML metadata decode") {
    // AVI: RIFF/AVI + LIST(hdrl) + 56-byte avih: 33333 us/frame (30 fps),
    // 300 frames, 2 streams
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val avih = new Array[Byte](56)
    le32(33333).copyToArray(avih, 0)   // dwMicroSecPerFrame
    le32(300).copyToArray(avih, 16)    // dwTotalFrames
    le32(2).copyToArray(avih, 24)      // dwStreams
    val avihChunk = "avih".getBytes("US-ASCII") ++ le32(56) ++ avih
    val hdrl = "LIST".getBytes("US-ASCII") ++ le32(4 + avihChunk.length) ++
      "hdrl".getBytes("US-ASCII") ++ avihChunk
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(4 + hdrl.length) ++
      "AVI ".getBytes("US-ASCII") ++ hdrl
    val ad = Multimodal.decodeAvi(avi)
    assert(ad.isDefined, s"got $ad")
    assert(ad.get._1 == 30 && ad.get._3 == 2)
    assert(math.abs(ad.get._2 - 300 * 33333 / 1e6) < 1e-9)
    assert(Multimodal.decodeAvi("RIFF1234WAVE".getBytes("US-ASCII")).isEmpty)
    // MKV: EBML header + Segment{Info{TimecodeScale 1e6 ns, Duration
    // 120000 ticks}, Tracks{TrackEntry, TrackEntry}}
    def el(id: Array[Int], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127)
      id.map(_.toByte) ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    val scale = el(Array(0x2a, 0xd7, 0xb1),
      Array(0x0f, 0x42, 0x40).map(_.toByte)) // 1000000
    val dur = el(Array(0x44, 0x89), {
      val bits = java.lang.Float.floatToIntBits(120000.0f)
      Array((bits >> 24).toByte, (bits >> 16).toByte,
        (bits >> 8).toByte, bits.toByte)
    })
    val info = el(Array(0x15, 0x49, 0xa9, 0x66), scale ++ dur)
    val tracks = el(Array(0x16, 0x54, 0xae, 0x6b),
      el(Array(0xae), Array.emptyByteArray) ++
        el(Array(0xae), Array.emptyByteArray))
    val segment = el(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    val mkv = el(Array(0x1a, 0x45, 0xdf, 0xa3), Array.emptyByteArray) ++
      segment
    val md = Multimodal.decodeMkv(mkv)
    assert(md.contains((1000, 120.0, 2)), s"got $md")
    assert(Multimodal.decodeMkv(Array.fill(32)(0x11.toByte)).isEmpty)
  }

  test("multimodal: dicom basic metadata decode, explicit + implicit VR") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def expl(g: Int, e: Int, vr: String, value: Array[Byte]): Array[Byte] = {
      val longVR = Set("OB", "OW", "OF", "SQ", "UT", "UN").contains(vr)
      le(g, 2) ++ le(e, 2) ++ vr.getBytes("US-ASCII") ++
        (if (longVR) le(0, 2) ++ le(value.length, 4)
         else le(value.length, 2)) ++ value
    }
    def impl(g: Int, e: Int, value: Array[Byte]): Array[Byte] =
      le(g, 2) ++ le(e, 2) ++ le(value.length, 4) ++ value
    def dicom(syntax: String, dataset: Array[Byte]): Array[Byte] =
      // UI values pad to even length with a NUL, per the spec
      new Array[Byte](128) ++ "DICM".getBytes("US-ASCII") ++
        expl(0x0002, 0x0010, "UI",
          (if (syntax.length % 2 == 1) syntax + "\u0000" else syntax)
            .getBytes("US-ASCII")) ++ dataset
    val explDs =
      expl(0x0008, 0x0060, "CS", "CT".getBytes("US-ASCII")) ++
      expl(0x0028, 0x0010, "US", le(512, 2)) ++
      expl(0x0028, 0x0011, "US", le(256, 2)) ++
      expl(0x0028, 0x0030, "DS", "0.5\\0.75".getBytes("US-ASCII")) ++
      expl(0x0028, 0x0100, "US", le(16, 2)) ++
      expl(0x7fe0, 0x0010, "OW", Array.fill(4)(0x00.toByte))
    val ed = Multimodal.decodeDicom(dicom("1.2.840.10008.1.2.1", explDs))
    assert(ed.contains((Seq(512, 256), 16, Seq(0.5f, 0.75f), "CT")),
      s"got $ed")
    val implDs =
      impl(0x0008, 0x0060, "MR".getBytes("US-ASCII")) ++
      impl(0x0028, 0x0010, le(64, 2)) ++
      impl(0x0028, 0x0011, le(64, 2)) ++
      impl(0x0028, 0x0100, le(12, 2))
    val id = Multimodal.decodeDicom(dicom("1.2.840.10008.1.2", implDs))
    assert(id.contains((Seq(64, 64), 12, Seq.empty[Float], "MR")),
      s"got $id")
    // no DICM magic / missing rows+cols -> None
    assert(Multimodal.decodeDicom(Array.fill(200)(0x44.toByte)).isEmpty)
    assert(Multimodal.decodeDicom(
      dicom("1.2.840.10008.1.2.1", expl(0x0008, 0x0060, "CS",
        "CT".getBytes("US-ASCII")))).isEmpty)
    // through the pipeline: the modality column rides along
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("vol"))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1L, dicom("1.2.840.10008.1.2.1", explDs), null, "dicom")), schema)
    val dec = Multimodal.decodeVolumes(df, "vol").head()
    assert(dec.getAs[String]("modality") == "CT")
    assert(dec.getAs[Int]("datatype") == -1) // dicom has no nifti code
    assert(dec.getAs[scala.collection.Seq[Int]]("dims").toSeq == Seq(512, 256))
  }

  test("multimodal: nifti-1 header decode, both endiannesses, stub for dicom") {
    def nifti(le: Boolean): Array[Byte] = {
      val b = new Array[Byte](348)
      def put32(p: Int, v: Int): Unit =
        if (le) { b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
          b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte }
        else { b(p) = (v >> 24).toByte; b(p + 1) = (v >> 16).toByte
          b(p + 2) = (v >> 8).toByte; b(p + 3) = v.toByte }
      def put16(p: Int, v: Int): Unit =
        if (le) { b(p) = v.toByte; b(p + 1) = (v >> 8).toByte }
        else { b(p) = (v >> 8).toByte; b(p + 1) = v.toByte }
      def putF(p: Int, v: Float): Unit =
        put32(p, java.lang.Float.floatToIntBits(v))
      put32(0, 348)                    // sizeof_hdr = the endianness probe
      put16(40, 3)                     // ndim
      put16(42, 64); put16(44, 64); put16(46, 32) // dims
      put16(70, 4)                     // datatype int16
      put16(72, 16)                    // bitpix
      putF(80, 1.5f); putF(84, 1.5f); putF(88, 2.0f) // pixdim[1..3]
      b(344) = 'n'; b(345) = '+'; b(346) = '1'; b(347) = 0
      b
    }
    for (le <- Seq(true, false)) {
      val d = Multimodal.decodeNifti1(nifti(le))
      assert(d.isDefined, s"le=$le")
      val (dims, dt, bp, vox) = d.get
      assert(dims == Seq(64, 64, 32) && dt == 4 && bp == 16)
      assert(vox == Seq(1.5f, 1.5f, 2.0f))
    }
    // wrong magic / short payload -> None
    val bad = nifti(le = true); bad(344) = 'x'
    assert(Multimodal.decodeNifti1(bad).isEmpty)
    assert(Multimodal.decodeNifti1(Array.fill(100)(0x00.toByte)).isEmpty)
    // pipeline: nifti decodes for real, dicom-ish payloads stub
    val schema = StructType(
      StructField("id", LongType) +: Multimodal.mediaSchema("vol"))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1L, nifti(le = true), null, "nifti"),
      Row(2L, Array.fill(65)(0x7f.toByte), null, "dicom")), schema)
    val dec = Multimodal.decodeVolumes(df, "vol").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(dec(1L).getAs[Int]("ndim") == 3)
    assert(dec(1L).getAs[scala.collection.Seq[Int]]("dims").toSeq ==
      Seq(64, 64, 32))
    assert(dec(1L).getAs[Int]("datatype") == 4)
    assert(dec(2L).getAs[Int]("ndim") == 3) // stub
    assert(dec(2L).getAs[Int]("bitpix") == 8)
  }

  test("residual IVFPQ separates within-cluster neighbors raw PQ cannot") {
    // 8 tight clusters in 16-d: every member of a cluster quantizes to
    // (nearly) the same raw-vector PQ code, so raw ADC cannot rank
    // within the cluster — which is where ALL the true neighbors live.
    // Residual codes (v − centroid) put the codebook's resolution on
    // exactly that geometry.
    val rnd = new scala.util.Random(11)
    val dim = 16; val nClusters = 8
    val centers = Array.fill(nClusters, dim)((rnd.nextGaussian() * 8).toFloat)
    val rows = (0 until 800).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, Seq.tabulate(dim)(j =>
        c(j) + (rnd.nextGaussian() * 0.3).toFloat))
    }
    val df = rows.toDF("vec_id", "emb").repartition(4)
    val queries = (0 until 8).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, Seq.tabulate(dim)(j =>
        c(j) + (rnd.nextGaussian() * 0.3).toFloat))
    }
    val qdf = queries.toDF("_qid", "_qvec")
    val k = 5
    val truth = VectorSearch
      .batchTopK(df, "emb", "vec_id", qdf, "_qid", "_qvec", "l2", k,
        exact = true)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(hits: org.apache.spark.sql.DataFrame): Double = {
      val got = hits.select("query_id", "vec_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      queries.map { case (q, _) =>
        truth(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / k
      }.sum / queries.size
    }
    val (assigned, centroids) =
      VectorSearch.ivfBuild(df, "emb", "vec_id", nlist = nClusters,
        refineIters = 2)
    val rawModel = VectorSearch.pqTrain(df, "emb", "vec_id", m = 8,
      k = 32, refineIters = 2)
    val rawEnc = VectorSearch.pqEncode(assigned, "emb", rawModel)
    val rawRecall = recall(VectorSearch.ivfPqBatchTopK(rawEnc, centroids,
      "emb", "vec_id", rawModel, queries, k, nprobe = 2, rerank = 30))
    val (resEnc, resModel) = VectorSearch.ivfPqResidualBuild(
      assigned, centroids, "emb", "vec_id", m = 8, k = 32,
      refineIters = 2)
    val resRecall = recall(VectorSearch.ivfPqResidualBatchTopK(resEnc,
      centroids, "emb", "vec_id", resModel, queries, k, nprobe = 2,
      rerank = 30))
    // the DRAMATIC raw-PQ collapse needs clusters far wider than the
    // rerank pool (RecallSoak at 100k rows: 0.17 raw vs 0.93 residual);
    // at this spec's scale the pinned claims are the floor and the
    // strict ordering
    assert(resRecall >= 0.9, s"residual recall@5 $resRecall must hold")
    assert(resRecall > rawRecall,
      s"residual ($resRecall) must beat raw-vector PQ ($rawRecall) " +
        "on clustered data")
    // residual codes round-trip the raw vector for reranking: the output
    // score is the EXACT distance, so top-1 for a query drawn exactly at
    // a corpus point is that point
    val exactQ = Seq((99L, rows(42)._2))
    val hit = VectorSearch.ivfPqResidualBatchTopK(resEnc, centroids,
      "emb", "vec_id", resModel, exactQ, 1, nprobe = 2, rerank = 30)
      .select("vec_id").as[Long].head()
    assert(hit == 42L, s"self-query must return itself, got $hit")
  }

  test("IVF/PQ batch search: one pass per batch matches per-query search") {
    val df = vecs(400, 16)
    val queries = (0L until 4L).map(qid =>
      qid -> df.filter($"vec_id" === qid).head().getSeq[Float](1))
    val (assigned, centroids) =
      VectorSearch.ivfBuild(df, "embedding", "vec_id", nlist = 8)
    val ivfBatch = VectorSearch.ivfBatchTopK(assigned, centroids,
      "embedding", "vec_id", queries, "l2", k = 10, nprobe = 3)
    queries.foreach { case (qid, q) =>
      val single = VectorSearch.ivfTopK(assigned, centroids, "embedding",
          "vec_id", q, "l2", k = 10, nprobe = 3)
        .select("vec_id").as[Long].collect().toSeq
      val batch = ivfBatch.filter($"query_id" === qid).orderBy("rank")
        .select("vec_id").as[Long].collect().toSeq
      assert(batch == single, s"IVF qid=$qid")
    }
    val model = VectorSearch.pqTrain(df, "embedding", "vec_id", m = 4, k = 32)
    val encoded = VectorSearch.pqEncode(df, "embedding", model)
    // both rerank modes: pure ADC ranking and ADC-candidates + exact re-rank
    for (rerank <- Seq(0, 100)) {
      val pqBatch = VectorSearch.pqBatchTopK(encoded, "embedding", "vec_id",
        model, queries, k = 10, rerank = rerank)
      queries.foreach { case (qid, q) =>
        val single = VectorSearch.pqTopK(encoded, "embedding", "vec_id",
            model, q, topK = 10, rerank = rerank)
          .select("vec_id").as[Long].collect().toSeq
        val batch = pqBatch.filter($"query_id" === qid).orderBy("rank")
          .select("vec_id").as[Long].collect().toSeq
        assert(batch == single, s"PQ rerank=$rerank qid=$qid")
      }
    }
    // IVFPQ scans cell-assigned PQ codes (cell pruning + ADC)
    val cellEncoded = VectorSearch.pqEncode(assigned, "embedding", model)
    val ivfPqBatch = VectorSearch.ivfPqBatchTopK(cellEncoded, centroids,
      "embedding", "vec_id", model, queries, k = 10, nprobe = 3,
      rerank = 100)
    queries.foreach { case (qid, q) =>
      val single = VectorSearch.ivfPqTopK(cellEncoded, centroids, "embedding",
          "vec_id", model, q, k = 10, nprobe = 3, rerank = 100)
        .select("vec_id").as[Long].collect().toSeq
      val batch = ivfPqBatch.filter($"query_id" === qid).orderBy("rank")
        .select("vec_id").as[Long].collect().toSeq
      assert(batch == single, s"IVFPQ qid=$qid")
    }
  }

  test("partScans width guard: past maxParts the caller falls back (shuffled path)") {
    val df = vecs(200, 8)
    val dir = tmpDir("partguard") + "/idx"
    Hnsw.build(df, "embedding", "vec_id", numPartitions = 8)
      .write.partitionBy("part").parquet(dir)
    // within the guard: exchange-free scans exist and search matches
    val q0 = df.filter($"vec_id" === 0L).head().getSeq[Float](1)
    assert(PartitionedIndex.partScans(spark, dir).isDefined)
    // past the guard: partScans declines (None) — the callers'
    // `.getOrElse(shuffled path)` then takes over; both paths agree, so
    // crossing the guard threshold can never change results
    assert(PartitionedIndex.partScans(spark, dir, maxParts = 4).isEmpty)
    val exchangeFree = Hnsw.topKPersisted(spark, dir, q0, 10, ef = 200)
      .select("ext_id").as[Long].collect().toSeq
    val shuffled = Hnsw.topK(spark.read.parquet(dir), q0, 10, ef = 200)
      .select("ext_id").as[Long].collect().toSeq
    assert(exchangeFree == shuffled)
  }

  test("recallAudit: containment counting, tie robustness, family verdict") {
    import graft.catalog.VectorQueries
    val e = vecs(30, 8)
    val queries = e.filter($"vec_id" < 2L)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
    // a perfect result: the exact top-3 per query (computed brute-force)
    def exactTop(q: Long, k: Int): Seq[Long] =
      VectorSearch.bruteForceTopK(e,
          "embedding", "vec_id",
          e.filter($"vec_id" === q).head().getSeq[Float](1), "l2", k,
          exact = true)
        .select("vec_id").as[Long].collect().toSeq
    val perfect = (0L to 1L).flatMap(q => exactTop(q, 3).map(v => ("fam", q, v)))
      .toDF("idx", "qid", "vec_id")
    val audit = VectorQueries.recallAudit(e, perfect, queries, k = 3,
      minHits = Map("fam" -> 6))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(audit.length == 2 && audit.forall(_._5), "perfect recall passes at 6/6")
    assert(audit.forall(_._3 == 3), "returned = k")
    // kth distance column matches an independent brute-force computation
    val kth0 = VectorSearch.bruteForceTopK(e, "embedding", "vec_id",
        e.filter($"vec_id" === 0L).head().getSeq[Float](1), "l2", 3,
        exact = true)
      .select("score").as[Long].collect().max
    assert(audit.find(_._2 == 0L).get._4 == kth0)
    // family verdict: replace ONE query's hits with garbage (farthest
    // ids) — family total drops to 3, so minHits=6 fails BOTH rows while
    // minHits=3 still passes (the verdict is family-level, not per-query)
    val q1lit = array(queries.find(_._1 == 1L).get._2.map(x => lit(x)): _*)
    val far = e
      .withColumn("_l2", graft.functions.VectorFunctions
        .l2SqScaled($"embedding", q1lit))
      .orderBy($"_l2".desc).limit(3)
      .select(lit("fam").as("idx"), lit(1L).as("qid"), $"vec_id")
    val mixed = exactTop(0L, 3).map(v => ("fam", 0L, v))
      .toDF("idx", "qid", "vec_id").unionByName(far)
    val strict = VectorQueries.recallAudit(e, mixed, queries, k = 3,
      minHits = Map("fam" -> 6)).as[(String, Long, Long, Long, Boolean)].collect()
    assert(strict.forall(!_._5), "family total 3 < 6 fails every row")
    // two-tier verdict: even when the family sum passes, the zero-recall
    // query fails its own row (≥1 true neighbor per query) — garbage for
    // one query can no longer hide inside a passing batch
    val loose = VectorQueries.recallAudit(e, mixed, queries, k = 3,
      minHits = Map("fam" -> 3)).as[(String, Long, Long, Long, Boolean)].collect()
    assert(loose.find(_._2 == 0L).get._5,
      "family total 3 >= 3 and >=1 hit: query 0 passes")
    assert(!loose.find(_._2 == 1L).get._5,
      "zero-recall query fails despite a passing family sum")
  }
}
