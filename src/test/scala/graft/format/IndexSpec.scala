package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Index lifecycle bound to the versioned format (reference
  * create_index_vectorized / create_vector_index + staleness rules).
  */
class IndexSpec extends SparkSpec {
  import spark.implicits._

  private def table(): GraftDataset = {
    val ds = GraftDataset.create(spark, tmpDir("idx"), StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("emb", ArrayType(FloatType)))))
    ds.append(Seq(
      (1L, "spark vector search", Seq(1.0f, 0.0f, 0.0f)),
      (2L, "inverted index shards", Seq(0.0f, 1.0f, 0.0f)),
      (3L, "vector index probes", Seq(0.9f, 0.1f, 0.0f)))
      .toDF("id", "text", "emb"))
    ds.commit("rows")
    ds
  }

  test("inverted index: build, fresh search, stale fallback parity") {
    val ds = table()
    ds.createIndexVectorized("text")
    assert(ds.indexFresh("inverted", "text"))
    assert(ds.textSearch("text", "vector index").select("id")
      .as[Long].collect().toSet == Set(3L))
    // append → HEAD moves → index stale → scan fallback gives same answers
    ds.append(Seq((4L, "fresh vector index row", Seq(0f, 0f, 1f)))
      .toDF("id", "text", "emb"))
    ds.commit("more")
    assert(!ds.indexFresh("inverted", "text"))
    assert(ds.textSearch("text", "vector index").select("id")
      .as[Long].collect().toSet == Set(3L, 4L))
    // rebuild → indexed again, includes the new row
    ds.createIndexVectorized("text")
    assert(ds.indexFresh("inverted", "text"))
    assert(ds.textSearch("text", "vector index").select("id")
      .as[Long].collect().toSet == Set(3L, 4L))
  }

  test("incremental index update: appends indexed as a delta, updates rebuild") {
    val ds = table()
    ds.createIndexVectorized("text")
    ds.append(Seq((4L, "delta vector postings", Seq(0f, 0f, 1f)))
      .toDF("id", "text", "emb"))
    ds.commit("append")
    assert(!ds.indexFresh("inverted", "text"))
    ds.updateIndexVectorized("text") // append-only → delta build
    assert(ds.indexFresh("inverted", "text"))
    assert(ds.textSearch("text", "vector").select("id")
      .as[Long].collect().toSet == Set(1L, 3L, 4L))
    // in-place update cannot be expressed as a posting delta → rebuild,
    // and the OLD tokens must stop matching
    ds.update($"id" === 1L, Map("text" -> lit("renamed entirely")))
    ds.commit("edit")
    ds.updateIndexVectorized("text")
    assert(ds.indexFresh("inverted", "text"))
    assert(ds.textSearch("text", "vector").select("id")
      .as[Long].collect().toSet == Set(3L, 4L))
    assert(ds.textSearch("text", "renamed").select("id")
      .as[Long].collect().toSet == Set(1L))
  }

  test("incremental vector index update assigns new rows to existing cells") {
    val ds = table()
    ds.createVectorIndex("emb", nlist = 2)
    ds.append(Seq((5L, "new", Seq(1.0f, 0.01f, 0f))).toDF("id", "text", "emb"))
    ds.commit("append")
    ds.updateVectorIndex("emb")
    assert(ds.indexFresh("vector", "emb"))
    val top = ds.vectorSearch("emb", Seq(1.0f, 0.0f, 0.0f), k = 2,
      metric = "cosine", nprobe = 2)
    assert(top.count() == 2) // new row is findable through the index
  }

  test("optimizeIndex and reshardIndex preserve answers and bindings") {
    val ds = table()
    ds.createIndexVectorized("text", numShards = 4)
    // fragment the postings with incremental updates
    ds.append(Seq((4L, "vector probes extra", Seq(0f, 0f, 1f)))
      .toDF("id", "text", "emb"))
    ds.commit("a1")
    ds.updateIndexVectorized("text", numShards = 4)
    val expected = ds.textSearch("text", "vector").select("id")
      .as[Long].collect().toSet
    ds.optimizeIndex("text")
    assert(ds.indexFresh("inverted", "text")) // binding preserved
    assert(ds.textSearch("text", "vector").select("id")
      .as[Long].collect().toSet == expected)
    ds.reshardIndex("text", 8)
    assert(ds.textSearch("text", "vector").select("id")
      .as[Long].collect().toSet == expected) // shard routing at new count
    // sizeApprox reflects live manifest bytes
    assert(ds.sizeApprox > 0L)
  }

  test("index-aware rule: same answers, plan flips to a semi-join") {
    val ds = table()
    ds.createIndexVectorized("text")
    val expected = Set(3L) // "vector index" → only doc 3 has both tokens
    // without the rule: predicate evaluates as a scan, no semi-join
    val scan = ds.filterIndexed("text", "vector index")
    assert(scan.select("id").as[Long].collect().toSet == expected)
    assert(!scan.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    // with the rule installed: rewritten to a posting-table semi-join
    org.apache.spark.sql.graftnative.GraftExtensions.install(spark)
    val routed = ds.filterIndexed("text", "vector index")
    assert(routed.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(routed.select("id").as[Long].collect().toSet == expected)
    // complex OR query through the rule
    val both = ds.filterIndexed("text", "vector index||inverted shards")
    assert(both.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("vector index: build, probe search, stale guard") {
    val ds = table()
    ds.createVectorIndex("emb", nlist = 2)
    val hits = ds.vectorSearch("emb", Seq(1.0f, 0.05f, 0.0f), k = 2,
      metric = "cosine", nprobe = 2)
    val ids = hits.join(ds.toDF.withColumn("rid", monotonically_increasing_id()),
      lit(true), "inner") // just check shape + determinism of top hit
    assert(hits.count() == 2)
    ds.append(Seq((9L, "x", Seq(0f, 0f, 0f))).toDF("id", "text", "emb"))
    ds.commit("invalidate")
    intercept[IllegalArgumentException](
      ds.vectorSearch("emb", Seq(1.0f, 0.0f, 0.0f), k = 1))
  }
}
