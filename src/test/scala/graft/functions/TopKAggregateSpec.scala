package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[NativeExpressions.topKPairs]] must be EXACTLY the window it
  * replaces (`row_number over partitionBy(group) orderBy(score, id)`),
  * including tie order, null-score placement, long-vs-double score
  * comparison, and groups smaller than k — the batched vector searches
  * swap the window for it to get map-side partial combine, and any
  * divergence would silently break the q133/q134 exact oracles.
  */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: DataFrame, k: Int, asc: Boolean) = {
    val ord = if (asc) col("score").asc_nulls_last
              else col("score").desc_nulls_last
    df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(ord, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("g"), col("id"), col("score"), col("rank"))
      .as[(Int, Long, Option[Double], Int)].collect().toSeq.sorted
  }

  private def viaAgg(df: DataFrame, k: Int, asc: Boolean) =
    df.groupBy(col("g"))
      .agg(NativeExpressions.topKPairs(col("score"), col("id"), k, asc)
        .as("_tk"))
      .select(col("g"), posexplode(col("_tk")).as(Seq("_pos", "_hit")))
      .select(col("g"), col("_hit.ext_id").as("id"),
        col("_hit.score").as("score"),
        (col("_pos") + 1).cast("int").as("rank"))
      .as[(Int, Long, Option[Double], Int)].collect().toSeq.sorted

  test("agg ≡ window on random doubles with ties, nulls, small groups") {
    val rnd = new scala.util.Random(4217)
    for (trial <- 0 until 4; asc <- Seq(true, false)) {
      val k = Seq(1, 3, 5, 17)(trial)
      val rows = (0 until 3000).map { i =>
        val g = rnd.nextInt(40) // group 39 often has < k rows
        val score: Option[Double] =
          if (rnd.nextInt(20) == 0) None
          else Some((rnd.nextInt(50) - 25) / 8.0) // heavy ties
        (g, i.toLong, score)
      } ++ (0 until 5).map(i => (99, i.toLong, None: Option[Double]))
      val df = rows.toDF("g", "id", "score").repartition(7)
      assert(viaAgg(df, k, asc) === viaWindow(df, k, asc),
        s"trial $trial asc=$asc diverged")
    }
  }

  test("long scores compare exactly past double precision") {
    // 2^53 + {0,1}: double rounds both to the same value — long must not
    val big = 9007199254740992L
    val df = Seq((1, 10L, big + 1), (1, 11L, big), (1, 12L, big + 3))
      .toDF("g", "id", "score")
    val got = df.groupBy(col("g"))
      .agg(NativeExpressions.topKPairs(col("score"), col("id"), 2,
        asc = true).as("_tk"))
      .select(posexplode(col("_tk")).as(Seq("_pos", "_hit")))
      .select(col("_hit.ext_id"), col("_hit.score"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((11L, big), (10L, big + 1)),
      s"long grid rounded through double: $got")
  }

  test("-0.0 ties +0.0 like SQL ordering; the id breaks the tie") {
    // Double.compare would rank -0.0 below +0.0 and jump the id
    // tie-break; the aggregate normalizes the zeros like SQL does
    val df = Seq((1, 5L, 0.0), (1, 9L, -0.0), (2, 9L, -0.0), (2, 5L, 0.0))
      .toDF("g", "id", "score")
    val got = df.groupBy(col("g"))
      .agg(NativeExpressions.topKPairs(col("score"), col("id"), 1,
        asc = true).as("_tk"))
      .select(col("g"), posexplode(col("_tk")).as(Seq("_pos", "_hit")))
      .select(col("g"), col("_hit.ext_id"))
      .as[(Int, Long)].collect().toSeq.sorted
    assert(got === Seq((1, 5L), (2, 5L)), s"-0.0 outranked the id tie: $got")
  }

  test("null ids are dropped; all-null-score groups emit ids ascending") {
    val df = Seq((1, Some(7L), Some(1.0)), (1, None, Some(0.5)),
        (2, Some(3L), None), (2, Some(1L), None), (2, Some(2L), None))
      .toDF("g", "id", "score")
    val got = df.groupBy(col("g"))
      .agg(NativeExpressions.topKPairs(col("score"), col("id"), 2,
        asc = true).as("_tk"))
      .select(col("g"), posexplode(col("_tk")).as(Seq("_pos", "_hit")))
      .select(col("g"), col("_hit.ext_id"))
      .as[(Int, Long)].collect().toSeq.sorted
    assert(got === Seq((1, 7L), (2, 1L), (2, 2L)))
  }

  test("batchTopK membership is id-type independent for null ids") {
    // topKPerGroup takes the aggregate for integral ids (null ids can't
    // ride the long slot → dropped) and the window for everything else —
    // the fallback must drop null-id rows too, or the same corpus would
    // return different top-k membership depending on the id column's
    // TYPE (a window's `id asc` ranks nulls FIRST, so an unfiltered
    // null-id row would even displace a real neighbor at a score tie)
    val corpusLong = Seq((Some(10L), Seq(1.0f, 0.0f)),
        (None, Seq(1.0f, 0.0f)), (Some(11L), Seq(0.0f, 1.0f)))
      .toDF("id", "emb")
    val corpusStr = Seq((Some("a10"), Seq(1.0f, 0.0f)),
        (Option.empty[String], Seq(1.0f, 0.0f)),
        (Some("a11"), Seq(0.0f, 1.0f)))
      .toDF("id", "emb")
    val q = Seq((1L, Seq(1.0f, 0.0f))).toDF("qid", "qv")
    val gotLong = graft.operators.VectorSearch.batchTopK(
        corpusLong, "emb", "id", q, "qid", "qv", "cosine", 2)
      .select("id").as[Long].collect().toSet
    val gotStr = graft.operators.VectorSearch.batchTopK(
        corpusStr, "emb", "id", q, "qid", "qv", "cosine", 2)
      .select("id").as[String].collect().toSet
    assert(gotLong === Set(10L, 11L),
      s"aggregate path must drop the null-id row: $gotLong")
    assert(gotStr === Set("a10", "a11"),
      s"window fallback must drop the null-id row: $gotStr")
  }
}
