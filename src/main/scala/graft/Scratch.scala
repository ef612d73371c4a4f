package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, KnnJoin, Vamana}

/** Throwaway decomposition harness for optimization profiling (r21).
  * Not a declared query; deleted or inert when the round closes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", sys.env.getOrElse("SCRATCH_SER", "org.apache.spark.serializer.JavaSerializer"))
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val e = Tables.load(spark, sfDir, "embeddings")
    val qdf = e.filter(col("vec_id") < 500L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pin(df: org.apache.spark.sql.DataFrame) = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    // warm the page cache / codegen
    e.count(); qdf.count()

    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val hIdx = time("hnsw build+pin")(pin(Hnsw.build(e, "embedding",
        "vec_id", numPartitions = 8, clustered = true)))
      val vIdx = time("vamana build+pin")(pin(Vamana.build(e, "embedding",
        "vec_id", numPartitions = 8, clustered = true)))
      val h = KnnJoin.hnsw(hIdx, qdf, "qid", "qv", k = 5, probeParts = 4)
      time("hnsw knn join")(h.write.format("noop").mode("overwrite").save())
      val v = KnnJoin.vamana(vIdx, qdf, "qid", "qv", k = 5, rerank = 64,
        probeParts = 4)
      time("vamana knn join")(v.write.format("noop").mode("overwrite").save())
      // audit kth subtree
      import graft.functions.{VectorFunctions => V}
      import org.apache.spark.sql.expressions.Window
      val kth = e.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(qdf))
        .withColumn("_l2", V.l2SqScaled(col("embedding"), col("qv")))
        .select(col("qid"), col("vec_id"), col("_l2"))
        .withColumn("_r", row_number().over(Window.partitionBy("qid")
          .orderBy(col("_l2").asc, col("vec_id").asc)))
        .filter(col("_r") === 5)
        .select(col("qid"), col("_l2").as("_kth"))
      time("audit kth subtree")(
        kth.write.format("noop").mode("overwrite").save())
      val full = SparkEntry.queries("q132_vector_knn_join")(spark, sfDir)
      time("q132 full")(full.count())
      hIdx.unpersist(false); vIdx.unpersist(false)
      QueryCleanup.drain(spark)
      spark.catalog.clearCache()
      org.apache.spark.sql.graftnative.SuiteReaper.purgeShuffles(spark)
    }
    spark.stop()
  }
}
