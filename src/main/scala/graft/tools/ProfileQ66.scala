package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.{TextFunctions => T}

/** Scratch profiling harness for the q66 MinHash-LSH path (round-3 perf
  * work). Not part of the public surface.
  */
object ProfileQ66 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val df = Tables.load(spark, sfDir, "documents")
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val sig = Dedup.minHashSignature(df, "text", 32, 3)
      time("signature.count")(sig.count())
      val cand = Dedup.lshCandidates(sig, "doc_id", 32, 8)
      time("candidates.count")(println("    candidates: " + cand.count()))
      // bucket-size histogram
      val bandCols = transform(sequence(lit(0), lit(7)),
        b => struct(b.as("band"),
          hash(slice(col("_mh"), b * lit(4) + lit(1), lit(4))).as("bucket")))
      val buckets = sig.select(col("doc_id"), explode(bandCols).as("_bb"))
        .select(col("doc_id"), col("_bb.band").as("band"), col("_bb.bucket").as("bucket"))
        .groupBy("band", "bucket").count()
      time("bucket histogram") {
        buckets.groupBy().agg(
          count(lit(1)).as("n_buckets"), max("count").as("max_sz"),
          sum(when(col("count") >= 2, col("count") * (col("count") - 1) / 2)
            .otherwise(0)).as("total_pairs")).show()
      }
      val full = Dedup.minHashLsh(df, "text", "doc_id", 32, 8, 3, 0.5)
      time("full minHashLsh.count")(println("    result: " + full.count()))
    }
    spark.stop()
  }
}
