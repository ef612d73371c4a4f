package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway microbench (r21 optimization round). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val d = Tables.load(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    d.count()
    (1 to 5).foreach { i =>
      time(s"simHash60Md5 x$i")(
        d.select(Dedup.simHash60Md5(col("text")).as("f"))
          .write.format("noop").mode("overwrite").save())
    }
    (1 to 3).foreach { i =>
      time(s"tokens-only x$i")(
        d.select(size(graft.functions.TextFunctions.tokens(col("text"))).as("f"))
          .write.format("noop").mode("overwrite").save())
    }
    (1 to 3).foreach { i =>
      time(s"plain md5 x$i")(
        d.select(md5(col("text")).as("f"))
          .write.format("noop").mode("overwrite").save())
    }
    // pure JVM baseline: md5 of every token, single thread
    val texts = d.select("text").collect().map(_.getString(0))
    val mdd = java.security.MessageDigest.getInstance("MD5")
    (1 to 3).foreach { i =>
      time(s"jvm single-thread md5-per-token x$i") {
        var acc = 0L
        texts.foreach { t =>
          t.split(' ').foreach { tok =>
            if (tok.nonEmpty) {
              val dd = mdd.digest(tok.getBytes("UTF-8"))
              acc += dd(0)
            }
          }
        }
        acc
      }
    }
    spark.stop()
  }
}
