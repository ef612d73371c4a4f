package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional filter (args = query names) for isolated profiling runs.
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Per-query untimed warm-up: the first execution of a query pays its
      // own whole-stage-codegen compilation + JIT (measured 2-6x the
      // steady-state time for expression-heavy queries), so the timed run
      // measures steady-state throughput. GC between queries lets the
      // ContextCleaner reap prior broadcast/shuffle state.
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      // GC enqueues async ContextCleaner work (broadcast/shuffle removal
      // RPCs); drain it BEFORE the timer so cleanup of earlier queries
      // doesn't run inside this query's measurement.
      System.gc()
      Thread.sleep(800)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
