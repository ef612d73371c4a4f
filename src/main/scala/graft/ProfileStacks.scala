package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Driver-side wall-clock stack sampler for one named query (guide §7.3
  * applied continuously): samples EVERY live thread at a fixed interval
  * during one steady-state run and prints a histogram of collapsed
  * stacks, so driver gaps between jobs (planning, commit protocol,
  * metadata IO, streaming-engine machinery) become attributable — stage
  * metrics cannot see them.
  *
  * `sbt "runMain graft.ProfileStacks q121_format_cdc_rename"`
  */
object ProfileStacks {
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

    def reap(): Unit = {
      QueryCleanup.drain(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      org.apache.spark.sql.graftnative.SuiteReaper.purgeShuffles(spark)
    }

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count(); reap() // warmup
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(500)

      val hist = mutable.Map[String, Int]().withDefaultValue(0)
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, st) =>
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                t.getName != "stack-sampler") {
              // collapse to the deepest INTERESTING frames: skip pure
              // JVM/socket idle loops
              val frames = st.take(40).map(f =>
                s"${f.getClassName}.${f.getMethodName}")
              val isIdle = frames.headOption.exists(f =>
                f.contains("socketAccept") || f.contains("epollWait") ||
                f.contains("Object.wait") || f.contains("park") ||
                f.contains("SocketDispatcher.read"))
              if (!isIdle) {
                val sig = frames.filterNot(_.startsWith("java.lang.Thread"))
                  .take(14).mkString(" <- ")
                hist(t.getName.replaceAll("-\\d+$", "") + " | " + sig) += 1
              }
            }
          }
          Thread.sleep(10)
        }
      }, "stack-sampler")
      sampler.setDaemon(true)

      val t0 = System.nanoTime()
      sampler.start()
      val n = fn(spark, sfDir).count()
      sampling = false
      val wall = (System.nanoTime() - t0) / 1e9
      sampler.join(1000)
      println(f"\n######## $name: $wall%.3f s, $n rows, " +
        s"${hist.values.sum} samples ########")
      hist.toSeq.sortBy(-_._2).take(40).foreach { case (sig, c) =>
        println(f"$c%5d  $sig")
      }
      reap()
    }
    spark.stop()
  }
}
