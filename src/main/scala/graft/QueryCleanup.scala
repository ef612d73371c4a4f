package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}

/** Post-consumption cleanup registry for catalog queries that materialize
  * state outside the query result: temp table roots (format queries ingest
  * a parquet copy per run), streaming checkpoints, and memory-sink temp
  * views (which pin every streamed row in DRIVER memory until dropped).
  *
  * Queries register cleanups at build time; the entry points (Bench,
  * Verify) drain the registry AFTER fully consuming each result — outside
  * Bench's timed window. Without this, a multi-run 82-query suite accrues
  * gigabytes of dead temp tables and driver-held sink rows, and the
  * measured tail queries pay for earlier queries' garbage (r9: 78.8 s
  * in-suite vs 54.0 s clean for identical code).
  */
object QueryCleanup {
  private val pending =
    scala.collection.mutable.ArrayBuffer.empty[SparkSession => Unit]

  def register(f: SparkSession => Unit): Unit = synchronized { pending += f }

  /** Fresh temp dir whose recursive deletion is registered; returns a
    * not-yet-existing child path (the table root the query will create).
    */
  def tempRoot(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-$tag")
    registerDir(d.toString)
    d.toString + "/t"
  }

  def registerDir(path: String): Unit =
    register(_ => deleteRecursively(path))

  /** Drop a temp view on drain — used for streaming memory sinks, whose
    * rows stay referenced by the catalog entry until the view goes. */
  def registerTempView(name: String): Unit =
    register(s => { s.catalog.dropTempView(name); () })

  /** Drop a session-catalog table on drain — used by the named-table
    * query so repeated runs (Bench's min-of-n) start from a clean
    * catalog. The external table root is registered separately. */
  def registerTable(name: String): Unit =
    register(s => { s.sql(s"DROP TABLE IF EXISTS $name"); () })

  def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** Run and clear every registered cleanup. Failures are swallowed:
    * cleanup must never fail the query whose state it reaps. */
  def drain(spark: SparkSession): Unit = synchronized {
    pending.foreach(f => try f(spark) catch { case _: Throwable => () })
    pending.clear()
  }
}
