package org.apache.spark.sql.graftnative

import org.apache.spark.MapOutputTrackerMaster
import org.apache.spark.sql.SparkSession

/** `private[spark]` bridge for deterministic between-query state reaping
  * in long-lived benchmark/verify suites.
  *
  * Shuffle outputs are normally reclaimed by the ContextCleaner: the
  * ShuffleDependency must first be GC'd, then an async thread drains a
  * reference queue and removes the files NON-blockingly
  * (`spark.cleaner.referenceTracking.blocking.shuffle` defaults false).
  * Over an 83-query suite with 2–4 timed runs each, that pipeline lags
  * far behind: shuffle index/data files pile up in `spark.local.dir`
  * and driver-side ShuffleStatus maps grow monotonically, and the
  * queries that pay are precisely the suite's biggest shuffles (r10
  * measured one untouched query at 2.9× its isolated cost from exactly
  * this state). `purgeShuffles` removes every registered shuffle's
  * blocks/files BLOCKING and unregisters it from the driver's map-output
  * tracker — safe between queries, when no live plan can reference a
  * prior query's shuffle (caches cleared, persisted RDDs unpersisted).
  */
object SuiteReaper {

  /** Remove all registered shuffles' files + map-output state. Returns
    * the number of shuffles purged. Must only be called at a quiescent
    * point: after the previous query's actions completed and its
    * caches/persisted RDDs were dropped, before the next query plans.
    */
  def purgeShuffles(spark: SparkSession): Int = {
    val sc = spark.sparkContext
    sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster =>
        val ids = m.shuffleStatuses.keySet.toSeq
        ids.foreach { id =>
          // blocking=true: files are gone when this returns, so the next
          // timed window starts from a clean local dir
          try sc.env.blockManager.master.removeShuffle(id, true)
          catch { case _: Exception => () }
          m.unregisterShuffle(id)
        }
        ids.size
      case _ => 0 // executor-side tracker: nothing to purge from here
    }
  }
}
