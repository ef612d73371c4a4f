package org.apache.spark.sql.graftnative

import org.apache.spark.SparkContext

/** Test-only access to the LIVE SparkContext conf (`sc.conf` is
  * `private[spark]`; `sc.getConf` hands back a copy, which is useless
  * when a test needs `SparkSession.getOrCreate` to see the change —
  * extensions are read from the live conf at session creation).
  */
object TestSparkConf {
  def set(sc: SparkContext, key: String, value: String): Unit =
    sc.conf.set(key, value)
  def remove(sc: SparkContext, key: String): Unit =
    sc.conf.remove(key)
}
