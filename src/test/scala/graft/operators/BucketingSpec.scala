package graft.operators

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed join plans without a shuffle exchange") {
    val fact = (1L to 1000L).map(i => (i % 100, s"f$i")).toDF("k", "fv")
    val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "dv")
    Bucketing.writeBucketed(fact, "bspec_fact", 4, Seq("k"))
    Bucketing.writeBucketed(dim, "bspec_dim", 4, Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cobucketedJoin(spark, "bspec_fact", "bspec_dim",
        Seq("k"))
      assert(joined.count() == 1000)
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      assert(!physical.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$physical")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_fact")
      spark.sql("DROP TABLE IF EXISTS bspec_dim")
    }
  }
}
