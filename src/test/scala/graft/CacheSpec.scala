package graft

import org.apache.spark.sql.functions._

/** Caching surface for the BI layer (repeated dashboard queries over the
  * same gold view hit memory, not parquet).
  */
class CacheSpec extends SparkSpec {

  test("cached view scans from memory and uncaches cleanly") {
    Tables.load(spark, sf, "nation").createOrReplaceTempView("nation_cached")
    spark.catalog.cacheTable("nation_cached")
    try {
      val df = spark.table("nation_cached")
        .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // AQE wraps cached scans in TableCacheQueryStage; non-AQE plans show
      // InMemoryTableScan directly
      assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
        s"not served from cache:\n$p")
    } finally {
      spark.catalog.uncacheTable("nation_cached")
      assert(!spark.catalog.isCached("nation_cached"))
    }
  }
}
