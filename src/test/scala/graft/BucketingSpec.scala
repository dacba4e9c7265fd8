package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The point of bucketing: a fact⋈fact sort-merge join over two tables
  * bucketed on the join key must need NO shuffle exchange below the join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without shuffle below the join") {
    // disable broadcast + AQE so the bucketed sort-merge path is what's
    // planned even at the tiny test SF
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("bucketed_join_colocated")(spark, sf)
      val smj = df.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected a sort-merge join of the bucketed tables")
      val shufflesBelowJoin = smj.head.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed join still shuffles:\n${smj.head}")
      // and the result is still correct
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("grouping on the bucket key aggregates without a hash exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("agg_bucketed_no_shuffle")(spark, sf)
      // the only exchange allowed is the presentation sort's range
      // partitioning; the aggregate itself must consume the bucket
      // layout directly
      val hashExchanges = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("hashpartitioning") => e
      }
      assert(hashExchanges.isEmpty,
        s"bucket-key aggregation still hash-shuffles:\n${df.queryExecution.executedPlan.toString.take(3000)}")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
