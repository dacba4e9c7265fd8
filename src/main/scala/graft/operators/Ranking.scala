package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed top-k with dense 1..k ranks.
  *
  * `orderBy(keys).limit(k)` plans as TakeOrderedAndProject — each
  * partition keeps its own k candidates and one task merges the k·p
  * survivors — so no stage ever sorts the full input on a single
  * partition. The row_number window that then assigns ranks only ever
  * sees k rows (bounded metadata, not data). This is the scale-correct
  * substitute for `row_number() OVER (ORDER BY keys) <= k`, whose rank
  * pass is a whole-input single-partition sort.
  *
  * `keys` must form a TOTAL order (callers tiebreak on a unique id) or
  * the boundary rows at rank k are engine-dependent.
  */
object Ranking {
  def topKRanked(df: DataFrame, k: Int, rankCol: String,
      keys: Column*): DataFrame =
    df.orderBy(keys: _*).limit(k)
      .withColumn(rankCol,
        // constant-but-non-foldable partition key: one partition either
        // way over the k-row frame, but unlike an empty spec it draws no
        // "No Partition Defined" warning, and unlike lit(0) the
        // optimizer's EliminateWindowPartitions can't fold it away
        row_number().over(Window
          .partitionBy(pmod(hash(col(df.columns.head)), lit(1)))
          .orderBy(keys: _*))
          .cast("long"))
}
