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
        row_number().over(Window.orderBy(keys: _*)).cast("long"))
}
