package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Bridge into `Dataset.ofRows` (private[sql]) so the engine can expose
  * custom logical operators (graft.plans.*) as DataFrames. Lives under
  * `org.apache.spark.sql` for access only — the standard extension-library
  * pattern; no Spark internals are modified.
  */
object Shim {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
