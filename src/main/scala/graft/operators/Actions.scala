package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side action endpoints (SURVEY §2.1 S14/S15/S16): the explicit
  * engine↔driver boundary. The reference crosses it with `toPandas()`
  * inside its gold/ML step (realestate_pipeline.py:207) — an anti-pattern
  * inside a pipeline, so here collect is an EXPLICIT endpoint the caller
  * opts into with a mandatory row bound, never something a registered
  * query does internally.
  */
object Actions {

  /** S14: bounded collect-to-driver. `limit` is required — an unbounded
    * collect of a 100 TB table is a driver OOM, not a query plan.
    */
  def collectToDriver(df: DataFrame, limit: Int): Array[Row] =
    df.limit(limit).collect()

  /** S15: console preview (the reference's df.show() smoke,
    * read_data_from_minIO.py:18). Captures the rendering so callers/tests
    * can assert on it (Dataset.showString is private[sql]). */
  def preview(df: DataFrame, rows: Int = 20): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      df.show(rows, truncate = 20)
    }
    bos.toString("UTF-8")
  }

  /** S16: global count (sliver.py:140,158). */
  def count(df: DataFrame): Long = df.count()

  /** Pipeline observability via `Dataset.observe` (CollectMetrics): attach
    * named aggregate metrics to a plan and harvest them from the SAME pass
    * that materializes the data — how a production pipeline audits row
    * drops / null rates at 100 TB without a second scan. Returns the
    * observed metrics Row after running `action` on the instrumented frame.
    */
  def observeMetrics(df: DataFrame, name: String,
      metrics: Seq[org.apache.spark.sql.Column])(
      action: DataFrame => Unit): Map[String, Any] = {
    val observation = new org.apache.spark.sql.Observation(name)
    val instrumented = df.observe(observation, metrics.head, metrics.tail: _*)
    action(instrumented)
    observation.get
  }
}
