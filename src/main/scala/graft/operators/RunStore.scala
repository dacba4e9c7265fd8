package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXPERIMENT-TRACKING SINK — the engine-side analog of the reference's
  * MLflow logging step (reference: airflow/dags/realestate_pipeline.py:
  * 197,232-235 — mlflow.log_param / log_metric / log_model around the
  * RandomForest train). Instead of an external tracking server, runs are
  * lakehouse-native append-only parquet tables under the warehouse,
  * queryable by every surface the engine already has (DataFrame API, SQL
  * views, graft.Serve JDBC):
  *
  *   <root>/runs      (run_id, algo)
  *   <root>/params    (run_id, param, value)   — strings, MLflow-style
  *   <root>/metrics   (run_id, metric, value)  — doubles
  *
  * Scale stance: a logged metrics set is MODEL-sized (the one-row fit
  * summaries the Learn family produces), never data-sized — each log()
  * is a metadata-scale append whose cost is independent of the training
  * corpus, and the read side is a plain parquet scan. A production
  * deployment partitions runs/ by date and compacts small files
  * (compact_small_files is the operator for exactly that); the schema
  * does not change.
  */
object RunStore {

  /** Drop the whole store (deterministic replay for oracled queries). */
  def reset(s: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Append one run: identity + string params + the metrics row. The
    * metrics frame is unpivoted ENGINE-side (map + explode over its
    * numeric columns) — no collect; the model row never crosses the
    * driver. */
  def log(s: SparkSession, root: String, runId: String, algo: String,
      params: Seq[(String, String)], metricsRow: DataFrame): Unit = {
    import s.implicits._
    s.range(1).select(lit(runId).as("run_id"), lit(algo).as("algo"))
      .write.mode("append").parquet(s"$root/runs")
    params.toDF("param", "value")
      .select(lit(runId).as("run_id"), col("param"), col("value"))
      .write.mode("append").parquet(s"$root/params")
    val kvs = metricsRow.columns
      .flatMap(c => Seq(lit(c), col(c).cast("double")))
    metricsRow.select(explode(map(kvs.toIndexedSeq: _*)))
      .toDF("metric", "value")
      .select(lit(runId).as("run_id"), col("metric"), col("value"))
      .write.mode("append").parquet(s"$root/metrics")
    // the Serve catalog tables (registerViews) cache their resolved
    // file listing in the session's tableRelationCache, so a long-lived
    // JDBC/BI session could miss runs appended after it first queried —
    // refresh the ledger tables whenever they are registered.
    Seq("ml_runs", "ml_params", "ml_metrics")
      .filter(s.catalog.tableExists)
      .foreach(t => s.sql(s"REFRESH TABLE $t"))
  }

  /** Append SEVERAL runs in one commit per table (round-16
    * optimization): each [[log]] call costs three parquet write jobs —
    * commit-protocol latency, not data — so a caller logging a batch of
    * runs (ml_runs_log logs two) pays 3 jobs instead of 3·k. Ledger
    * content is identical to k sequential [[log]] calls: the tables are
    * unordered append-only sets and every row carries its run_id. */
  def logAll(s: SparkSession, root: String,
      runs: Seq[(String, String, Seq[(String, String)], DataFrame)]): Unit = {
    import s.implicits._
    runs.map { case (runId, algo, _, _) =>
      s.range(1).select(lit(runId).as("run_id"), lit(algo).as("algo"))
    }.reduce(_ unionByName _)
      .write.mode("append").parquet(s"$root/runs")
    runs.map { case (runId, _, params, _) =>
      params.toDF("param", "value")
        .select(lit(runId).as("run_id"), col("param"), col("value"))
    }.reduce(_ unionByName _)
      .write.mode("append").parquet(s"$root/params")
    runs.map { case (runId, _, _, metricsRow) =>
      val kvs = metricsRow.columns
        .flatMap(c => Seq(lit(c), col(c).cast("double")))
      metricsRow.select(explode(map(kvs.toIndexedSeq: _*)))
        .toDF("metric", "value")
        .select(lit(runId).as("run_id"), col("metric"), col("value"))
    }.reduce(_ unionByName _)
      .write.mode("append").parquet(s"$root/metrics")
    Seq("ml_runs", "ml_params", "ml_metrics")
      .filter(s.catalog.tableExists)
      .foreach(t => s.sql(s"REFRESH TABLE $t"))
  }

  /** The queryable run ledger: runs ⋈ metrics, plus the per-run param
    * count (broadcast — runs/params are metadata-sized). */
  def snapshot(s: SparkSession, root: String): DataFrame = {
    val runs = s.read.parquet(s"$root/runs")
    val metrics = s.read.parquet(s"$root/metrics")
    val nParams = s.read.parquet(s"$root/params")
      .groupBy("run_id").agg(count(lit(1)).as("n_params"))
    runs.join(metrics, "run_id")
      .join(broadcast(nParams), Seq("run_id"), "left")
      .select(col("run_id"), col("algo"),
        coalesce(col("n_params"), lit(0L)).as("n_params"),
        col("metric"), round(col("value"), 6).as("value"))
  }

  /** Expose the store to SQL/JDBC clients (graft.Serve calls this when
    * the store exists, making runs BI-queryable like any other table).
    * Registered as CATALOG-level external parquet tables, not temp
    * views: temp views are session state, and in HiveServer2
    * multi-session mode (the default; each JDBC connection owns its
    * session) a fresh BI connection would not see them — ServeSpec's
    * parallel-session case pins exactly this. Dropping an external
    * table never deletes the ledger files. */
  def registerViews(s: SparkSession, root: String): Unit =
    Seq("runs" -> "ml_runs", "params" -> "ml_params",
      "metrics" -> "ml_metrics").foreach { case (d, v) =>
      s.catalog.dropTempView(v) // a stale temp view would shadow
      s.sql(s"DROP TABLE IF EXISTS $v")
      s.sql(s"CREATE TABLE $v USING parquet LOCATION '$root/$d'")
    }

  /** Default store location for a given data dir. */
  def defaultRoot(dir: String): String =
    s"${graft.Tables.scratchRoot}/mlruns/${new java.io.File(dir).getName}"
}
