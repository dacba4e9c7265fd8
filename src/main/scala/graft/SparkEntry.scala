package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented capability from SURVEY.md §2 is a named entry in
  * [[queries]]; where the semantics are ANSI-SQL-expressible, [[oracleSql]]
  * carries the equivalent SQL the driver runs in DuckDB over the same
  * parquet tables (hash-compared, columns sorted by name).
  */
object SparkEntry {

  private[graft] val modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.SqlSurface,
    operators.Medallion,
    operators.Dedup,
    operators.Similarity,
    operators.TextAnalysis,
    operators.Curation,
    operators.Multimodal,
    operators.Typed,
    operators.Analytics,
    operators.Catalog,
    operators.Scale,
    operators.Learn,
    sources.Roundtrip,
    streaming.Streams)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-table revenue-by-region join — scan, pushed filter, broadcast
    * dims, hash agg, sort (SURVEY.md §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame =
    queries("flagship_revenue_by_region")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-seeded sketches, approximate ops) → driver records a weaker
    * rows-only check; those are pinned by ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
