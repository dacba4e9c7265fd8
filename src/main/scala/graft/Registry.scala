package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered capability: a Spark query over the testdata tables plus,
  * where SQL-expressible, an equivalent ANSI SQL oracle the driver runs in
  * DuckDB over the same parquet files (driver contract — see SparkEntry).
  *
  * Oracle-compat conventions (DuckDB vs Spark differ on types/format):
  *   - integer outputs are BIGINT on both sides (DuckDB sum(int)→HUGEINT,
  *     year()→BIGINT, Spark length()→int ... explicit casts align them);
  *   - date/timestamp outputs are formatted strings;
  *   - floating aggregates over many rows are round()ed (summation order
  *     differs between engines; per-row arithmetic is IEEE-exact and needs
  *     no rounding);
  *   - every query ends in a total ORDER BY with a deterministic tiebreak.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

trait QueryModule {
  def all: Seq[Q]

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
