package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md, FIXTURES.md §2).
  *
  * One parquet file per table under `sfDir`. All queries in
  * [[SparkEntry.queries]] read through here so scans stay uniform
  * (vectorized parquet reader, pushdown-friendly).
  */
object Tables {
  /** Root for sink-side scratch output (roundtrip writes, stream
    * checkpoints). Overridable via -Dgraft.scratch so the queries aren't
    * tied to this container's layout; defaults to the repo's target dir. */
  def scratchRoot: String =
    sys.props.getOrElse("graft.scratch", "/root/repo/target/scratch")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read the nanos as plain longs
    * (legacy conf) and truncate to microsecond timestamps — the same
    * ns→µs truncation DuckDB applies, so oracle comparisons line up.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Convert a raw nanos-as-long `ts` column to a µs timestamp; no-op if
    * already a timestamp. Integer DIV — a double division would lose
    * precision at 1e18-scale nanos. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else df

  /** Register every table as a temp view (for spark.sql entry points —
    * the engine's equivalent of the reference's Thrift-Server surface,
    * reference: docker-compose.yml:70-88). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
