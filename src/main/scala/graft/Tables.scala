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
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for spark.sql entry points —
    * the engine's equivalent of the reference's Thrift-Server surface,
    * reference: docker-compose.yml:70-88). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
