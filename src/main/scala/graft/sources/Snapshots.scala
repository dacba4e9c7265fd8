package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Manifest-tracked versioned parquet table — the table-format core
  * (Delta/Iceberg-style) built from first principles: immutable data
  * files, a tiny text manifest per version listing exactly the files
  * that version comprises, copy-on-write commits that rewrite ONLY the
  * file groups containing changed keys and re-reference every untouched
  * file from the previous manifest. Reading "as of version N" is just
  * reading manifest N's file list — time travel without a table format
  * dependency (the reference README declares Delta but ships plain
  * parquet; SURVEY §0).
  *
  * Scale stance: the manifest is O(files) driver-side metadata — exactly
  * what a transaction log is; data moves only for the rewritten buckets
  * (here 1 of 8), so a commit's write amplification is proportional to
  * the touched key range, not the table size. At 100 TB the bucket count
  * grows and manifests move to their own metadata store, but the commit
  * protocol (write new files → write manifest last) is unchanged — the
  * manifest write IS the atomic commit point.
  */
object Snapshots {

  private def wipe(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(wipe)
    f.delete(); ()
  }

  private def parquetFilesUnder(dir: File): Seq[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(dir).map(_.getAbsolutePath).sorted
  }

  def manifestPath(root: String, version: Int): java.nio.file.Path =
    Paths.get(root, s"manifest_v$version.txt")

  private def writeManifest(root: String, version: Int, files: Seq[String]): Unit = {
    Files.write(manifestPath(root, version),
      files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    ()
  }

  def readManifest(root: String, version: Int): Seq[String] =
    Files.readAllLines(manifestPath(root, version)).asScala.toSeq

  /** Read the table as of a committed version: manifest N's files, no
    * directory listing, no partition inference — the file list is the
    * source of truth (so concurrently-written newer files are invisible). */
  def readVersion(s: SparkSession, root: String, version: Int): DataFrame =
    s.read.parquet(readManifest(root, version): _*)

  /** Build the demo table: v1 = orders(status F) bucketed 8 ways by key;
    * v2 = copy-on-write commit doubling o_totalprice for keys % 40 == 0.
    * All such keys live in bucket 0 (40 is a multiple of 8), so the
    * commit rewrites exactly one bucket and re-references the other 7
    * file groups from v1's manifest. Returns the table root. */
  def buildDemoTable(s: SparkSession, dir: String): String = {
    val rootF = new File(s"${Tables.scratchRoot}/time_travel")
    wipe(rootF)
    rootF.mkdirs()
    val root = rootF.getAbsolutePath

    val base = Tables.load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("bkt", pmod(col("o_orderkey"), lit(8)).cast("int"))

    // v1: full write, one dir per bucket (the rewrite unit)
    base.repartition(8, col("bkt"))
      .write.mode(SaveMode.Overwrite).partitionBy("bkt").parquet(s"$root/data_v1")
    writeManifest(root, 1, parquetFilesUnder(new File(s"$root/data_v1")))

    // v2 commit: rewrite bucket 0 only (all changed keys hash there) —
    // unchanged bucket-0 rows are carried into the new file; buckets 1-7
    // are reused by reference
    base.filter(col("bkt") === 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 40 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      .repartition(1)
      .write.mode(SaveMode.Overwrite).partitionBy("bkt").parquet(s"$root/data_v2")
    val carried = readManifest(root, 1).filterNot(_.contains("bkt=0"))
    writeManifest(root, 2,
      carried ++ parquetFilesUnder(new File(s"$root/data_v2")))
    root
  }
}
