package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Dump one query's result as parquet under `outDir/name`. On failure,
    * fail LOUDLY: a silently-absent output dir made 5 regressions
    * invisible in round 7's correctness diff. Leave an explicit marker
    * where the parquet would be, so the driver's read errors out
    * per-query (an "err" row) instead of skipping the row entirely.
    * Returns true on success. */
  private[graft] def dumpOne(spark: SparkSession, sfDir: String,
      outDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Boolean = {
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      val dir = Paths.get(s"$outDir/$name")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("_ERROR.txt"),
        s"$name failed:\n${e.toString}\n")
      false
    }
    // queries may persist() intermediates for within-plan reuse (e.g.
    // dedup_minhash_lsh); release them so cached blocks don't pile up
    // in the shared session across the whole query list.
    finally spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to the named queries (dev iteration);
    // the driver always passes exactly (sfDir, outDir) → full run
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, fn) =>
        val ok = dumpOne(spark, sfDir, outDir, name, fn)
        if (ok) None else Some(name)
      }
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} FAILED: ${failed.mkString(", ")}")
      Files.writeString(Paths.get(s"$outDir/_FAILED_QUERIES.txt"),
        failed.mkString("", "\n", "\n"))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
