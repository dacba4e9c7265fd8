package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer state commits for the continuous-ingest indexes
  * (round-14 verdict task: `compactStateDir`'s write-tmp + rename swap
  * is atomic on a local FS but NOT on S3A, where rename is copy+delete
  * — and an object store IS the reference's storage layer, MinIO via
  * docker-compose.yml:5-18. This is the snapshot family's commit
  * protocol — `sources/Snapshots.scala`: write the data files first,
  * write a tiny numbered manifest LAST; the manifest write is the
  * single atomic commit point — applied to mutable ingest state).
  *
  * Layout under a state root:
  * {{{
  *   data_v<k>_<tag>/     parquet dir, one per committed write
  *   manifest_v<k>.txt    current state = the highest-numbered manifest
  * }}}
  * Manifest lines: `#applied <tag>` metadata lines recording every
  * micro-batch tag ever committed (survives compaction — this is what
  * makes foreachBatch replay idempotent at EVERY crash point, see
  * [[append]]), then one data-dir name per line. On S3 the final
  * manifest PUT is atomic per object and readers take max k, so the
  * protocol holds without rename; on local FS the manifest is published
  * via tmp + ATOMIC_MOVE. A crash between a data write and its manifest
  * commit leaves the previous state fully intact (no torn reads —
  * StreamsSpec's kill-between-write-and-swap pin); a crash after the
  * commit leaves only vacuumable orphans.
  *
  * Scale stance: the manifest is O(committed writes) driver-side
  * metadata, same class as the snapshot family's; the applied-tag set
  * grows one short line per micro-batch and a production deployment
  * prunes tags older than the streaming checkpoint horizon (a replay
  * can never reach further back than the checkpoint).
  */
private[graft] object StateManifest {

  private def manifestVersions(root: String): Seq[Int] =
    Option(new java.io.File(root).listFiles()).map(_.toSeq).getOrElse(Nil)
      .map(_.getName)
      .collect { case n if n.startsWith("manifest_v") && n.endsWith(".txt") =>
        n.stripPrefix("manifest_v").stripSuffix(".txt").toInt }

  /** Highest committed manifest version; 0 = no state. */
  def currentVersion(root: String): Int = {
    val vs = manifestVersions(root)
    if (vs.isEmpty) 0 else vs.max
  }

  private def lines(root: String, v: Int): Seq[String] =
    Files.readAllLines(Paths.get(root, s"manifest_v$v.txt"))
      .asScala.toSeq.filter(_.nonEmpty)

  /** Data-dir names of the current state (empty = no state). */
  def entries(root: String): Seq[String] = {
    val v = currentVersion(root)
    if (v == 0) Nil else lines(root, v).filterNot(_.startsWith("#"))
  }

  /** Micro-batch tags whose writes are already committed. */
  def appliedTags(root: String): Set[String] = {
    val v = currentVersion(root)
    if (v == 0) Set.empty
    else lines(root, v).collect {
      case l if l.startsWith("#applied ") => l.stripPrefix("#applied ")
    }.toSet
  }

  /** Current state as one DataFrame; None = no committed state. */
  def read(s: SparkSession, root: String): Option[DataFrame] = {
    val es = entries(root)
    if (es.isEmpty) None
    else Some(s.read.parquet(es.map(e => s"$root/$e"): _*))
  }

  private def writeData(root: String, df: DataFrame, name: String,
      nFiles: Int): Unit =
    (if (nFiles > 0) df.coalesce(nFiles) else df)
      .write.mode("overwrite").parquet(s"$root/$name")

  private def commit(root: String, v: Int, applied: Set[String],
      es: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(root))
    val body = (applied.toSeq.sorted.map("#applied " + _) ++ es)
      .mkString("", "\n", "\n")
    val tmp = Paths.get(root, s".manifest_v$v.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(root, s"manifest_v$v.txt"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Append one micro-batch write. Idempotent per `tag`: if the current
    * manifest already records the tag as applied, the call is a no-op —
    * so a foreachBatch replay after a crash between the state commit
    * and the streaming-checkpoint commit cannot double-append (the
    * pre-manifest appends had exactly that exposure). */
  def append(s: SparkSession, root: String, df: DataFrame, tag: String,
      nFiles: Int = 0): Unit = {
    Files.createDirectories(Paths.get(root))
    val applied = appliedTags(root)
    if (applied(tag)) return
    val v = currentVersion(root) + 1
    val name = s"data_v${v}_$tag"
    writeData(root, df, name, nFiles)
    commit(root, v, applied + tag, entries(root) :+ name)
  }

  /** Rewrite the whole state as one data-dir set (compaction / fold):
    * write the new data, commit a manifest pointing only at it (the
    * applied-tag history is preserved), then vacuum superseded dirs and
    * manifests. Split into prepare + commit so StreamsSpec can kill
    * between the write and the swap. */
  def replace(s: SparkSession, root: String, df: DataFrame, tag: String,
      nFiles: Int): Unit =
    commitReplace(root, prepareReplace(s, root, df, tag, nFiles), tag)

  /** Write the replacement data dir WITHOUT committing it; the state
    * visible to readers is unchanged until [[commitReplace]]. */
  def prepareReplace(s: SparkSession, root: String, df: DataFrame,
      tag: String, nFiles: Int): Int = {
    val v = currentVersion(root) + 1
    writeData(root, df, s"data_v${v}_$tag", nFiles)
    v
  }

  /** The atomic swap: publish manifest v pointing at the prepared dir,
    * then vacuum everything it superseded. */
  def commitReplace(root: String, v: Int, tag: String): Unit = {
    commit(root, v, appliedTags(root), Seq(s"data_v${v}_$tag"))
    vacuum(root)
  }

  /** Delete data dirs absent from the current manifest and manifests
    * below the current version. Crash-safe at any point: state is
    * whatever the highest surviving manifest says. listFiles() is
    * null-guarded throughout (ADVICE r14). */
  def vacuum(root: String): Unit = {
    val v = currentVersion(root)
    val keep = entries(root).toSet
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        val n = f.getName
        if (n.startsWith("data_v") && !keep(n)) rmTree(f)
        else if (n.startsWith("manifest_v") && n.endsWith(".txt") &&
            n != s"manifest_v$v.txt") { f.delete(); () }
      }
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
    ()
  }

  /** Parquet part-file count across the current state's data dirs —
    * the quantity compaction bounds (spec + probe instrumentation). */
  def partFileCount(root: String): Int =
    entries(root).map { e =>
      Option(new java.io.File(root, e).listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }.sum
}
