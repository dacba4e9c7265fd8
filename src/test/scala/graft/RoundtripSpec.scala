package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Sink-side layout properties: the range-clustered write must produce
  * files covering disjoint (at most boundary-touching) o_orderdate ranges —
  * that disjointness is what lets parquet min/max stats skip whole files
  * for a date filter at scale.
  */
class RoundtripSpec extends SparkSpec {

  test("range-clustered write produces files with disjoint date ranges") {
    SparkEntry.queries("range_clustered_write")(spark, sf).collect()
    val out = s"${Tables.scratchRoot}/range_clustered_orders"
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      .orderBy("lo")
      .collect()
    assert(perFile.length > 1, "range repartition should emit several files")
    perFile.sliding(2).foreach { w =>
      val (prev, next) = (w(0), w(1))
      // o_orderdate is timestamp_ntz -> LocalDateTime in Row
      val prevHi = prev.getAs[java.time.LocalDateTime]("hi")
      val nextLo = next.getAs[java.time.LocalDateTime]("lo")
      assert(!prevHi.isAfter(nextLo),
        s"file ranges overlap: $prev vs $next")
    }
  }

  test("compaction collapses the fragmented landing zone's file count") {
    SparkEntry.queries("compact_small_files")(spark, sf).collect()
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = parquetFiles(s"${Tables.scratchRoot}/compact_fragmented")
    val after = parquetFiles(s"${Tables.scratchRoot}/compact_tidy")
    assert(before >= 32, s"landing zone should be fragmented, got $before")
    assert(after <= 4, s"compacted output should be few files, got $after")
  }

  test("z-order layout bounds BOTH dimensions per partition") {
    // range-cluster by the interleaved key, then measure per-partition
    // spans of each source dimension: with 16 partitions over a 256×256
    // space, z-ordering must keep the average span of x AND y well under
    // the global 255 — a 1-D sort on x alone leaves y's span at ~255
    // everywhere (that contrast is the whole point of the interleave).
    val keyed = SparkEntry.queries("zorder_interleave_key")(spark, sf)
    val parts = keyed.repartitionByRange(16, col("zkey"))
      .select(col("x"), col("y"),
        org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .groupBy("p")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(parts.length > 4, "expect a real multi-partition layout")
    def avg(f: org.apache.spark.sql.Row => Long): Double =
      parts.map(f).sum.toDouble / parts.length
    val (ax, ay) = (avg(_.getLong(1)), avg(_.getLong(2)))
    assert(ax < 200 && ay < 200,
      f"z-order average spans x=$ax%.0f y=$ay%.0f not jointly bounded")
    // and the same partition count sorted on x alone does NOT bound y
    val linear = keyed.repartitionByRange(16, col("x"))
      .select(col("y"),
        org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .groupBy("p").agg((max("y") - min("y")).as("sy")).collect()
    val ayLinear = linear.map(_.getLong(1)).sum.toDouble / linear.length
    assert(ayLinear > ay,
      f"linear layout should be worse on y ($ayLinear%.0f vs $ay%.0f)")
  }

  test("snapshot manifests: copy-on-write reuses untouched file groups," +
    " old versions stay readable") {
    import org.apache.spark.sql.functions._
    val root = graft.sources.Snapshots.buildDemoTable(spark, sf)
    val m1 = graft.sources.Snapshots.readManifest(root, 1)
    val m2 = graft.sources.Snapshots.readManifest(root, 2)
    // v2 reuses exactly v1's non-bucket-0 files, plus new v2 files
    val carried = m2.filter(_.contains("data_v1"))
    assert(carried.toSet == m1.filterNot(_.contains("bkt=0")).toSet)
    assert(m2.exists(_.contains("data_v2")))
    // time travel: v1 read AFTER the v2 commit equals the base relation
    val v1cents = graft.sources.Snapshots.readVersion(spark, root, 1)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    val basecents = Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    assert(v1cents == basecents, "v1 snapshot must be immutable under v2 commit")
    // and v2 differs exactly by the doubled keys' contribution
    val v2cents = graft.sources.Snapshots.readVersion(spark, root, 2)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    val delta = Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 40 === 0)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    assert(v2cents == basecents + delta)
  }

  test("snapshot DML: DELETE/UPDATE rewrite only touched buckets;" +
    " ADD COLUMN is metadata-only and version schemas stay independent") {
    import org.apache.spark.sql.functions._
    import graft.sources.Snapshots
    val root = Snapshots.buildDemoTable(spark, sf, "spec_dml")

    // DELETE %40==0 (all in bucket 0): v3 carries every non-bucket-0
    // file of v2 by reference and rewrites exactly one file group
    val v3 = Snapshots.commitDelete(spark, root, 2,
      col("o_orderkey") % 40 === 0)
    val m2 = Snapshots.readManifest(root, 2)
    val m3 = Snapshots.readManifest(root, v3)
    assert(m3.filterNot(_.contains("data_v3")).toSet ==
      m2.filterNot(_.contains("bkt=0")).toSet,
      "delete must re-reference every untouched file group")
    assert(Snapshots.readVersion(spark, root, v3)
      .filter(col("o_orderkey") % 40 === 0).count() == 0)
    // prior version unaffected (immutability under the delete commit)
    assert(Snapshots.readVersion(spark, root, 2)
      .filter(col("o_orderkey") % 40 === 0).count() > 0)

    // UPDATE %40==13 (bucket 5 only) on top of the delete
    val v4 = Snapshots.commitUpdate(spark, root, v3,
      col("o_orderkey") % 40 === 13,
      "o_totalprice" -> (col("o_totalprice") + 1000))
    val m4 = Snapshots.readManifest(root, v4)
    assert(m4.filterNot(_.contains("data_v4")).toSet ==
      m3.filterNot(_.contains("bkt=5")).toSet,
      "update must re-reference every untouched file group")
    val bumped = Snapshots.readVersion(spark, root, v4)
      .filter(col("o_orderkey") % 40 === 13)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    val before = Snapshots.readVersion(spark, root, v3)
      .filter(col("o_orderkey") % 40 === 13)
      .agg(sum(round(col("o_totalprice") * 100).cast("long")),
        count(lit(1))).head
    assert(bumped == before.getLong(0) + 100000L * before.getLong(1))

    // ADD COLUMN: same file list, evolved schema; old version keeps the
    // old schema; pre-existing rows read the new column as NULL
    val v5 = Snapshots.commitAddColumn(spark, root, v4, "price_band",
      org.apache.spark.sql.types.StringType)
    assert(Snapshots.readManifest(root, v5) == m4,
      "ADD COLUMN must not move data")
    val v5df = Snapshots.readVersion(spark, root, v5)
    assert(v5df.columns.contains("price_band"))
    assert(v5df.filter(col("price_band").isNotNull).count() == 0)
    assert(!Snapshots.readVersion(spark, root, v4)
      .columns.contains("price_band"),
      "time-travel read of the pre-evolution version keeps the old schema")
  }

  test("vacuum deletes only unreachable files; retained snapshot intact;" +
      " expired time travel fails loudly") {
    val root = graft.sources.Snapshots.buildDemoTable(spark, sf, "spec_vacuum")
    graft.sources.Snapshots.commitDelete(spark, root, 2, col("o_orderkey") % 40 === 0)
    val m3 = graft.sources.Snapshots.readManifest(root, 3)
    val preCents = graft.sources.Snapshots.readVersion(spark, root, 3)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    // reachability: files only in m1/m2 die, files shared with m3 survive
    val doomed = (graft.sources.Snapshots.readManifest(root, 1) ++
      graft.sources.Snapshots.readManifest(root, 2)).distinct.filterNot(m3.toSet)
    assert(doomed.nonEmpty, "test needs some unreachable files")
    val removed = graft.sources.Snapshots.vacuum(root, keepFrom = 3)
    assert(removed == doomed.size, s"removed $removed != ${doomed.size}")
    doomed.foreach(f =>
      assert(!new java.io.File(f).exists(), s"unreachable file survived: $f"))
    m3.foreach(f =>
      assert(new java.io.File(f).exists(), s"reachable file vacuumed: $f"))
    // retained snapshot reads identically after the vacuum
    val postCents = graft.sources.Snapshots.readVersion(spark, root, 3)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    assert(postCents == preCents)
    // expired versions are gone as a unit: manifest removed → loud failure
    intercept[Exception] { graft.sources.Snapshots.readVersion(spark, root, 1).count() }
    assert(graft.sources.Snapshots.latestVersion(root) == 3)
  }

  test("change feed reads only the changed buckets and equals the full" +
      " table diff") {
    import graft.sources.Snapshots
    val root = Snapshots.buildDemoTable(spark, sf, "snap_cdf_spec")
    Snapshots.commitDelete(spark, root, 2, col("o_orderkey") % 40 === 13)
    val src = Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "O" && col("o_orderkey") % 40 === 21)
      .select("o_orderkey", "o_totalprice")
    Snapshots.commitMerge(spark, root, 3, src)

    // the scale bound: the v1→v4 manifest diff is confined to the two
    // buckets the commits touched (0: update, 5: delete+merge) — the CDF
    // read never opens the other six file groups
    val m1 = Snapshots.readManifest(root, 1)
    val m4 = Snapshots.readManifest(root, 4)
    val removed = m1.filterNot(m4.toSet)
    val added = m4.filterNot(m1.toSet)
    assert(removed.nonEmpty && added.nonEmpty)
    assert((removed ++ added).forall(f =>
      f.contains("bkt=0") || f.contains("bkt=5")),
      s"diff leaked outside changed buckets: ${(removed ++ added).mkString("\n")}")

    // semantic pin: the manifest-diff feed equals the brute-force full
    // diff of the two complete versions
    val feed = Snapshots.changeFeed(spark, root, 1, 4).cache()
    val v1 = Snapshots.readVersion(spark, root, 1)
    val v4 = Snapshots.readVersion(spark, root, 4)
    def rows(ct: String) =
      feed.filter(col("change_type") === ct)
        .select("o_orderkey", "o_totalprice")
    val inserts = v4.join(v1, Seq("o_orderkey"), "left_anti")
    val deletes = v1.join(v4, Seq("o_orderkey"), "left_anti")
    val updPost = v1.select(col("o_orderkey"), col("o_totalprice").as("pre"))
      .join(v4, "o_orderkey")
      .filter(col("pre") =!= col("o_totalprice"))
      .select("o_orderkey", "o_totalprice")
    assert(rows("insert").exceptAll(inserts).isEmpty &&
      inserts.exceptAll(rows("insert")).isEmpty, "insert set mismatch")
    assert(rows("delete").exceptAll(deletes).isEmpty &&
      deletes.exceptAll(rows("delete")).isEmpty, "delete set mismatch")
    assert(rows("update_postimage").exceptAll(updPost).isEmpty &&
      updPost.exceptAll(rows("update_postimage")).isEmpty,
      "update postimage set mismatch")
    assert(feed.filter(col("change_type") === "update_preimage").count() ==
      updPost.count(), "pre/post image counts differ")
    feed.unpersist()
    ()
  }

  test("parquet writer embeds a bloom filter for the enabled column only") {
    import scala.jdk.CollectionConverters._
    val root = s"${Tables.scratchRoot}/bloom_spec"
    Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("parquet.bloom.filter.enabled#l_partkey", "true")
      .option("parquet.bloom.filter.expected.ndv#l_partkey", "25000")
      // parquet-mr drops the bloom filter when the chunk stays fully
      // dictionary-encoded (the dictionary already gives exact
      // membership); disable dictionary for the key column so the test
      // data takes the same plain-encoded path a high-NDV 100 TB key
      // column would
      .option("parquet.enable.dictionary#l_partkey", "false")
      .parquet(root)
    val file = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sessionState.newHadoopConf()))
    try {
      val cols = reader.getRowGroups.get(0).getColumns.asScala
      def chunk(name: String) =
        cols.find(_.getPath.toDotString == name).get
      // enabled column: filter physically present and readable
      assert(chunk("l_partkey").getBloomFilterOffset > 0,
        "no bloom filter offset for the enabled column")
      val bf = reader.getBloomFilterDataReader(reader.getRowGroups.get(0))
        .readBloomFilter(chunk("l_partkey"))
      assert(bf != null, "bloom filter unreadable for the enabled column")
      // not-enabled column: no filter → no storage overhead paid there
      assert(chunk("l_orderkey").getBloomFilterOffset < 0,
        "bloom filter present on a column that did not enable it")
    } finally reader.close()
  }

  test("dynamic partition overwrite replaces only the incoming partitions") {
    val root = s"${Tables.scratchRoot}/dyn_overwrite_spec"
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(root)
    def files(part: String): Set[String] = {
      val d = new java.io.File(s"$root/event_type=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName + ":" + f.lastModified()).toSet
    }
    val viewBefore = files("view")
    val clickBefore = files("click")
    ev.filter(col("event_type") === "click")
      .withColumn("value", col("value") * 2)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(root)
    // untouched partition: same files, same mtimes — zero data movement
    assert(files("view") == viewBefore,
      "dynamic overwrite rewrote an untouched partition")
    // targeted partition: physically replaced
    assert(files("click") != clickBefore,
      "dynamic overwrite did not replace the incoming partition")
  }

  test("schema-drifted carried file fails loudly at manifest read") {
    import graft.sources.Snapshots
    val root = Snapshots.buildDemoTable(spark, sf, "spec_drift")
    // sabotage a CARRIED file (bkt=3 is referenced by v2 from v1's data
    // dir): replace it in place with a parquet whose o_totalprice
    // drifted to STRING — the failure mode the manifest alone can't see
    val victim = Snapshots.readManifest(root, 2)
      .find(_.contains("bkt=3")).get
    val tmp = s"${Tables.scratchRoot}/spec_drift_tmp"
    spark.range(5)
      .selectExpr("id AS o_orderkey", "CAST('oops' AS STRING) AS o_totalprice")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val drifted = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(drifted.toPath,
      java.nio.file.Paths.get(victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar, else the CRC mismatch fires
    // before the footer is parsed (a DIFFERENT loud failure; here we
    // want the pure schema-drift path a remote object store would take)
    val vf = new java.io.File(victim)
    new java.io.File(vf.getParentFile, "." + vf.getName + ".crc").delete()
    val ex = intercept[IllegalStateException] {
      Snapshots.readVersion(spark, root, 2).collect()
    }
    assert(ex.getMessage.contains("schema drift") &&
      ex.getMessage.contains("o_totalprice") &&
      ex.getMessage.contains("bkt=3"),
      s"drift error should name the column and file: ${ex.getMessage}")
  }

  test("binaryFile scan reads one row per blob with true byte sizes") {
    val rows = SparkEntry.queries("binaryfile_scan_digest")(spark, sf)
      .collect()
    val regions = Tables.load(spark, sf, "nation")
      .select("n_regionkey").distinct().count()
    assert(rows.length == regions, "one row per region blob")
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    // every digest is a well-formed md5; sizes match the bytes on disk
    assert(rows.forall(_.getString(2).matches("[0-9a-f]{32}")))
    assert(rows.forall(_.getLong(1) > 0))
  }
}
