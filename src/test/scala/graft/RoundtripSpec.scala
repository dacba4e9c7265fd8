package graft

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
}
