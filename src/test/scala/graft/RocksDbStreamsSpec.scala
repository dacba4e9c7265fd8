package graft

/** Round-10 verdict item 7: the streaming state-bound table (SCALE.md)
  * argued its bounds against the in-memory HDFSBackedStateStore; at
  * 100 TB state lives in RocksDB. This spec re-runs EVERY registered
  * stream query under `RocksDBStateStoreProvider` and pins
  *  (a) row-identical results vs the default provider, and
  *  (b) for stateful queries, on-disk evidence the provider actually
  *      engaged (RocksDB snapshot zips in the checkpoint's state dir —
  *      HDFSBacked writes .delta/.snapshot instead, so a silently
  *      ignored conf cannot pass this check).
  */
class RocksDbStreamsSpec extends SparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    else Seq(f)

  test("every stream query is provider-agnostic: identical rows under RocksDB") {
    val names = SparkEntry.queries.keys.filter(_.startsWith("stream_"))
      .toSeq.sorted
    assert(names.size >= 12, s"stream query registry shrank: $names")
    var statefulChecked = 0
    for (name <- names) {
      // SparkSpec shares one JVM-wide session across suites, so the
      // baseline must be pinned to the DEFAULT provider explicitly —
      // otherwise a suite that leaked the conf would turn this A/B
      // into "current provider vs RocksDB" (round-10 ADVICE)
      val prev = spark.conf.getOption(ProviderKey)
      spark.conf.unset(ProviderKey)
      val expected =
        SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      spark.conf.set(ProviderKey, RocksProvider)
      try {
        val got =
          SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
        assert(got == expected,
          s"$name diverged under RocksDB: ${got.diff(expected).take(3)} vs " +
            s"${expected.diff(got).take(3)}")
        val stateDir =
          new java.io.File(s"${Tables.scratchRoot}/ckpt_$name/state")
        if (stateDir.exists()) {
          val files = walk(stateDir).map(_.getName)
          assert(files.exists(n =>
            n.endsWith(".zip") || n.endsWith(".changelog")),
            s"$name has a state dir but no RocksDB artifacts — provider " +
              s"did not engage (files: ${files.take(8)})")
          statefulChecked += 1
        }
      } finally prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
    // the stateful majority (windows, dedup, joins, mapGroupsWithState)
    // must have exercised RocksDB, not just the stateless enrich/upsert
    assert(statefulChecked >= 8,
      s"only $statefulChecked stream queries left RocksDB state behind")
  }

  test("mid-stream kill + resume under RocksDB replays to exactly-once" +
      " (snapshot + changelog recovery)") {
    // Round-10 verdict item 8: StreamsSpec pins a GRACEFUL
    // between-runs restart under the default provider; at 100 TB the
    // failure that matters is an executor/driver death mid-stream with
    // state in RocksDB, recovered via snapshot + changelog replay.
    // Here: a dedup stream over 6 one-file micro-batches is stopped
    // while later (deliberately slow) batches are still in flight,
    // then resumed from the same checkpoint. Exactly-once =
    //  - the parquet sink's commit log hides the aborted batch's
    //    orphan files,
    //  - the RESTORED RocksDB dedup state still suppresses ids seen
    //    before the kill (files overlap across the boundary),
    //  - the source commit log re-reads only unconsumed files.
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StructType}
    val base = Paths.get(s"${Tables.scratchRoot}/rocksdb_crash")
    def wipe(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(c => wipe(c))
      Files.deleteIfExists(p); ()
    }
    wipe(base)
    val src = base.resolve("incoming"); Files.createDirectories(src)
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    val schema = new StructType().add("user_id", LongType)
    // 6 files; ids overlap BOTH within the pre-kill prefix and across
    // the kill boundary (files 4-6 repeat ids from files 1-3, plus new)
    val fileIds: Seq[Seq[Long]] = Seq(
      Seq(1, 2, 3), Seq(3, 4, 5), Seq(5, 6, 101),
      Seq(1, 6, 102), Seq(2, 101, 103), Seq(102, 103, 104))
    for ((ids, i) <- fileIds.zipWithIndex)
      Files.writeString(src.resolve(f"f$i%02d.json"),
        ids.map(id => s"""{"user_id":$id}""").mkString("\n"))
    val distinctIds = fileIds.flatten.toSet
    // ids ≥ 100 sleep per row: batches 3-6 each take ≥ 0.5 s, so the
    // poll-then-stop below reliably lands while a batch is in flight
    val slow = org.apache.spark.sql.functions.udf { (id: Long) =>
      if (id >= 100) Thread.sleep(500); id
    }
    val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
    val ChangelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(ProviderKey)
    val prevCl = spark.conf.getOption(ChangelogKey)
    spark.conf.set(ProviderKey, RocksProvider)
    // changelog checkpointing ON: recovery must walk the snapshot +
    // changelog replay path, not just reload a full snapshot
    spark.conf.set(ChangelogKey, "true")
    try {
      def start() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src.toString)
        .withColumn("user_id", slow(org.apache.spark.sql.functions
          .col("user_id")))
        .dropDuplicates("user_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      val q1 = start()
      // kill once ≥2 batches committed and before all 6 drain (the
      // slow batches hold the stream in flight for seconds)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
          q1.isActive && System.nanoTime() < deadline)
        Thread.sleep(25)
      q1.stop()
      val afterKill =
        try spark.read.parquet(out).collect().map(_.getLong(0)).toSeq
        catch { case _: Throwable => Seq.empty[Long] }
      assert(afterKill.distinct.size == afterKill.size,
        s"duplicate rows already before resume: $afterKill")
      assert(afterKill.toSet.subsetOf(distinctIds))
      assert(afterKill.size < distinctIds.size,
        "stream drained fully before the kill — mid-stream window missed")
      // resume from the same checkpoint: snapshot + changelog replay
      val q2 = start()
      q2.awaitTermination()
      val got = spark.read.parquet(out).collect().map(_.getLong(0)).toSeq
      assert(got.size == distinctIds.size && got.toSet == distinctIds,
        s"post-recovery output not exactly-once: got $got, " +
          s"expected ${distinctIds.toSeq.sorted} once each")
      // RocksDB actually engaged (zips/changelogs in the state dir)
      val stateFiles = walk(new java.io.File(s"$ckpt/state"))
        .map(_.getName)
      assert(stateFiles.exists(n =>
        n.endsWith(".zip") || n.endsWith(".changelog")),
        s"no RocksDB artifacts under $ckpt/state: ${stateFiles.take(8)}")
      assert(stateFiles.exists(_.endsWith(".changelog")),
        "changelog checkpointing produced no .changelog files — the " +
          "replay path was not exercised")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
      prevCl match {
        case Some(v) => spark.conf.set(ChangelogKey, v)
        case None => spark.conf.unset(ChangelogKey)
      }
    }
  }
}
