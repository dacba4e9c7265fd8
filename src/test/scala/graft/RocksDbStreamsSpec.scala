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
      val expected =
        SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      val prev = spark.conf.getOption(ProviderKey)
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
}
