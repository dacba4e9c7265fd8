package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional scale-smoke knobs (unset in the driver's contract run):
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the query list;
    // spill counters are always collected (cheap listener) and reported
    // per query so a memory-constrained run shows WHERE pressure lands.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
            ()
          }
        }
      })
    // untimed warmup: first-touch costs (whole-stage codegen JIT, parquet
    // reader init, streaming engine + state store bootstrap) land on
    // whichever query runs first and would misattribute ~10s; three cheap
    // representative queries absorb them so timings are steady-state.
    // noop sink: full materialization of every output row/column. A
    // count() would let Catalyst prune whole projections (a rename-only
    // query degenerates to parquet row-count metadata) and under-measure.
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    for (w <- Seq("silver_clean", "stream_tumbling_window", "emb_norm_stats_by_label"))
      try run(w) catch { case _: Throwable => }
    // TWO INTERLEAVED FULL PASSES (A/A), min per query: this box drifts
    // on a ~10-MINUTE timescale even at loadavg ≈ 1 (round 12's
    // adjudication: a quiet-box canonical read 1.47× while the
    // alternating A/B an hour later measured 1.024), so any single-pass
    // canonical can read ±25 % with no code change. Running the whole
    // query list twice end-to-end makes the artifact carry its own
    // drift control: the two pass totals are ~one-pass-length apart in
    // time, so a large pass1/pass2 gap says the box moved mid-run,
    // while tight passes certify the per-query mins as steady-state —
    // no separate A/B session needed to adjudicate a suspicious read.
    // (The previous back-to-back min caught per-query GC noise but both
    // samples sat inside the same drift phase and couldn't see it.)
    // failures surface as -1 (never a near-zero "best" time) plus an
    // errors map, so a broken query degrades the report instead of
    // silently improving the total.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val spillMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    // load adjudication: a shared box can inflate every query uniformly
    // (round 6's driver run read 1.46× vs round 5 while a re-run
    // reproduced round-5 times). Record the machine state around the run
    // plus BOTH per-query timings so a reader can separate box load from
    // a code regression without re-running: high loadavg or a large
    // pass1/pass2 spread says noise; a clean-box, tight-spread slowdown
    // says regression. Protocol note in BASELINE.md §adjudication.
    def loadavg(): Seq[Double] =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }
    val nproc = Runtime.getRuntime.availableProcessors
    val loadBefore = loadavg()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val allRuns = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Double]]()
    names.foreach(n => allRuns(n) = scala.collection.mutable.ArrayBuffer[Double]())
    val passTotals = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 2) {
      var ptotal = 0.0
      for (name <- names) {
        val (m0, d0) = (spillMem.get(), spillDisk.get())
        val t0 = System.nanoTime()
        try {
          run(name)
          val dt = (System.nanoTime() - t0) / 1e9
          allRuns(name) += math.round(dt * 1000) / 1000.0
          ptotal += dt
        } catch {
          case t: Throwable =>
            errors.getOrElseUpdate(name, t.toString.takeWhile(_ != '\n').take(200))
        }
        // release any within-plan persist() the query made: blocks would
        // otherwise accumulate across 100+ queries, and a retained cache
        // would let pass 2 measure a warm-cache path instead of the query.
        spark.catalog.clearCache()
        // listener events are async — the tail of a query's tasks may
        // land on the next row; fine for a pressure map, not accounting
        val mb = (spillMem.get() - m0 + spillDisk.get() - d0) / 1e6
        if (mb > 0)
          spillMb(name) = spillMb.getOrElse(name, 0.0) + math.round(mb * 10) / 10.0
      }
      passTotals += math.round(ptotal * 1000) / 1000.0
    }
    val results = names.map { name =>
      val ts = allRuns(name)
      name -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val loadAfter = loadavg()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val spillJson = spillMb.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runsJson = allRuns.map { case (k, v) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"spill_mb":$spillJson,"runs":$runsJson,"pass_totals":${arr(passTotals.toSeq)},"load_before":${arr(loadBefore)},"load_after":${arr(loadAfter)},"nproc":$nproc,"sf":"$sfDir"}"""
    println(json)
    // the driver clips sbt stdout (round 8's BENCH_r08.json kept only an
    // alphabetical tail of the per-query map, "parsed": null), so also
    // persist the full artifact to a repo file — committed each round,
    // it lets cross-round comparison reach every query instead of 43/246.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_full.json")), json + "\n")
    catch { case t: Throwable =>
      System.err.println(s"[bench] could not write BENCH_full.json: $t") }
    spark.stop()
  }
}
