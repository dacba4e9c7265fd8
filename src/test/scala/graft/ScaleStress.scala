package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× corpus stress for the dedup/similarity/text families — the
  * empirical leg of the 100 TB story (rounds 6-7 carryover). Builds a
  * `copies`× corpus from the sf0.1 documents/embeddings where each extra
  * copy is deliberately NOT a duplicate of the original (salt tokens
  * every 4th position break shingle/minhash/simhash similarity; a
  * per-copy circular rotation decorrelates embeddings), so the planted
  * duplicate RATE stays constant while volume scales — the regime where
  * a bucketed-candidate design must grow ~linearly and an all-pairs
  * design would grow quadratically. Times each family query on the base
  * and scaled dirs in one session (min of 2, Bench protocol) and writes
  * BENCH_scale10.json.
  *
  * Run: `sbt "Test/runMain graft.ScaleStress"` (env SPARK_GRAFT_CPUS,
  * args: [baseDir] [copies] [outJson]).
  */
object ScaleStress {

  /** Build the copies× corpus as ONE crossJoin with a copies range (a
    * 100-way unionByName built a 100-branch plan that took longer than
    * the queries it feeds). Copy 0 is the original.
    *
    * Text: salt every 2nd token with a copy+position token. The salted
    * stream has a salt in every 3 consecutive tokens, so NO original
    * 3-gram shingle survives — cross-copy shingle Jaccard is exactly 0
    * and every shingle/minhash/simhash/winnowing detector sees the
    * copies as unrelated (a period-4 salt left ~1/3 Jaccard and
    * produced 300× cross-copy pair inflation). Planted duplicate pairs
    * WITHIN a copy stay duplicates (same salts at same positions).
    *
    * Embeddings: per-(copy,dim) deterministic sign flips + a circular
    * rotation by copy%dim — norm-preserving. The sign bit mixes cp and
    * d MULTIPLICATIVELY (pmod(cp*(2d+1)*2654435761, 1000003) % 2): an
    * additive form like (cp*131 + d*37) % 2 depends only on cp's
    * parity, which made copies 64..99 EXACT duplicates of copies
    * 0..35 (same rotation, same signs) — the detector then correctly
    * reported ~6× the linear pair count. Two copies now share a sign
    * pattern only if equal mod 1000003. */
  def buildScaled(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int): Unit = {
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val cps = spark.range(copies.toLong)
      .select(col("id").cast("int").as("cp"))
    def upToDate(path: String, expected: Long): Boolean =
      try spark.read.parquet(path).count() == expected
      catch { case _: Throwable => false }
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    if (!upToDate(s"$outDir/documents.parquet", docs.count() * copies))
      docs.crossJoin(cps)
        .withColumn("doc_id", col("doc_id") + col("cp") * lit(1000000L))
        .withColumn("text", when(col("cp") === 0, col("text")).otherwise(
          array_join(flatten(expr(
            """transform(split(text, ' '), (t, j) ->
                 CASE WHEN j % 2 = 1
                   THEN array(t, concat('slt', cp, 'x', j))
                   ELSE array(t) END)""")), " ")))
        .withColumn("n_chars", length(col("text")))
        .drop("cp")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$baseDir/embeddings.parquet")
      .crossJoin(cps)
      .withColumn("vec_id", col("vec_id") + col("cp") * lit(10000000L))
      .withColumn("embedding",
        when(col("cp") === 0, col("embedding")).otherwise(expr(
          """transform(
               concat(slice(embedding, pmod(cp, size(embedding)) + 1,
                            size(embedding) - pmod(cp, size(embedding))),
                      slice(embedding, 1, pmod(cp, size(embedding)))),
               (x, d) -> CASE WHEN
                   pmod(cp * (2 * d + 1) * 2654435761, 1000003) % 2 = 0
                 THEN x ELSE -x END)""")))
      .drop("cp")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // remaining tables pass through unscaled so incidental reads resolve
    for (t <- Tables.names if t != "documents" && t != "embeddings") {
      val src = Paths.get(s"$baseDir/$t.parquet")
      val dst = out.resolve(s"$t.parquet")
      if (!Files.exists(dst)) Files.copy(src, dst)
    }
  }

  /** The stressed families: every candidate-generating dedup/sim/text
    * query whose input is the documents or embeddings table. */
  val Stressed: Seq[String] = Seq(
    "dedup_exact", "dedup_exact_hash", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_cluster_keepers", "dedup_winnowing_join",
    "dedup_incremental_corpus",
    "sim_ann_hyperplane", "sim_ann_multiprobe", "sim_ivf_probe",
    "sim_pq_adc", "sim_bruteforce_topk",
    "text_winnowing_fingerprints", "text_heavy_hitters",
    "text_bpe_encode", "curate_unigram_logprob")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2).getOrElse("/root/repo/BENCH_scale10.json")
    val scaledDir = s"${Tables.scratchRoot}/scale$copies"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"[scale] building ${copies}x corpus under $scaledDir")
    buildScaled(spark, baseDir, scaledDir, copies)

    def loadavg(): Seq[Double] =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }
    val loadBefore = loadavg()

    def timed(name: String, dir: String): (Double, Long) = {
      var rows = -1L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.mode("overwrite").format("noop").save()
        rows = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      (math.round(times.min * 1000) / 1000.0, rows)
    }
    // warmup: absorb codegen/reader first-touch on an untimed pass
    try { SparkEntry.queries("dedup_exact")(spark, baseDir)
      .write.mode("overwrite").format("noop").save() }
    catch { case _: Throwable => }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val rowsOut = new StringBuilder
    var first = true
    for (name <- Stressed) {
      val entry =
        try {
          val (t1, r1) = timed(name, baseDir)
          val (tN, rN) = timed(name, scaledDir)
          val ratio = math.round(tN / t1 * 100) / 100.0
          println(f"[scale] $name%-28s base=$t1%7.3fs ${copies}x=$tN%7.3fs " +
            f"ratio=$ratio%6.2f  rows $r1%8d -> $rN%9d")
          s""""$name":{"t_base":$t1,"t_scaled":$tN,"ratio":$ratio,""" +
            s""""rows_base":$r1,"rows_scaled":$rN}"""
        } catch { case e: Throwable =>
          errors(name) = e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] $name ERROR ${errors(name)}")
          s""""$name":{"error":true}"""
        }
      rowsOut.append(if (first) entry else "," + entry); first = false
    }
    val loadAfter = loadavg()
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") +
        "\""
    }.mkString("{", ",", "}")
    val json =
      s"""{"base":"$baseDir","copies":$copies,""" +
      s""""queries":{${rowsOut.result()}},"errors":$errJson,""" +
      s""""load_before":${arr(loadBefore)},"load_after":${arr(loadAfter)},""" +
      s""""nproc":${Runtime.getRuntime.availableProcessors}}"""
    Files.writeString(Paths.get(outJson), json + "\n")
    println(s"[scale] wrote $outJson")
    spark.stop()
  }
}
