package graft

import org.apache.spark.sql.SparkSession

/** One-query scale probe: dedup_embedding_cosine on an existing scaled
  * dir (built by ScaleStress). Run:
  * sbt "Test/runMain graft.EmbScale <dir> [reps]". */
object EmbScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse(s"${Tables.scratchRoot}/scale100")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      val n = df.count()
      println(f"[embscale] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"$n pairs ($dir)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
