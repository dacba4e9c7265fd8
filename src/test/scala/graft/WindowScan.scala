package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** One-off scan: which registered queries still plan a WindowExec with an
  * EMPTY partitionSpec (the "No Partition Defined" warning condition)?
  * Run: sbt "Test/runMain graft.WindowScan". */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n =
        try fn(spark, sf).queryExecution.executedPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.size
        catch { case _: Throwable => 0 }
      if (n > 0) println(s"[wscan] $name: $n empty-spec window(s)")
    }
    println("[wscan] done")
    spark.stop()
  }
}
