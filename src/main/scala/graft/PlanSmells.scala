package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Repo-wide physical-plan smell report — the institutionalized form of
  * round 12's two catches:
  *
  *  - `dedup_semantic_cells`' max_by over a struct ordering key planned
  *    as a silent SortAggregate (sorted the N×k stream: 33 GB spill);
  *  - the cleaning functions' composition trees, replicated by filter
  *    pushdown past the JVM JIT thresholds (interpreted bytecode, 3.7×
  *    on p2_null_drop once fixed).
  *
  * For every registered query this reports, from the pre-adaptive
  * physical plan (aggregate strategy choices are made at planning, not
  * by AQE): SortAggregate count, hash/object-hash counts for context,
  * CodegenFallback expression classes present in hot operators, and the
  * largest single expression tree (node count) — a proxy for
  * JIT-threshold risk. A REPORT, not a gate: SortAggregate is correct
  * for sort-based aggregates (collect_list ordering, percentiles) and
  * some fallbacks are deliberate (TrigramShingles' one-pass scan beat
  * the per-element HOF dispatch it replaced) — the artifact exists so a
  * NEW offender shows up as a diff against the committed baseline.
  */
object PlanSmells {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = args.lift(1).getOrElse("PLAN_SMELLS.json")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exprStats(plan: SparkPlan): (Seq[String], Int) = {
      val fallbacks = scala.collection.mutable.SortedSet[String]()
      var maxTree = 0
      plan.foreach { node =>
        node.expressions.foreach { root =>
          var size = 0
          root.foreach { e =>
            size += 1
            e match {
              case _: CodegenFallback
                  if !e.getClass.getName.startsWith("org.apache.spark.sql.catalyst.expressions.objects") =>
                fallbacks += e.getClass.getSimpleName
              case _ => ()
            }
          }
          if (size > maxTree) maxTree = size
        }
      }
      (fallbacks.toSeq, maxTree)
    }

    val rows = new StringBuilder
    var first = true
    var failed = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      def stats(plan: SparkPlan): String = {
        val sortAggs = plan.collectWithSubqueries {
          case s: SortAggregateExec => s }.size
        val hashAggs = plan.collectWithSubqueries {
          case h: HashAggregateExec => h }.size
        val objAggs = plan.collectWithSubqueries {
          case o: ObjectHashAggregateExec => o }.size
        val (fallbacks, maxTree) = exprStats(plan)
        s""""$name":{"sort_agg":$sortAggs,"hash_agg":$hashAggs,""" +
          s""""obj_hash_agg":$objAggs,"max_expr_tree":$maxTree,""" +
          s""""codegen_fallbacks":[${fallbacks.map("\"" + _ + "\"").mkString(",")}]}"""
      }
      val cell =
        try {
          val qe = fn(spark, sfDir).queryExecution
          // subquery-carrying plans (bloom prefilter, DPP probe, NOT IN)
          // hold LOGICAL subquery plans before preparation and
          // collectWithSubqueries cannot traverse them — retry on the
          // prepared executedPlan rather than reporting an error
          try stats(qe.sparkPlan)
          catch { case _: Throwable => stats(qe.executedPlan) }
        } catch {
          case e: Throwable =>
            failed += 1
            s""""$name":{"error":"${e.toString.takeWhile(_ != '\n').take(120).replace("\"", "'")}"}"""
        }
      if (!first) rows.append(",\n ")
      rows.append(cell)
      first = false
    }
    val json = s"""{"sf_dir":"$sfDir","queries":{\n ${rows.toString}\n}}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"[smells] wrote $outPath (${SparkEntry.queries.size} queries, $failed failed)")
    spark.stop()
  }
}
