package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule, Tables}

/** The ML train step closed ENGINE-side — the reference fits its model
  * driver-side after toPandas (reference airflow/dags/realestate_pipeline
  * .py:224-234: sklearn RandomForest + r² on a collected dataframe). At
  * 100 TB nothing fits in a driver, so the train step has to become what
  * it mathematically is: a handful of distributed aggregation passes.
  * This module implements the classic closed-form / fixed-iteration
  * trainers that way — k-means (Lloyd), logistic regression (full-batch
  * gradient descent), multi-feature OLS (normal equations), and feature
  * standardization — each as declarative DataFrame plans whose per-pass
  * cost is one scan + one single-row (or k-row) exchange.
  *
  * Cross-engine determinism (every query here is DuckDB-hash-oracled):
  *   - feature extraction is integer-exact (cents / small modulo ints),
  *     so SUMs are exact integers — order-independent, no float-sum
  *     digit flips (the gold_regression_fit discipline);
  *   - where a model evaluation is genuinely fractional (the logistic
  *     probability), the per-row gradient contribution is QUANTIZED to a
  *     1e-9 fixed-point grid and summed as BIGINT — the published
  *     deterministic-distributed-training trick (integer accumulation
  *     makes the reduction associative), and transcendentals are avoided
  *     entirely: the link is the rational "fast sigmoid"
  *     z ↦ 0.5 + z/(2(1+|z|)), IEEE-exact and identical in any engine;
  *   - iteration-carried scalars (centroids, weights) are ratios of
  *     exact integers, so both engines carry bit-identical doubles into
  *     the next pass.
  *
  * Scale shape: every iteration is ONE full scan + map-side partial
  * aggregation to a k-row (k ≤ 3) or 1-row table, which is then
  * broadcast back for the next pass — no shuffle of the fact table, no
  * driver-side data movement beyond the k-row model state. Iterations
  * are fixed-count and unrolled into one declarative plan.
  */
object Learn extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---- shared feature extraction: integer-exact (see scaladoc) ----
  private def pricePoints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").selectExpr(
      "CAST(o_orderkey % 500 AS DOUBLE) AS x",
      "CAST(round(o_totalprice * 100) AS DOUBLE) AS y")

  private val pricePointsSql = """
    SELECT CAST(o_orderkey % 500 AS DOUBLE) AS x,
           CAST(round(o_totalprice * 100) AS DOUBLE) AS y
    FROM orders"""

  /** One Lloyd assignment: nearest of the 3 centroids in the wide 1-row
    * table, ties broken toward the lower cluster id by the CASE order
    * (identical text in the oracle — no reliance on either engine's
    * min_by tie behavior). */
  private def assignExpr: Column = {
    def d(j: Int): Column =
      (col("x") - col(s"cx$j")) * (col("x") - col(s"cx$j")) +
        (col("y") - col(s"cy$j")) * (col("y") - col(s"cy$j"))
    when(d(0) <= d(1) && d(0) <= d(2), lit(0L))
      .when(d(1) <= d(2), lit(1L))
      .otherwise(lit(2L))
  }

  private def assignSql(pts: String, cents: String): String = {
    def d(j: Int) =
      s"(x-cx$j)*(x-cx$j)+(y-cy$j)*(y-cy$j)"
    s"""SELECT x, y,
          CASE WHEN ${d(0)} <= ${d(1)} AND ${d(0)} <= ${d(2)} THEN 0
               WHEN ${d(1)} <= ${d(2)} THEN 1
               ELSE 2 END AS c
        FROM $pts CROSS JOIN $cents"""
  }

  /** Per-cluster means, pivoted wide to one broadcastable row. Clusters
    * can't empty out here (price is dense across the whole range), and
    * the sums are integer-valued doubles < 2^53 → exact. */
  private def widen(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("c")
      .agg((sum("x") / count(lit(1))).as("mx"),
        (sum("y") / count(lit(1))).as("my"))
      .agg(
        max(when(col("c") === 0, col("mx"))).as("cx0"),
        max(when(col("c") === 0, col("my"))).as("cy0"),
        max(when(col("c") === 1, col("mx"))).as("cx1"),
        max(when(col("c") === 1, col("my"))).as("cy1"),
        max(when(col("c") === 2, col("mx"))).as("cx2"),
        max(when(col("c") === 2, col("my"))).as("cy2"))

  private def widenSql(assigned: String) = s"""
    SELECT max(CASE WHEN c=0 THEN mx END) AS cx0,
           max(CASE WHEN c=0 THEN my END) AS cy0,
           max(CASE WHEN c=1 THEN mx END) AS cx1,
           max(CASE WHEN c=1 THEN my END) AS cy1,
           max(CASE WHEN c=2 THEN mx END) AS cx2,
           max(CASE WHEN c=2 THEN my END) AS cy2
    FROM (SELECT c, sum(x)/count(*) AS mx, sum(y)/count(*) AS my
          FROM $assigned GROUP BY c)"""

  // logistic-regression pieces (see scaladoc: fast sigmoid + fixed-point
  // gradient accumulation). One step: aggregate quantized gradient sums
  // under the current (w, b), then take w' = w − lr·ḡ.
  private val LrQ = 1e9 // fixed-point grid
  private def logregStep(pts: DataFrame, w: DataFrame): DataFrame =
    pts.crossJoin(broadcast(w))
      .withColumn("z", col("w") * col("x") + col("b"))
      .withColumn("p",
        lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
      .withColumn("e", col("p") - col("yl"))
      .agg(
        first("w").as("pw"), first("b").as("pb"),
        count(lit(1)).as("n"),
        sum(round(col("e") * col("x") * LrQ).cast("long")).as("gw"),
        sum(round(col("e") * LrQ).cast("long")).as("gb"),
        sum(round(col("e") * col("e") * LrQ).cast("long")).as("sq"))
      .selectExpr(
        s"pw - (CAST(gw AS DOUBLE) / $LrQ) / n AS w",
        s"pb - (CAST(gb AS DOUBLE) / $LrQ) / n AS b",
        "n",
        s"CAST(sq AS DOUBLE) / $LrQ AS sse")

  private def logregStepSql(pts: String, w: String) = s"""
    SELECT pw - (CAST(gw AS DOUBLE) / 1.0E9) / n AS w,
           pb - (CAST(gb AS DOUBLE) / 1.0E9) / n AS b,
           n,
           CAST(sq AS DOUBLE) / 1.0E9 AS sse
    FROM (
      SELECT max(w) AS pw, max(b) AS pb, count(*) AS n,
             sum(CAST(round(e * x * 1.0E9) AS BIGINT)) AS gw,
             sum(CAST(round(e * 1.0E9) AS BIGINT)) AS gb,
             sum(CAST(round(e * e * 1.0E9) AS BIGINT)) AS sq
      FROM (
        SELECT x, w, b,
               (0.5 + z / (2.0 * (1.0 + abs(z)))) - yl AS e
        FROM (SELECT x, yl, w, b, w * x + b AS z
              FROM $pts CROSS JOIN $w)))"""

  // shared Cramer / r² expression text for the 2-feature OLS — the SAME
  // strings run as Spark selectExpr and inside the DuckDB oracle, so the
  // double arithmetic is structurally identical on both sides.
  private val olsDetExprs = Seq(
    // det of [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] and Cramer numerators
    "n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det",
    "sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0",
    "n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1",
    "n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS det2")
  private val olsOutExprs = Seq(
    "CAST(n AS BIGINT) AS n",
    "round(det0/det, 6) AS b0",
    "round(det1/det, 6) AS b1",
    "round(det2/det, 6) AS b2",
    // SSE = Σy² − b·X'y ; SST = Σy² − (Σy)²/n ; r² = 1 − SSE/SST
    "round(1.0 - (syy - (det0/det)*sy - (det1/det)*s1y - (det2/det)*s2y)" +
      " / (syy - sy*sy/n), 6) AS r2")

  val all: Seq[Q] = Seq(

    // ---- k-means, k=3, 2 fixed Lloyd iterations unrolled. Each
    // iteration: one scan (assignment is a row-local CASE against the
    // broadcast 1-row centroid table) + a map-side partial aggregation
    // to k rows. The fixed iteration count is the determinism pin AND
    // the scale pin (convergence-looped k-means runs the same plan per
    // round; the BSP graph family already demonstrates loop-until-
    // converged with lineage truncation). ----
    Q(
      "ml_kmeans_fixed_iters",
      Some(s"""
        WITH pts AS ($pricePointsSql),
        c1 AS (SELECT 100.0 AS cx0, 5000000.0 AS cy0,
                      250.0 AS cx1, 25000000.0 AS cy1,
                      400.0 AS cx2, 45000000.0 AS cy2),
        a1 AS (${assignSql("pts", "c1")}),
        c2 AS (${widenSql("a1")}),
        a2 AS (${assignSql("pts", "c2")})
        SELECT CAST(c AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n,
               round(sum(x)/count(*), 4) AS cx,
               round(sum(y)/count(*), 4) AS cy
        FROM a2 GROUP BY c ORDER BY cluster"""),
      (s, dir) => {
        val pts = pricePoints(s, dir)
        val c1 = s.range(1).select(
          lit(100.0).as("cx0"), lit(5000000.0).as("cy0"),
          lit(250.0).as("cx1"), lit(25000000.0).as("cy1"),
          lit(400.0).as("cx2"), lit(45000000.0).as("cy2"))
        val a1 = pts.crossJoin(broadcast(c1)).withColumn("c", assignExpr)
        val c2 = widen(a1)
        val a2 = pts.crossJoin(broadcast(c2)).withColumn("c", assignExpr)
        a2.groupBy(col("c").as("cluster"))
          .agg(count(lit(1)).as("n"),
            round(sum("x") / count(lit(1)), 4).as("cx"),
            round(sum("y") / count(lit(1)), 4).as("cy"))
          .orderBy("cluster")
      }),

    // ---- logistic regression, 3 full-batch gradient steps unrolled
    // (lr=1, fast-sigmoid link, fixed-point gradient sums — scaladoc).
    // Emits the init and final quantized SSE so descent is visible in
    // the oracled row itself. On this synthetic table the label is
    // nearly independent of price, so ŵ→~0 and b̂→(mean(y)−0.5)·ish —
    // the capability under test is the deterministic distributed train
    // loop, not the synthetic signal. ----
    Q(
      "ml_logreg_gd", {
        val pts = """
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) / 5.0E7 AS x,
                 CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS yl
          FROM orders"""
        Some(s"""
          WITH pts AS ($pts),
          w0 AS (SELECT 0.0 AS w, 0.0 AS b),
          w1 AS (${logregStepSql("pts", "w0")}),
          w2 AS (${logregStepSql("pts", "w1")}),
          w3 AS (${logregStepSql("pts", "w2")})
          SELECT CAST(w1.n AS BIGINT) AS n,
                 round(w3.w, 6) AS w, round(w3.b, 6) AS b,
                 round(w1.sse, 4) AS sse_init, round(w3.sse, 4) AS sse_last
          FROM w1 CROSS JOIN w3""")
      },
      (s, dir) => {
        val pts = t(s, dir, "orders").selectExpr(
          "CAST(round(o_totalprice * 100) AS BIGINT) / 5.0E7 AS x",
          "CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS yl")
        val w0 = s.range(1).select(lit(0.0).as("w"), lit(0.0).as("b"))
        val w1 = logregStep(pts, w0)
        val w2 = logregStep(pts, w1.select("w", "b"))
        val w3 = logregStep(pts, w2.select("w", "b"))
        w1.select(col("n"), col("sse").as("sse_init"))
          .crossJoin(broadcast(
            w3.select(col("w"), col("b"), col("sse").as("sse_last"))))
          .selectExpr("CAST(n AS BIGINT) AS n", "round(w, 6) AS w",
            "round(b, 6) AS b", "round(sse_init, 4) AS sse_init",
            "round(sse_last, 4) AS sse_last")
      }),

    // ---- 2-feature OLS via normal equations: nine exact integer sums
    // in ONE aggregation pass (DECIMAL(38,0) accumulation ≙ DuckDB
    // HUGEINT — Σy² overflows BIGINT), then Cramer's rule + r² in
    // doubles via expression text SHARED with the oracle. The 100 TB
    // story is the whole point: training a linear model is one map-side-
    // combined scan producing a single 9-number row, not a toPandas. ----
    Q(
      "ml_linreg_two_features", {
        val f = """
          SELECT CAST(o_orderkey % 500 AS BIGINT) AS x1,
                 CAST(o_custkey % 300 AS BIGINT) AS x2,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS y
          FROM orders"""
        Some(s"""
          WITH f AS ($f),
          sums AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(CAST(sum(x1) AS HUGEINT) AS DOUBLE) AS s1,
                   CAST(CAST(sum(x2) AS HUGEINT) AS DOUBLE) AS s2,
                   CAST(CAST(sum(y)  AS HUGEINT) AS DOUBLE) AS sy,
                   CAST(CAST(sum(x1*x1) AS HUGEINT) AS DOUBLE) AS s11,
                   CAST(CAST(sum(x1*x2) AS HUGEINT) AS DOUBLE) AS s12,
                   CAST(CAST(sum(x2*x2) AS HUGEINT) AS DOUBLE) AS s22,
                   CAST(CAST(sum(x1*y) AS HUGEINT) AS DOUBLE) AS s1y,
                   CAST(CAST(sum(x2*y) AS HUGEINT) AS DOUBLE) AS s2y,
                   CAST(sum(CAST(y AS HUGEINT)*y) AS DOUBLE) AS syy
            FROM f),
          dets AS (SELECT *, ${olsDetExprs.mkString(", ")} FROM sums)
          SELECT ${olsOutExprs.mkString(", ")} FROM dets""")
      },
      (s, dir) =>
        t(s, dir, "orders")
          .selectExpr(
            "CAST(o_orderkey % 500 AS BIGINT) AS x1",
            "CAST(o_custkey % 300 AS BIGINT) AS x2",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS y")
          .agg(
            expr("CAST(count(*) AS DOUBLE)").as("n"),
            expr("CAST(sum(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE)").as("s1"),
            expr("CAST(sum(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE)").as("s2"),
            expr("CAST(sum(CAST(y  AS DECIMAL(38,0))) AS DOUBLE)").as("sy"),
            expr("CAST(sum(CAST(x1*x1 AS DECIMAL(38,0))) AS DOUBLE)").as("s11"),
            expr("CAST(sum(CAST(x1*x2 AS DECIMAL(38,0))) AS DOUBLE)").as("s12"),
            expr("CAST(sum(CAST(x2*x2 AS DECIMAL(38,0))) AS DOUBLE)").as("s22"),
            expr("CAST(sum(CAST(x1*y AS DECIMAL(38,0))) AS DOUBLE)").as("s1y"),
            expr("CAST(sum(CAST(x2*y AS DECIMAL(38,0))) AS DOUBLE)").as("s2y"),
            expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").as("syy"))
          .selectExpr(("*" +: olsDetExprs): _*)
          .selectExpr(olsOutExprs: _*)),

    // ---- feature standardization (z-score + min-max): the stats pass
    // reduces to ONE broadcastable row (exact integer Σ, Σ², min, max),
    // then one row-local projection pass — the standard large-scale
    // feature-engineering shape (never a per-feature window over the
    // whole table, which would sort/shuffle 100 TB). ----
    Q(
      "ml_standardize_features",
      Some("""
        WITH f AS (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS y
          FROM orders),
        st AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(CAST(sum(y) AS HUGEINT) AS DOUBLE) AS sy,
                 CAST(sum(CAST(y AS HUGEINT)*y) AS DOUBLE) AS syy,
                 CAST(min(y) AS DOUBLE) AS ymin,
                 CAST(max(y) AS DOUBLE) AS ymax
          FROM f)
        SELECT o_orderkey,
               round((y - sy/n) / sqrt((n*syy - sy*sy) / (n*(n-1.0))), 6)
                 AS z_price,
               round((y - ymin) / (ymax - ymin), 6) AS mm_price
        FROM f CROSS JOIN st ORDER BY o_orderkey"""),
      (s, dir) => {
        val f = t(s, dir, "orders").selectExpr("o_orderkey",
          "CAST(round(o_totalprice * 100) AS BIGINT) AS y")
        val st = f.agg(
          expr("CAST(count(*) AS DOUBLE)").as("n"),
          expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").as("sy"),
          expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").as("syy"),
          expr("CAST(min(y) AS DOUBLE)").as("ymin"),
          expr("CAST(max(y) AS DOUBLE)").as("ymax"))
        f.crossJoin(broadcast(st))
          .selectExpr("o_orderkey",
            "round((y - sy/n) / sqrt((n*syy - sy*sy) / (n*(n-1.0))), 6)" +
              " AS z_price",
            "round((y - ymin) / (ymax - ymin), 6) AS mm_price")
          .orderBy("o_orderkey")
      })
  )
}
