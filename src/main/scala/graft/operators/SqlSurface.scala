package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Q, QueryModule, Tables}

/** SQL-text entry point — the engine's equivalent of the reference's
  * Thrift-Server/BI surface (EP2, reference docker-compose.yml:70-88):
  * ANSI SQL strings parsed and planned by Spark SQL over catalog-registered
  * views. Each query here is dialect-shared — the SAME text runs in DuckDB
  * as the oracle — which exercises the parser → analyzer (view/catalog
  * resolution) → optimizer (subquery decorrelation) path that DataFrame
  * queries bypass.
  *
  * Float discipline: any aggregate feeding a comparison or ranking uses
  * integer cents (exact, order-independent) so ranks can't flip on
  * summation-order ulps between engines.
  */
object SqlSurface extends QueryModule {

  private def sql(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      Tables.registerViews(s, dir)
      s.sql(text)
    }

  private val topSpenders = """
    WITH cust_spend AS (
      SELECT c_custkey, c_mktsegment,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment)
    SELECT c_mktsegment, c_custkey, spend_cents, rnk FROM (
      SELECT c_mktsegment, c_custkey, spend_cents,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY spend_cents DESC, c_custkey) AS BIGINT) AS rnk
      FROM cust_spend)
    WHERE rnk <= 5
    ORDER BY c_mktsegment, rnk"""

  private val existsBigOrder = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey"""

  private val correlatedCount = """
    SELECT c_custkey,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_custkey = c_custkey) AS n_orders
    FROM customer ORDER BY c_custkey"""

  // WITH RECURSIVE (Spark 4's iterative SQL surface — the UnionLoop plan):
  // ancestor chain over the implicit heap hierarchy parent(n) = floor(n/2)
  // rooted at 0; depth = chain length. The division goes through floor()
  // on a DOUBLE so the same text means the same thing in both engines
  // (DuckDB's int '/' yields double, Spark's yields int).
  private val recursiveHierarchy = """
    WITH RECURSIVE anc(node, a) AS (
      SELECT n_nationkey, n_nationkey FROM nation
      UNION ALL
      SELECT node, CAST(floor(a / 2.0) AS INT) FROM anc WHERE a > 0)
    SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS depth
    FROM anc GROUP BY node ORDER BY node"""

  // correlated LATERAL subquery with per-row ORDER BY + LIMIT (the SQL
  // form of top-1-per-group; Catalyst decorrelates it into a join rather
  // than executing the inner query per row)
  private val lateralTop1 = """
    SELECT c.c_custkey, o.o_orderkey, o.cents
    FROM customer c,
    LATERAL (SELECT o_orderkey,
                    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
    ORDER BY c.c_custkey"""

  // NOT IN vs NOT EXISTS under three-valued logic: a NULL in the NOT IN
  // subquery makes every comparison UNKNOWN → zero rows, while NOT EXISTS
  // is null-agnostic. The classic silent-wrong-answer trap — pinned as an
  // engine-semantics contract (both engines agree).
  private val notInNulls = """
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM customer
       WHERE c_custkey NOT IN
         (SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM orders
                                    WHERE o_totalprice > 400000))
          FROM orders WHERE o_totalprice > 400000)) AS n_not_in_with_null,
      (SELECT CAST(count(*) AS BIGINT) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 400000)) AS n_not_exists"""

  private val groupByAll = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY ALL ORDER BY ALL"""

  private val intersectAllCounts = """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey FROM customer WHERE c_custkey % 2 = 0
      INTERSECT ALL
      SELECT c_nationkey FROM customer WHERE c_custkey % 3 = 0)
    GROUP BY 1 ORDER BY 1"""

  private val exceptAllCounts = """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey FROM customer WHERE c_custkey % 2 = 0
      EXCEPT ALL
      SELECT c_nationkey FROM customer WHERE c_custkey % 3 = 0)
    GROUP BY 1 ORDER BY 1"""

  private val valuesInlineDim = """
    SELECT tier, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                 ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                 ('5-LOW', 'cold')) AS tiers(prio, tier)
      ON o_orderpriority = prio
    GROUP BY tier ORDER BY tier"""

  private val hintedJoin = """
    SELECT /*+ BROADCAST(nation), MERGE(orders) */ n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS spend_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1 ORDER BY 1"""

  val all: Seq[Q] = Seq(
    Q("sql_not_in_null_semantics", Some(notInNulls), sql(notInNulls)),
    Q("sql_cte_window_topk", Some(topSpenders), sql(topSpenders)),
    Q("sql_exists_subquery", Some(existsBigOrder), sql(existsBigOrder)),
    Q("sql_correlated_scalar_subquery", Some(correlatedCount), sql(correlatedCount)),
    Q("sql_recursive_cte_hierarchy", Some(recursiveHierarchy),
      sql(recursiveHierarchy)),
    Q("sql_lateral_topk", Some(lateralTop1), sql(lateralTop1)),

    // GROUP BY ALL / ORDER BY ALL (the modern analyst shorthand both
    // Spark 4 and DuckDB implement): grouping keys inferred as every
    // non-aggregate select item, ordering over the full select list —
    // one shared text, parsed by both engines.
    Q(
      "sql_group_by_all",
      Some(groupByAll),
      sql(groupByAll)),

    // SQL PIVOT clause (the parser-level relational pivot, distinct from
    // the Dataset .pivot API already covered): statuses become columns
    // with per-cell counts. Spark's PIVOT yields NULL for an empty cell
    // where a conditional-aggregation spelling yields 0 — the coalesce
    // makes both engines agree at every scale factor. Oracle is the
    // portable conditional-aggregation form (PIVOT syntax differs across
    // dialects; cell semantics are what the hash compares).
    Q(
      "sql_pivot_clause",
      Some("""
        SELECT o_orderpriority,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cnt,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cnt,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cnt
        FROM orders GROUP BY 1 ORDER BY 1"""),
      sql("""
        SELECT o_orderpriority,
               CAST(coalesce(F, 0) AS BIGINT) AS f_cnt,
               CAST(coalesce(O, 0) AS BIGINT) AS o_cnt,
               CAST(coalesce(P, 0) AS BIGINT) AS p_cnt
        FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
        PIVOT (count(*) FOR o_orderstatus IN ('F' AS F, 'O' AS O, 'P' AS P))
        ORDER BY o_orderpriority""")),

    // parameterized SQL (named-parameter binding, Spark 3.4+): the
    // injection-safe text interface a service layer uses — parameters
    // bind as literals in the parser, never string-spliced. Oracle is
    // the same query with the literal inlined.
    Q(
      "sql_parameterized",
      Some("""
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        FROM orders WHERE o_totalprice > 400000
        GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        Tables.registerViews(s, dir)
        s.sql(
          """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
             FROM orders WHERE o_totalprice > :lim
             GROUP BY 1 ORDER BY 1""",
          Map("lim" -> 400000))
      }),

    // SQL scalar UDF (CREATE FUNCTION ... RETURN expr, Spark 4): the
    // declarative UDF — inlined by the analyzer into the plan, so it
    // keeps codegen and pushdown (vs a JVM-closure UDF, which is an
    // opaque black box to the optimizer). Oracle inlines the body.
    Q(
      "sql_udf_scalar",
      Some("""
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        Tables.registerViews(s, dir)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION order_cents(p DOUBLE)
                 RETURNS BIGINT RETURN CAST(round(p * 100) AS BIGINT)""")
        s.sql("""
          SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(order_cents(o_totalprice)) AS BIGINT) AS cents
          FROM orders GROUP BY 1 ORDER BY 1""")
      }),

    // bag-semantics set ops — INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicity (min / difference of per-row counts), which the
    // DISTINCT-semantics setop_* family can't observe; nationkey repeats
    // across customers, so multiplicity is load-bearing here. The final
    // group-count makes the multiset itself the compared value.
    Q("setop_intersect_all", Some(intersectAllCounts),
      sql(intersectAllCounts)),
    Q("setop_except_all", Some(exceptAllCounts), sql(exceptAllCounts)),

    // inline VALUES relation joined to data — the literal-dim pattern
    // (tier mapping shipped in the query text, no table required)
    Q("sql_values_inline_dim", Some(valuesInlineDim), sql(valuesInlineDim)),

    // join-strategy hints — the operator-level knob a 100 TB user turns
    // when the planner's estimate is wrong: BROADCAST pins the bounded
    // dim to a broadcast-hash join (no shuffle of the big side), MERGE
    // pins the fact⋈fact join to sort-merge (skew/memory-safe).
    // Dialect-shared by construction: a /*+ ... */ hint is a plain block
    // comment to DuckDB, so the SAME text runs as the oracle.
    // PlansSpec pins that both hints actually took effect in the
    // physical plan.
    Q("sql_join_hints", Some(hintedJoin), sql(hintedJoin))
  )
}
