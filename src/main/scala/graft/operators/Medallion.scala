package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, QueryModule, Tables}
import graft.functions.Cleaning

/** The reference's medallion pipeline semantics (SURVEY.md §2.2/§2.3):
  * bronze→silver cleaning (reference airflow/dags/realestate_pipeline.py:
  * 143-158), silver rename-projection + typed parsing (app/sliver.py:86-89,
  * 143-155), gold feature engineering (realestate_pipeline.py:175-187).
  *
  * The testdata has no Vietnamese listing strings, so the dirty inputs are
  * CONSTRUCTED deterministically from integer columns (int→string casts
  * format identically in Spark and DuckDB; double→string does not). The
  * construction covers every branch of the F1–F3 truth table
  * (FIXTURES.md §1.4): plain / comma-decimal / dotted / blank / garbage.
  */
object Medallion extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Bronze-shaped dirty strings derived from orders (deterministic). */
  private def bronzeish(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = (col("o_orderkey") % 1000).cast("int").cast("string")
    val dec = (col("o_orderkey") % 10).cast("int").cast("string")
    o.select(
      col("o_orderkey").as("id"),
      when(col("o_orderkey") % 5 === 0, concat(base, lit(" m²")))
        .when(col("o_orderkey") % 5 === 1, concat(base, lit(","), dec, lit(" m²")))
        .when(col("o_orderkey") % 5 === 2, concat(base, lit("."), dec))
        .when(col("o_orderkey") % 5 === 3, lit(""))
        .otherwise(lit("n/a")).as("area_raw"),
      when(col("o_orderkey") % 4 === 0, concat(base, lit("."), dec, lit(" tỷ")))
        .when(col("o_orderkey") % 4 === 1, concat(base, lit(" triệu")))
        .when(col("o_orderkey") % 4 === 2, concat(base, lit("000000")))
        .otherwise(lit("")).as("price_raw"),
      when(col("o_orderkey") % 3 === 0, base)
        .when(col("o_orderkey") % 3 === 1, concat(base, lit("."), dec))
        .otherwise(lit("x")).as("floors_raw"))
  }

  /** DuckDB SQL fragment reproducing the bronzeish construction. */
  private val bronzeishSql = """
    SELECT o_orderkey AS id,
      CASE o_orderkey % 5
        WHEN 0 THEN CAST(o_orderkey % 1000 AS INT) || ' m²'
        WHEN 1 THEN CAST(o_orderkey % 1000 AS INT) || ',' || CAST(o_orderkey % 10 AS INT) || ' m²'
        WHEN 2 THEN CAST(o_orderkey % 1000 AS INT) || '.' || CAST(o_orderkey % 10 AS INT)
        WHEN 3 THEN ''
        ELSE 'n/a' END AS area_raw,
      CASE o_orderkey % 4
        WHEN 0 THEN CAST(o_orderkey % 1000 AS INT) || '.' || CAST(o_orderkey % 10 AS INT) || ' tỷ'
        WHEN 1 THEN CAST(o_orderkey % 1000 AS INT) || ' triệu'
        WHEN 2 THEN CAST(o_orderkey % 1000 AS INT) || '000000'
        ELSE '' END AS price_raw,
      CASE o_orderkey % 3
        WHEN 0 THEN CAST(o_orderkey % 1000 AS INT)::VARCHAR
        WHEN 1 THEN CAST(o_orderkey % 1000 AS INT) || '.' || CAST(o_orderkey % 10 AS INT)
        ELSE 'x' END AS floors_raw
    FROM orders"""

  /** DuckDB equivalents of the F1–F3 parse semantics (see Cleaning.scala).
    * NOTE: DuckDB regexp_replace needs the 'g' flag (Spark's is global). */
  private def sqlParseArea(c: String) =
    s"TRY_CAST(replace(regexp_extract(nullif(trim($c), ''), '[0-9,.]+', 0), ',', '') AS DOUBLE)"
  private def sqlParseNumber(c: String) =
    s"""CASE WHEN regexp_matches(trim($c), '^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$$')
         THEN CAST(trunc(TRY_CAST(trim($c) AS DOUBLE)) AS BIGINT) END"""
  private def sqlNormalizePrice(c: String) =
    s"""CASE WHEN nullif(trim($c), '') IS NULL THEN NULL
         WHEN contains(lower($c), 'tỷ')
           THEN TRY_CAST(regexp_extract(lower($c), '[0-9.]+', 0) AS DOUBLE)
         WHEN contains(lower($c), 'triệu')
           THEN TRY_CAST(regexp_extract(lower($c), '[0-9.]+', 0) AS DOUBLE) / 1000
         ELSE TRY_CAST(nullif(regexp_replace(lower($c), '[^0-9]', '', 'g'), '') AS DOUBLE) / 1e9
       END"""

  val all: Seq[Q] = Seq(

    // ---- P1/F4: rename-projection (schema standardization), including a
    // Vietnamese-identifier hop to prove UTF-8 column names work natively
    // (reference app/sliver.py:143-155) ----
    Q(
      "p1_rename_projection",
      Some("""
        SELECT doc_id AS id, lang AS language, source AS origin,
               CAST(n_chars AS BIGINT) AS size_chars
        FROM documents ORDER BY id"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id").as("id"),
            col("lang").as("Ngôn ngữ"),
            col("source").as("origin"),
            col("n_chars").cast("long").as("size_chars"))
          .withColumnRenamed("Ngôn ngữ", "language")
          .select("id", "language", "origin", "size_chars")
          .orderBy("id")),

    // ---- silver_clean: the F1–F3 parsers applied in a P1-style projection
    // (the reference DECLARES these UDFs but never wires them —
    // app/sliver.py:86-89; we implement the intent) ----
    Q(
      "silver_clean",
      Some(s"""
        SELECT id,
               ${sqlParseArea("area_raw")} AS area,
               ${sqlParseNumber("floors_raw")} AS floors,
               ${sqlNormalizePrice("price_raw")} AS price
        FROM ($bronzeishSql)
        ORDER BY id"""),
      (s, dir) =>
        bronzeish(s, dir)
          .select(
            col("id"),
            Cleaning.parseArea(col("area_raw")).as("area"),
            Cleaning.parseNumber(col("floors_raw")).cast("long").as("floors"),
            Cleaning.normalizePrice(col("price_raw")).as("price"))
          .orderBy("id")),

    // ---- the plain registered-UDF mechanism (SURVEY §2.6: the
    // reference's literal `udf(fn, ReturnType)` path, app/sliver.py:86-89)
    // demonstrated once for surface completeness: a Scala closure UDF is
    // an optimizer black box (no codegen, no pushdown through it), which
    // is exactly why every OTHER query here uses built-ins or custom
    // Expressions. Parity with the declarative spelling is what the
    // oracle checks. ----
    Q(
      "scalar_udf_registered",
      Some(s"""
        SELECT id,
               CAST(length(area_raw) - length(replace(area_raw, ',', ''))
                 AS BIGINT) AS n_commas
        FROM ($bronzeishSql) ORDER BY id"""),
      (s, dir) => {
        val countCommas = udf((raw: String) =>
          if (raw == null) null
          else java.lang.Long.valueOf(raw.count(_ == ',').toLong))
        bronzeish(s, dir)
          .select(col("id"), countCommas(col("area_raw")).as("n_commas"))
          .orderBy("id")
      }),

    // ---- P2: null-drop filter (reference realestate_pipeline.py:148).
    // Catalyst pushes the IsNotNull filter BELOW the projection by
    // substituting the parse expressions into it, so the parse chain
    // evaluates twice per surviving row. That is the optimizer's
    // deliberate trade (filter early > evaluate once) and we keep it:
    // at scale, row reduction before downstream ops wins; forcing
    // single-eval would need a lineage barrier (cache/checkpoint) that
    // costs more than the recompute. ----
    Q(
      "p2_null_drop",
      Some(s"""
        SELECT id, area, price FROM (
          SELECT id,
                 ${sqlParseArea("area_raw")} AS area,
                 ${sqlNormalizePrice("price_raw")} AS price
          FROM ($bronzeishSql))
        WHERE area IS NOT NULL AND price IS NOT NULL
        ORDER BY id"""),
      (s, dir) =>
        bronzeish(s, dir)
          .select(
            col("id"),
            Cleaning.parseArea(col("area_raw")).as("area"),
            Cleaning.normalizePrice(col("price_raw")).as("price"))
          .na.drop(Seq("area", "price"))
          .orderBy("id")),

    // ---- P3: duplicate elimination on all columns (realestate_pipeline.py:149) ----
    Q(
      "p3_drop_duplicates",
      Some("""
        SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS segment
        FROM customer ORDER BY 1, 2"""),
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_nationkey").cast("long").as("nationkey"),
            col("c_mktsegment").as("segment"))
          .dropDuplicates()
          .orderBy("nationkey", "segment")),

    // ---- P4: type casts (realestate_pipeline.py:152-154). ANSI-safe:
    // double→long truncates, int→string and timestamp→date are exact ----
    Q(
      "p4_type_casts",
      Some("""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
               CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
               CAST(l_linenumber AS VARCHAR) AS line_str,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day
        FROM lineitem ORDER BY l_orderkey, line_no"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("line_no"),
            col("l_quantity").cast("long").as("qty_int"),
            col("l_linenumber").cast("string").as("line_str"),
            col("l_shipdate").cast("date").cast("string").as("ship_day"))
          .orderBy("l_orderkey", "line_no")),

    // ---- P5: CASE WHEN categorical encoding (realestate_pipeline.py:175-180) ----
    Q(
      "p5_case_when_encoding",
      Some("""
        SELECT doc_id, lang,
               CAST(CASE WHEN lang = 'en' THEN 2 WHEN lang = 'zh' THEN 1
                    ELSE 0 END AS BIGINT) AS lang_encoded
        FROM documents ORDER BY doc_id"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            when(col("lang") === "en", 2L)
              .when(col("lang") === "zh", 1L)
              .otherwise(0L).as("lang_encoded"))
          .orderBy("doc_id")),

    // ---- P6: arithmetic derived column with pinned divide-by-zero
    // (price_per_m2, realestate_pipeline.py:183; nullif per SURVEY §7.4) ----
    Q(
      "p6_derived_ratio",
      Some("""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
               l_extendedprice / nullif(l_quantity, 0) AS unit_price
        FROM lineitem ORDER BY l_orderkey, line_no"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("line_no"),
            (col("l_extendedprice") / nullif(col("l_quantity"), lit(0)))
              .as("unit_price"))
          .orderBy("l_orderkey", "line_no")),

    // ---- P7: schema reconciliation — fill a missing expected column with
    // typed null (the INTENT of realestate_pipeline.py:143-146, minus its
    // crash-if-missing bug) ----
    Q(
      "p7_schema_reconciliation",
      Some("""
        SELECT doc_id, lang, CAST(NULL AS DOUBLE) AS quality_score
        FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        val df = t(s, dir, "documents").select("doc_id", "lang")
        val expected = Seq("doc_id" -> "bigint", "lang" -> "string",
          "quality_score" -> "double")
        val reconciled = expected.foldLeft(df) { case (d, (c, tpe)) =>
          if (d.columns.contains(c)) d
          else d.withColumn(c, lit(null).cast(tpe))
        }
        reconciled.select("doc_id", "lang", "quality_score").orderBy("doc_id")
      }),

    // ---- F5: date extraction from crawl filenames (app/sliver.py:162-164) ----
    Q(
      "f5_filename_date",
      Some("""
        SELECT fname,
               CAST(CAST(strptime(regexp_extract(fname, 'crawl_([0-9]{8})_', 1),
                    '%Y%m%d') AS DATE) AS VARCHAR) AS file_date,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT 'crawl_' || strftime(o_orderdate, '%Y%m%d') || '_120000.json'
                AS fname FROM orders)
        GROUP BY 1, 2 ORDER BY 1"""),
      (s, dir) =>
        t(s, dir, "orders")
          .select(concat(lit("crawl_"),
            date_format(col("o_orderdate"), "yyyyMMdd"),
            lit("_120000.json")).as("fname"))
          .groupBy(
            col("fname"),
            to_date(regexp_extract(col("fname"), "crawl_([0-9]{8})_", 1),
              "yyyyMMdd").cast("string").as("file_date"))
          .agg(count(lit(1)).as("n"))
          .orderBy("fname")),

    // ---- gold: P5+P6 composed — the reference's gold feature table
    // (realestate_pipeline.py:175-187) over a silver-shaped projection ----
    Q(
      "gold_features",
      Some("""
        SELECT o_orderkey AS id, c_mktsegment AS location,
               CAST(CASE WHEN c_mktsegment = 'MACHINERY' THEN 2
                    WHEN c_mktsegment = 'BUILDING' THEN 1
                    ELSE 0 END AS BIGINT) AS location_encoded,
               o_totalprice AS price,
               CAST(o_orderkey % 500 + 1 AS DOUBLE) AS area,
               o_totalprice / nullif(CAST(o_orderkey % 500 + 1 AS DOUBLE), 0)
                 AS price_per_m2
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY id"""),
      (s, dir) => {
        val area = (col("o_orderkey") % 500 + 1).cast("double")
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(
            col("o_orderkey").as("id"),
            col("c_mktsegment").as("location"),
            when(col("c_mktsegment") === "MACHINERY", 2L)
              .when(col("c_mktsegment") === "BUILDING", 1L)
              .otherwise(0L).as("location_encoded"),
            col("o_totalprice").as("price"),
            area.as("area"),
            (col("o_totalprice") / nullif(area, lit(0.0))).as("price_per_m2"))
          .orderBy("id")
      }),

    // ---- the ML-prep step (reference realestate_pipeline.py:217-224:
    // sklearn 80/20 random_state split after toPandas) re-expressed
    // engine-side: a DETERMINISTIC hash split — reproducible across runs
    // and cluster sizes (a seeded randomSplit reshuffles with
    // partitioning; a hash of the row key never does), computed in the
    // same distributed pass that assembles the feature columns. The
    // referee for the 80/20 intent is the split-fraction check; the
    // assignment itself is exact and oracled. ----
    Q(
      "gold_train_test_split",
      Some("""
        SELECT CASE WHEN (o_orderkey * 1000003) % 4294967296 % 5 = 0
                    THEN 'test' ELSE 'train' END AS split,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS price_cents
        FROM orders GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        t(s, dir, "orders")
          // explicit multiplicative hash, not hash(): Spark's Murmur3 and
          // DuckDB's hash() disagree, and the split must be reproducible
          // by ANY engine reading the table
          .withColumn("split",
            when(col("o_orderkey") * 1000003L % 4294967296L % 5 === 0,
              lit("test")).otherwise(lit("train")))
          .groupBy("split")
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("price_cents"))
          .orderBy("split")),

    // ---- the ML train step itself (reference realestate_pipeline.py:
    // 224-234 fits sklearn RandomForest + r² driver-side after toPandas)
    // closed ENGINE-side with public math: ordinary least squares of
    // price on area has the closed form slope = (n·Σxy − Σx·Σy) /
    // (n·Σx² − (Σx)²) — one distributed aggregation pass, no ML library.
    // Oracle determinism: every Σ is an EXACT integer (x is a small int,
    // y is price in integer cents; sums in DECIMAL(38,0) / HUGEINT), so
    // both engines convert the SAME exact integers to double and apply
    // the SAME IEEE ops — unlike regr_slope/regr_r2, whose internal
    // double accumulation order differs across engines (the float-sum
    // digit-flip trap). Same one-pass shape fits 100 TB: six map-side
    // partial sums, one exchange of a single row. ----
    Q(
      "gold_regression_fit",
      Some("""
        WITH f AS (
          SELECT CAST(o_orderkey % 500 + 1 AS BIGINT) AS x,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS y
          FROM orders),
        s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x*x) AS HUGEINT) AS sxx,
                 CAST(sum(x*y) AS HUGEINT) AS sxy,
                 CAST(sum(y*y) AS HUGEINT) AS syy
          FROM f),
        d AS (
          SELECT n, sx, sy,
                 n*sxy - sx*sy AS num,
                 n*sxx - sx*sx AS den,
                 n*syy - sy*sy AS deny
          FROM s)
        SELECT CAST(n AS BIGINT) AS n,
               round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
                 AS slope_cents,
               round((CAST(sy AS DOUBLE) - CAST(num AS DOUBLE)
                   / CAST(den AS DOUBLE) * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE), 6) AS intercept_cents,
               round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                   / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 6) AS r2
        FROM d"""),
      (s, dir) =>
        t(s, dir, "orders")
          .selectExpr(
            "CAST(o_orderkey % 500 + 1 AS BIGINT) AS x",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS y")
          .agg(
            // per-row products fit BIGINT; their SUMS don't (Σy² ≈ 5e19 at
            // sf0.01) — cast each addend to decimal so Spark accumulates
            // in DECIMAL(38,0), the analogue of DuckDB's HUGEINT sum
            expr("CAST(count(*) AS DECIMAL(38,0))").as("n"),
            expr("sum(CAST(x AS DECIMAL(38,0)))").as("sx"),
            expr("sum(CAST(y AS DECIMAL(38,0)))").as("sy"),
            expr("sum(CAST(x*x AS DECIMAL(38,0)))").as("sxx"),
            expr("sum(CAST(x*y AS DECIMAL(38,0)))").as("sxy"),
            expr("sum(CAST(y*y AS DECIMAL(38,0)))").as("syy"))
          .selectExpr("n", "sx", "sy",
            "n*sxy - sx*sy AS num",
            "n*sxx - sx*sx AS den",
            "n*syy - sy*sy AS deny")
          .selectExpr(
            "CAST(n AS BIGINT) AS n",
            "round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS slope_cents",
            "round((CAST(sy AS DOUBLE) - CAST(num AS DOUBLE)" +
              " / CAST(den AS DOUBLE) * CAST(sx AS DOUBLE))" +
              " / CAST(n AS DOUBLE), 6) AS intercept_cents",
            "round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)" +
              " / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 6) AS r2")),

    // ---- data-quality constraint audit (Deequ-style expectations): every
    // constraint is an aggregate over ONE shared scan — completeness,
    // uniqueness, domain membership, range, and referential integrity
    // (orphan keys vs customer) — emitted as (constraint, n_violations,
    // passed) rows. At 100 TB this is the same single fact-table pass any
    // one of the checks would cost; the RI check adds one keyed anti-join
    // against the (much smaller, broadcastable) dimension. ----
    Q(
      "quality_constraint_audit",
      Some("""
        SELECT constraint_name, n_violations, n_violations = 0 AS passed
        FROM (
          SELECT 'orderdate_in_range' AS constraint_name,
                 CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
                       OR o_orderdate >= TIMESTAMP '2000-01-01') AS BIGINT)
                   AS n_violations
          FROM orders
          UNION ALL
          SELECT 'orderkey_not_null',
                 CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'orderkey_unique',
                 CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'custkey_referential',
                 CAST(count(*) AS BIGINT)
          FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey IS NULL
          UNION ALL
          SELECT 'status_in_domain',
                 CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
                   AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'totalprice_positive',
                 CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
          FROM orders)
        ORDER BY constraint_name"""),
      (s, dir) => {
        // ONE fact scan: broadcast-left-join the dimension keys, then
        // every constraint — including referential integrity (unmatched
        // c_custkey) — is a conditional aggregate in the same pass
        val o = t(s, dir, "orders").join(
          broadcast(t(s, dir, "customer").select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left")
        val wide = o.agg(
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
            .as("custkey_referential"),
          sum(when(col("o_orderdate") < lit("1992-01-01") ||
            col("o_orderdate") >= lit("2000-01-01"), 1L).otherwise(0L))
            .as("orderdate_in_range"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .as("orderkey_not_null"),
          (count(lit(1)) - countDistinct(col("o_orderkey")))
            .as("orderkey_unique"),
          sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
            .as("status_in_domain"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
            .as("totalprice_positive"))
        wide.selectExpr(
          """stack(6,
             'custkey_referential', custkey_referential,
             'orderdate_in_range', orderdate_in_range,
             'orderkey_not_null', orderkey_not_null,
             'orderkey_unique', orderkey_unique,
             'status_in_domain', status_in_domain,
             'totalprice_positive', totalprice_positive)
             AS (constraint_name, n_violations)""")
          .withColumn("passed", col("n_violations") === 0)
          .orderBy("constraint_name")
      }),

    // ---- single-scan column profiler (ANALYZE-style data profiling):
    // count / nulls / distinct / integer-cents min-max for five columns
    // of orders in ONE aggregate pass, unpivoted to a row per column.
    // The oracle recomputes each column's profile independently. ----
    Q(
      "quality_profile_columns",
      Some("""
        SELECT * FROM (
          SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
                   AS n_nulls,
                 CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
                 CAST(min(o_custkey) * 100 AS BIGINT) AS min_cents,
                 CAST(max(o_custkey) * 100 AS BIGINT) AS max_cents
          FROM orders
          UNION ALL
          SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT),
                 CAST(count(DISTINCT o_orderkey) AS BIGINT),
                 CAST(min(o_orderkey) * 100 AS BIGINT),
                 CAST(max(o_orderkey) * 100 AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
                 CAST(count(DISTINCT o_orderpriority) AS BIGINT),
                 CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
                 CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                 CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
                 CAST(count(DISTINCT o_totalprice) AS BIGINT),
                 CAST(round(min(o_totalprice) * 100) AS BIGINT),
                 CAST(round(max(o_totalprice) * 100) AS BIGINT)
          FROM orders)
        ORDER BY col_name"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        def numProfile(c: String, cents: Column => Column) = Seq(
          count(lit(1)).as(s"${c}_n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          countDistinct(col(c)).as(s"${c}_distinct"),
          cents(min(col(c))).cast("long").as(s"${c}_min"),
          cents(max(col(c))).cast("long").as(s"${c}_max"))
        def strProfile(c: String) = Seq(
          count(lit(1)).as(s"${c}_n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          countDistinct(col(c)).as(s"${c}_distinct"))
        val aggs =
          numProfile("o_custkey", _ * 100) ++
          numProfile("o_orderkey", _ * 100) ++
          strProfile("o_orderpriority") ++
          strProfile("o_orderstatus") ++
          numProfile("o_totalprice", x => round(x * 100))
        val wide = o.agg(aggs.head, aggs.tail: _*)
        wide.selectExpr(
          """stack(5,
             'o_custkey', o_custkey_n, o_custkey_nulls, o_custkey_distinct,
               o_custkey_min, o_custkey_max,
             'o_orderkey', o_orderkey_n, o_orderkey_nulls, o_orderkey_distinct,
               o_orderkey_min, o_orderkey_max,
             'o_orderpriority', o_orderpriority_n, o_orderpriority_nulls,
               o_orderpriority_distinct, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             'o_orderstatus', o_orderstatus_n, o_orderstatus_nulls,
               o_orderstatus_distinct, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             'o_totalprice', o_totalprice_n, o_totalprice_nulls,
               o_totalprice_distinct, o_totalprice_min, o_totalprice_max)
             AS (col_name, n, n_nulls, n_distinct, min_cents, max_cents)""")
          .orderBy("col_name")
      }),

    // ---- Robust outlier detection via median absolute deviation
    // (Hampel filter) over per-customer total spend, grouped by market
    // segment: flag customers with |spend − median| > 3·1.4826·MAD —
    // the robust alternative to the z-score that a 1%-corrupted column
    // cannot drag (mean/stddev can). The metric is a DERIVED
    // per-entity aggregate (spend = Σ order cents per customer), which
    // is where data-quality MAD checks actually run — raw uniform
    // columns have no tail, entity aggregates do. Exactness: medians
    // interpolate two selected values, so working in ×4 cents makes
    // median(4·spend) integral (the midpoint of two multiples of 4 is
    // even) and median(2·|4x−med4|) integral again; the 4.4478σ test
    // cross-multiplies to the pure-integer 20000·d4 > 44478·mad8 — no
    // float boundary can flip between engines. Scale: one custkey-keyed
    // agg, one keyed join to the segment dim, two grouped medians, and
    // a broadcast ≤#segments stats join; nothing wider than the
    // customer table ever shuffles. ----
    Q(
      "quality_mad_outliers",
      Some("""
        WITH sp AS (SELECT o_custkey,
                           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) * 4 AS x4
                    FROM orders GROUP BY 1),
        x AS (SELECT c.c_mktsegment AS grp, sp.x4
              FROM sp JOIN customer c ON sp.o_custkey = c.c_custkey),
        m AS (SELECT grp, CAST(median(x4) AS BIGINT) AS med4,
                     CAST(count(*) AS BIGINT) AS n
              FROM x GROUP BY 1),
        d AS (SELECT grp, med4, n, abs(x4 - med4) AS d4
              FROM x JOIN m USING (grp)),
        s AS (SELECT grp, CAST(median(2 * d4) AS BIGINT) AS mad8
              FROM d GROUP BY 1)
        SELECT d.grp, max(d.n) AS n_customers, max(d.med4) AS med4,
               max(s.mad8) AS mad8,
               CAST(count(*) FILTER (WHERE 20000 * d4 > 44478 * mad8)
                 AS BIGINT) AS n_outliers,
               CAST(max(d4) AS BIGINT) AS max_dev4
        FROM d JOIN s USING (grp)
        GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val sp = t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg((sum(round(col("o_totalprice") * 100).cast("long")) * 4)
            .cast("long").as("x4"))
        val x = sp.join(
          t(s, dir, "customer")
            .select(col("c_custkey").as("o_custkey"),
              col("c_mktsegment").as("grp")),
          "o_custkey")
          .select(col("grp"), col("x4"))
        val m = x.groupBy("grp")
          .agg(expr("median(x4)").cast("long").as("med4"),
            count(lit(1)).as("n"))
        val d = x.join(broadcast(m), "grp")
          .select(col("grp"), col("med4"), col("n"),
            abs(col("x4") - col("med4")).as("d4"))
        val sMad = d.groupBy("grp")
          .agg(expr("median(2 * d4)").cast("long").as("mad8"))
        d.join(broadcast(sMad), "grp")
          .groupBy("grp")
          .agg(
            max(col("n")).cast("long").as("n_customers"),
            max(col("med4")).cast("long").as("med4"),
            max(col("mad8")).cast("long").as("mad8"),
            sum(when(lit(20000L) * col("d4") > lit(44478L) * col("mad8"),
              1L).otherwise(0L)).cast("long").as("n_outliers"),
            max(col("d4")).cast("long").as("max_dev4"))
          .orderBy("grp")
      }),

    // ---- Benford leading-digit audit (the classic anomaly screen for
    // financial / measurement columns: naturally-occurring multiplicative
    // quantities follow P(d) = log10(1 + 1/d); fabricated or truncated
    // data doesn't). The first significant digit is taken from the EXACT
    // integer cents representation via a string head — no log10 on the
    // value itself, so there is no float-boundary risk at powers of ten
    // (log10(1000.0) can read 2.9999... on one engine and 3.0 on the
    // other; substr of an integer cannot disagree). Expected shares are
    // log10 of small integer ratios, rounded to 6 dp on both engines.
    // Scale: projection-pruned single-column scan → 9-key hash agg with
    // map-side partials — the cheapest possible full-table audit; the
    // shuffle carries 9 rows per map task regardless of corpus size. ----
    Q(
      "quality_benford",
      Some("""
        WITH cents AS (
          SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
          FROM lineitem WHERE l_extendedprice > 0),
        digit AS (
          SELECT CAST(substr(c::VARCHAR, 1, 1) AS BIGINT) AS lead_digit
          FROM cents),
        agg AS (
          SELECT lead_digit, CAST(count(*) AS BIGINT) AS n_rows
          FROM digit GROUP BY 1),
        tot AS (SELECT sum(n_rows) AS t FROM agg)
        SELECT lead_digit, n_rows,
               round(CAST(n_rows AS DOUBLE) / t, 6) AS obs_share,
               round(log10(1.0 + 1.0 / lead_digit), 6) AS exp_share,
               CAST(round((CAST(n_rows AS DOUBLE) / t -
                           log10(1.0 + 1.0 / lead_digit)) * 1000000)
                 AS BIGINT) AS dev_ppm
        FROM agg, tot ORDER BY lead_digit"""),
      (s, dir) => {
        // single scan: the global total comes from an unpartitioned
        // window over the POST-AGGREGATE frame (at most 9 rows reach
        // the one-partition window stage, never raw data), not from a
        // second pass over lineitem
        val agg = t(s, dir, "lineitem")
          .where(col("l_extendedprice") > 0)
          .select(substring(round(col("l_extendedprice") * 100)
            .cast("long").cast("string"), 1, 1).cast("long")
            .as("lead_digit"))
          .groupBy("lead_digit")
          .agg(count(lit(1)).cast("long").as("n_rows"))
        val w = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val expShare = log10(lit(1.0) + lit(1.0) / col("lead_digit"))
        agg.withColumn("t", sum("n_rows").over(w))
          .select(col("lead_digit"), col("n_rows"),
            round(col("n_rows").cast("double") / col("t"), 6)
              .as("obs_share"),
            round(expShare, 6).as("exp_share"),
            round((col("n_rows").cast("double") / col("t") - expShare)
              * 1000000).cast("long").as("dev_ppm"))
          .orderBy("lead_digit")
      })
  )
}
