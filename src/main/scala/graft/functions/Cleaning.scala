package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native (codegen-friendly) re-implementations of the reference's three
  * cleaning UDFs, matching the Python semantics exactly (truth table in
  * FIXTURES.md §1.4).
  *
  * Reference: `app/sliver.py:41-89` declares three row-at-a-time Python
  * UDFs (parse_area, parse_number, normalize_price). Re-expressed here as
  * compositions of built-in `org.apache.spark.sql.functions` so Catalyst
  * can constant-fold / push down / whole-stage-codegen them — no
  * JVM→Python round trip, no codegen black box.
  */
object Cleaning {

  private def blankToNull(c: Column): Column =
    when(c.isNull || trim(c) === "", lit(null).cast("string")).otherwise(c)

  /** F1 `parse_area(str) -> double` (reference app/sliver.py:41-51).
    * Semantics: null/blank -> null; take the FIRST match of `[0-9,.]+`,
    * strip commas, parse as float; any parse failure -> null.
    * Quirks preserved: "80,5" -> 805.0 (comma stripped, not decimal);
    * "5,2 tỷ" -> 52.0.
    */
  def parseArea(c: Column): Column = call_function("parse_area", c)

  /** The functions-composition spelling of F1, kept as the semantic
    * specification the native kernel is tested against (CleaningSpec).
    * Not used in query bodies: each call site inlines this ~10-node
    * tree and filter pushdown replicates the SOURCE expression into
    * every leaf reference — p2_null_drop's plan grew past the JVM JIT
    * thresholds and ran interpreted (see CleaningExprs.scala). */
  private[graft] def parseAreaReference(c: Column): Column = {
    val m = regexp_extract(blankToNull(c), "[0-9,.]+", 0)
    // regexp_extract yields "" on no match; try_cast("") -> null, matching
    // the Python `return None` path; try_cast("5.2.3") -> null matches the
    // float() raise. Plain cast would THROW under Spark 4's default ANSI
    // mode on exactly these dirty inputs.
    regexp_replace(m, ",", "").try_cast("double")
  }

  /** F2 `parse_number(str) -> int` (reference app/sliver.py:54-60).
    * Semantics: null/blank -> null; Python `int(float(s))` — i.e. the WHOLE
    * trimmed string must be a float literal, then truncate toward zero;
    * otherwise null. "3.7" -> 3; "80 m²" -> null; "80,5" -> null.
    * Guard with a strict numeric regex so inf/nan (Python: raises ->
    * null) don't leak through Spark's more permissive string->double cast.
    */
  def parseNumber(c: Column): Column = call_function("parse_number", c)

  /** Composition spelling of F2 — specification only (see above). */
  private[graft] def parseNumberReference(c: Column): Column = {
    val s = trim(blankToNull(c))
    val isNum = s.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")
    // try_cast double->int nulls out values beyond Int range (Python's
    // unbounded int differs there, but the reference stores IntegerType, so
    // out-of-range must land null, not overflow/throw).
    when(isNum, s.try_cast("double").try_cast("int"))
      .otherwise(lit(null).cast("int"))
  }

  /** F3 `normalize_price(str) -> double` in billions of VND
    * (reference app/sliver.py:63-83).
    * Semantics: null/blank -> null; lowercase; contains "tỷ" -> first
    * `[0-9.]+` as float (note: `,` NOT in this regex, so "5,2 tỷ" -> 5.0);
    * contains "triệu" -> first number / 1000; else strip all non-digits,
    * empty -> null, else value / 1e9. Any parse failure -> null.
    */
  def normalizePrice(c: Column): Column = call_function("normalize_price", c)

  /** Composition spelling of F3 — specification only (see above). */
  private[graft] def normalizePriceReference(c: Column): Column = {
    val s = lower(blankToNull(c))
    // try_cast: "" (no digits near "tỷ") and malformed tokens like ".."
    // must null out (Python except-path), not throw under ANSI.
    val firstNum = regexp_extract(s, "[0-9.]+", 0).try_cast("double")
    when(s.isNull, lit(null).cast("double"))
      .when(s.contains("tỷ"), firstNum)
      .when(s.contains("triệu"), firstNum / 1000)
      .otherwise(
        nullif(regexp_replace(s, "[^0-9]", ""), lit("")).try_cast("double") / 1e9)
  }
}
