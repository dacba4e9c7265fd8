package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass byte-scanner kernels for the F1–F3 cleaning semantics
  * (reference app/sliver.py:41-83; truth table FIXTURES.md §1.4).
  *
  * Why native expressions and not the functions-composition in
  * [[Cleaning]]: the composition is semantically right but each call
  * site inlines it as a ~10-reference tree over its argument, and
  * Catalyst's filter pushdown then substitutes the SOURCE expression
  * into every reference — p2_null_drop's null-drop filter expanded to
  * a plan where the bronzeish CASE synth appears ~20× inside one
  * Filter condition. Whole-stage codegen emits all of it; the
  * generated methods blow past the JVM's JIT thresholds and the hot
  * path runs as interpreted bytecode. A compact expression that calls
  * one static kernel keeps the generated code a few lines regardless
  * of how often the optimizer replicates it. The composition forms are
  * kept as `*Reference` in [[Cleaning]] and CleaningSpec asserts
  * native ≡ reference on the full truth table plus the garbage set.
  *
  * Byte-level scanning is UTF-8-safe here because every character
  * class involved ([0-9,.], float literals) is pure ASCII and UTF-8
  * continuation bytes can never collide with ASCII values.
  */
object CleaningOps {
  private val Ty = UTF8String.fromString("tỷ")
  private val Trieu = UTF8String.fromString("triệu")
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Spark `trim(c) = ''` equivalent (trim strips 0x20 only). */
  private def isBlank(s: UTF8String): Boolean = s.trim().numBytes() == 0

  private def isDigit(c: Byte): Boolean = c >= '0' && c <= '9'

  /** try_cast-to-double semantics for a [0-9.] run: ≥1 digit, ≤1 dot
    * (matches "5.2.3" → null, "." → null, "5." → 5.0, ".5" → 0.5). */
  private def parseDotted(b: Array[Byte], from: Int, to: Int)
      : java.lang.Double = {
    var digits = 0
    var dots = 0
    var i = from
    while (i < to) {
      if (isDigit(b(i))) digits += 1 else if (b(i) == '.') dots += 1
      i += 1
    }
    if (digits == 0 || dots > 1) null
    else java.lang.Double.valueOf(
      java.lang.Double.parseDouble(new String(b, from, to - from, Ascii)))
  }

  /** First maximal [0-9.] run of `s` parsed as double, else null —
    * regexp_extract(s, "[0-9.]+", 0).try_cast(double). */
  private def firstDottedRun(s: UTF8String): java.lang.Double = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    while (i < n && !(isDigit(b(i)) || b(i) == '.')) i += 1
    if (i == n) return null
    var j = i
    while (j < n && (isDigit(b(j)) || b(j) == '.')) j += 1
    parseDotted(b, i, j)
  }

  /** F1: first `[0-9,.]+` match, commas stripped, float-parsed; any
    * failure → null. "80,5" → 805.0 (comma stripped, not decimal). */
  def parseArea(s: UTF8String): java.lang.Double = {
    if (isBlank(s)) return null
    val b = s.getBytes
    val n = b.length
    var i = 0
    while (i < n && !(isDigit(b(i)) || b(i) == ',' || b(i) == '.')) i += 1
    if (i == n) return null
    var j = i
    while (j < n && (isDigit(b(j)) || b(j) == ',' || b(j) == '.')) j += 1
    val buf = new Array[Byte](j - i)
    var k = 0
    var p = i
    while (p < j) {
      if (b(p) != ',') { buf(k) = b(p); k += 1 }
      p += 1
    }
    if (k == 0) null else parseDotted(buf, 0, k)
  }

  /** F2: Python `int(float(s))` — the whole trimmed string must be a
    * strict float literal; truncate toward zero; out-of-Int-range,
    * inf, nan → null (try_cast double→int semantics). */
  def parseNumber(s: UTF8String): java.lang.Integer = {
    val t = s.trim()
    if (t.numBytes() == 0) return null
    val b = t.getBytes
    val n = b.length
    var i = 0
    if (b(i) == '+' || b(i) == '-') i += 1
    var mant = 0
    while (i < n && isDigit(b(i))) { mant += 1; i += 1 }
    var frac = 0
    if (i < n && b(i) == '.') {
      // the reference regex allows "d+." but not a bare "."
      i += 1
      while (i < n && isDigit(b(i))) { frac += 1; i += 1 }
    }
    if (mant == 0 && frac == 0) return null
    if (i < n && (b(i) == 'e' || b(i) == 'E')) {
      i += 1
      if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
      var ex = 0
      while (i < n && isDigit(b(i))) { ex += 1; i += 1 }
      if (ex == 0) return null
    }
    if (i != n) return null
    val d = java.lang.Double.parseDouble(new String(b, Ascii))
    if (d.isNaN || d.isInfinite) return null
    // ANSI double→int range check, then truncation toward zero
    if (math.floor(d) <= Int.MaxValue.toDouble &&
        math.ceil(d) >= Int.MinValue.toDouble)
      java.lang.Integer.valueOf(d.toInt)
    else null
  }

  /** F3: lowercase; "tỷ" → first `[0-9.]+` as float; "triệu" → same /
    * 1000; else strip non-digits, empty → null, else / 1e9. */
  def normalizePrice(s: UTF8String): java.lang.Double = {
    if (isBlank(s)) return null
    val low = s.toLowerCase
    if (low.contains(Ty)) return firstDottedRun(low)
    if (low.contains(Trieu)) {
      val v = firstDottedRun(low)
      return if (v == null) null
      else java.lang.Double.valueOf(v.doubleValue() / 1000.0)
    }
    val b = low.getBytes
    val n = b.length
    val buf = new Array[Byte](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (isDigit(b(i))) { buf(k) = b(i); k += 1 }
      i += 1
    }
    if (k == 0) null
    else java.lang.Double.valueOf(
      java.lang.Double.parseDouble(new String(buf, 0, k, Ascii)) / 1e9)
  }
}

/** Shared shape of the three cleaning expressions: string in, nullable
  * scalar out even for non-null input (the parse-failure → null path). */
sealed abstract class CleaningExpr extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
}

case class ParseArea(child: Expression) extends CleaningExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "parse_area"
  protected override def nullSafeEval(in: Any): Any =
    CleaningOps.parseArea(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double r = graft.functions.CleaningOps.parseArea($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression)
      : ParseArea = copy(child = newChild)
}

case class ParseNumber(child: Expression) extends CleaningExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "parse_number"
  protected override def nullSafeEval(in: Any): Any =
    CleaningOps.parseNumber(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer r = graft.functions.CleaningOps.parseNumber($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.intValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression)
      : ParseNumber = copy(child = newChild)
}

case class NormalizePrice(child: Expression) extends CleaningExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "normalize_price"
  protected override def nullSafeEval(in: Any): Any =
    CleaningOps.normalizePrice(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double r = graft.functions.CleaningOps.normalizePrice($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression)
      : NormalizePrice = copy(child = newChild)
}
