package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `space_tokens(text) -> array<string>`: the string's single-space-separated
  * tokens with empty tokens dropped — exactly
  * `filter(split(text, " "), t -> t <> "")`, the tokenizer every text
  * operator here uses, as ONE native expression.
  *
  * Two reasons this exists (round-17 optimization):
  *   - the `filter` lambda dispatches an interpreted function per ELEMENT
  *     (higher-order functions don't codegen), so tokenization was an
  *     interpreted hot spot on every text path;
  *   - a lambda-bearing subtree never canonicalizes equal to its twin
  *     (NamedLambdaVariable ids are not normalized), so ReuseExchange
  *     treated structurally identical token pipelines as distinct and
  *     self-join consumers recomputed the whole scan+tokenize chain
  *     (the round-16 jaccard finding; this closes the remaining sites).
  *
  * Real codegen (not CodegenFallback): CollapseCodegenStages refuses
  * whole-stage codegen for any operator containing a CodegenFallback
  * expression, so the fallback spelling silently dropped every
  * tokenize-bearing Generate/Project out of its codegen span — the same
  * cost class as the lambda it replaced. A static JVM call on the
  * UTF8String (the RollingHash pattern) keeps the span fused.
  *
  * Byte-scan correctness: the separator is the single ASCII space and no
  * UTF-8 multi-byte sequence contains a 0x20 byte, so scanning bytes is
  * exact on any input. Segment slices share one backing array (no
  * per-token copy).
  */
case class SpaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "space_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"space_tokens requires string, got ${other.sql}")
  }

  protected override def nullSafeEval(raw: Any): Any =
    SpaceTokens.tokenize(raw.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpaceTokens.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SpaceTokens = copy(child = newChild)
}

object SpaceTokens {
  /** Static hot-path entry — called directly from generated code. */
  def tokenize(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any](16)
    var start = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) {
        if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    if (n > start) out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray)
  }
}
