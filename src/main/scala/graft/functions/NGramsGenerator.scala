package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF surface, SURVEY §2.6 U3 beyond
  * the built-in explode): `ngrams_gen(tokens, n)` emits one row
  * `(pos, ngram)` per word n-gram of a token array.
  *
  * A Generator is the engine's row-multiplying extension point — the
  * planner places it in GenerateExec, so downstream operators (the usual
  * groupBy/count) see ordinary rows; no driver round trip, no UDF boxing
  * of the whole output list.
  */
case class NGramsGenerator(child: Expression, nExpr: Expression)
    extends Generator with CollectionGenerator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)
  override val inline: Boolean = false
  override def position: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType | LongType)
        if nExpr.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "ngrams_gen requires (array<string>, foldable int)")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  private lazy val n: Int = nExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
  }

  override def collectionType = ArrayType(elementSchema)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val tokens = arr.asInstanceOf[ArrayData]
      val total = tokens.numElements() - n + 1
      if (total <= 0) Nil
      else (0 until total).iterator.map { i =>
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          j += 1
        }
        InternalRow(i, UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGenerator =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
