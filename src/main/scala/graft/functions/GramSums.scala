package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Partial state of [[GramSums]]: element sums and the upper-triangle
  * pair-product sums, accumulated in 128-bit two's complement (hi/lo long
  * pairs) so the aggregate is EXACT for any row count — the per-row
  * products are plain wrapping long multiplies, matching the query's
  * previous `CAST(qi * qj AS DECIMAL(38,0))` spelling bit for bit. */
final class GramBuffer(
    var n: Long,
    var d: Int,
    var svHi: Array[Long], var svLo: Array[Long],
    var ppHi: Array[Long], var ppLo: Array[Long])

/** `gram_sums(vec) -> struct(n, d, sv, pp)`: one-pass exact Gram sums of
  * the 2^-20-quantized vector column — the round-17 replacement for
  * ml_pca_power_iter's double-posexplode (d² rows PER INPUT ROW through a
  * hash aggregate with DECIMAL sum buffers; 20M generated rows at sf0.1).
  *
  * Per input row the vector is quantized once (q_i = floor(x_i · 2^20),
  * double→long cast saturating exactly like Spark's CAST) and the d²
  * products q_i·q_j are accumulated into a d(d+1)/2-cell 128-bit triangle
  * held in two long arrays — the shuffle then carries ONE ~d²-long state
  * per partition instead of d² rows per input row. Output:
  *   n  — count of input rows (null vectors included, matching the
  *        query's separate count(*) pass, which this also replaces);
  *   d  — the vector dimensionality (all non-null rows must agree; a
  *        ragged corpus fails loudly rather than emitting a wrong grid);
  *   sv — Σ q_i per dimension, DECIMAL(38,0), exact;
  *   pp — row-major d² matrix of Σ q_i·q_j, DECIMAL(38,0), exact
  *        (mirrored from the triangle; null ELEMENTS contribute to
  *        neither sums nor products, matching sum()'s null-skipping).
  *
  * Numbers are bit-identical to the posexplode+sum form: quantization,
  * wrapping products, and exact integer accumulation are all the same
  * operations in a different evaluation order (integer addition is
  * associative-commutative; no floats are ever summed).
  */
case class GramSums(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_sums"

  private val dec = DecimalType(38, 0)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("d", IntegerType, nullable = false),
    StructField("sv", ArrayType(dec, containsNull = false)),
    StructField("pp", ArrayType(dec, containsNull = false))))

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(0L, -1, null, null, null, null)

  private def init(buf: GramBuffer, d: Int): Unit = {
    buf.d = d
    buf.svHi = new Array[Long](d); buf.svLo = new Array[Long](d)
    val tri = d * (d + 1) / 2
    buf.ppHi = new Array[Long](tri); buf.ppLo = new Array[Long](tri)
  }

  /** 128-bit two's-complement += of a sign-extended 64-bit value. */
  @inline private def add128(hi: Array[Long], lo: Array[Long], k: Int,
      p: Long): Unit = {
    val l = lo(k)
    val nl = l + p
    // unsigned carry-out of l + p
    val carry = ((l & p) | ((l | p) & ~nl)) >>> 63
    lo(k) = nl
    hi(k) = hi(k) + (p >> 63) + carry
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    buf.n += 1
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    if (buf.d < 0) init(buf, d)
    else if (buf.d != d) throw new IllegalStateException(
      s"gram_sums: ragged vector column (${buf.d} vs $d elements)")
    // quantize the row once; track nulls (sum() skips them)
    val q = new Array[Long](d)
    val ok = new Array[Boolean](d)
    var i = 0
    while (i < d) {
      if (!arr.isNullAt(i)) {
        // floor then toLong: saturates/NaN-zeroes exactly like Spark's
        // CAST(floor(x * 1048576) AS BIGINT)
        q(i) = math.floor(arr.getDouble(i) * 1048576.0).toLong
        ok(i) = true
      }
      i += 1
    }
    i = 0
    var k = 0 // triangle index of (i, i)
    while (i < d) {
      if (ok(i)) {
        val qi = q(i)
        add128(buf.svHi, buf.svLo, i, qi)
        var j = i
        var kk = k
        while (j < d) {
          if (ok(j)) add128(buf.ppHi, buf.ppLo, kk, qi * q(j))
          j += 1; kk += 1
        }
      }
      k += d - i
      i += 1
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.n += other.n
    if (other.d < 0) return buf
    if (buf.d < 0) {
      buf.d = other.d
      buf.svHi = other.svHi; buf.svLo = other.svLo
      buf.ppHi = other.ppHi; buf.ppLo = other.ppLo
      return buf
    }
    if (buf.d != other.d) throw new IllegalStateException(
      s"gram_sums: ragged vector column (${buf.d} vs ${other.d} elements)")
    var k = 0
    while (k < buf.svHi.length) {
      // 128-bit += 128-bit: lo add with carry, then hi words
      val l = buf.svLo(k); val p = other.svLo(k); val nl = l + p
      val carry = ((l & p) | ((l | p) & ~nl)) >>> 63
      buf.svLo(k) = nl
      buf.svHi(k) = buf.svHi(k) + other.svHi(k) + carry
      k += 1
    }
    k = 0
    while (k < buf.ppHi.length) {
      val l = buf.ppLo(k); val p = other.ppLo(k); val nl = l + p
      val carry = ((l & p) | ((l | p) & ~nl)) >>> 63
      buf.ppLo(k) = nl
      buf.ppHi(k) = buf.ppHi(k) + other.ppHi(k) + carry
      k += 1
    }
    buf
  }

  private def toDecimal(hi: Long, lo: Long): Decimal = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    val dv = Decimal(scala.math.BigDecimal(bi))
    if (!dv.changePrecision(38, 0)) throw new ArithmeticException(
      "gram_sums: accumulated sum exceeds DECIMAL(38,0)")
    dv
  }

  override def eval(buf: GramBuffer): Any = {
    val d = math.max(buf.d, 0)
    val sv = new Array[Any](d)
    var i = 0
    while (i < d) { sv(i) = toDecimal(buf.svHi(i), buf.svLo(i)); i += 1 }
    val pp = new Array[Any](d * d)
    i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cell = toDecimal(buf.ppHi(k), buf.ppLo(k))
        pp(i * d + j) = cell
        pp(j * d + i) = cell
        j += 1; k += 1
      }
      i += 1
    }
    InternalRow(buf.n, d, new GenericArrayData(sv), new GenericArrayData(pp))
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.d)
    if (buf.d >= 0) {
      def w(a: Array[Long]): Unit = { var i = 0
        while (i < a.length) { out.writeLong(a(i)); i += 1 } }
      w(buf.svHi); w(buf.svLo); w(buf.ppHi); w(buf.ppLo)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val d = in.readInt()
    val buf = new GramBuffer(n, d, null, null, null, null)
    if (d >= 0) {
      def r(len: Int): Array[Long] = {
        val a = new Array[Long](len)
        var i = 0
        while (i < len) { a(i) = in.readLong(); i += 1 }
        a
      }
      val tri = d * (d + 1) / 2
      buf.svHi = r(d); buf.svLo = r(d); buf.ppHi = r(tri); buf.ppLo = r(tri)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramSums =
    copy(child = newChildren.head)
}
