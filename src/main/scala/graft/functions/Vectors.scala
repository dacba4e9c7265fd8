package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector math over ArrayType columns via codegen-friendly higher-order
  * functions (no UDF round trips for the hot arithmetic), plus one typed
  * Aggregator (the engine's UDAF surface, SURVEY.md §2.6 U2).
  */
object Vectors {

  /** Σ aᵢ·bᵢ — a sequential fold, deterministic summation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Deterministic pseudo-random hyperplane j (as an array expression of
    * `dim` doubles in [-0.5, 0.5)) for sign-random-projection LSH. Derived
    * arithmetically from (j, d) so every executor materializes the same
    * planes with zero driver-side state to ship.
    */
  def hyperplane(j: Column, dim: Int): Column =
    // per-plane slope (j*2654435761 mod p) — see VectorOps.lshBucket for
    // why a shared slope degenerates; this Column form stays bit-equal
    // to the native kernel (pinned by VectorExprsSpec)
    transform(sequence(lit(0), lit(dim - 1)), d =>
      pmod(pmod(j * 2654435761L, lit(1000003L)) * d + j * 40503L,
        lit(1000003L)).cast("double") / 1000003.0 - 0.5)

  /** LSH bucket key for one table: `bits` sign bits of dot(vec, hyperplane).
    * `table` selects a disjoint plane set (OR-amplification across tables).
    * Fewer bits → wider buckets → higher recall and bigger candidate sets;
    * tune (tables × bits) to the data's neighbor-angle distribution.
    */
  def lshBucket(vec: Column, table: Column, dim: Int, bits: Int = 8): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
      acc + when(dot(vec, hyperplane(table * bits + i, dim)) > 0,
        pow(lit(2.0), i).cast("long")).otherwise(lit(0L)))

  /** Element-wise mean of vectors — typed Aggregator (UDAF surface).
    * Register with `udaf(...)`; input vectors must share a dimension.
    */
  class VectorAvg extends Aggregator[Seq[Double], (Seq[Double], Long), Seq[Double]] {
    def zero: (Seq[Double], Long) = (Seq.empty, 0L)
    def reduce(b: (Seq[Double], Long), a: Seq[Double]): (Seq[Double], Long) =
      if (b._2 == 0L) (a, 1L)
      else (b._1.lazyZip(a).map(_ + _), b._2 + 1)
    def merge(x: (Seq[Double], Long), y: (Seq[Double], Long)): (Seq[Double], Long) =
      if (x._2 == 0L) y
      else if (y._2 == 0L) x
      else (x._1.lazyZip(y._1).map(_ + _), x._2 + y._2)
    def finish(r: (Seq[Double], Long)): Seq[Double] =
      if (r._2 == 0L) Seq.empty else r._1.map(_ / r._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Seq[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Long)]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
