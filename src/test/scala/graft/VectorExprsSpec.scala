package graft

import org.apache.spark.sql.functions._
import graft.functions.{Vectors, VectorExprs}

/** The codegen'd vector kernels must be bit-identical to the Column-HOF
  * reference implementations (same fold order, same plane formula) — the
  * ANN tuning and dedup thresholds are calibrated against those.
  */
class VectorExprsSpec extends SparkSpec {

  private def emb = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  test("cosine_sim expression == HOF cosine on real embeddings") {
    val pairs = emb.as("a").crossJoin(emb.as("b").limit(5))
      .select(col("a.vec").as("va"), col("b.vec").as("vb"))
    val diff = pairs
      .withColumn("c_expr", VectorExprs.cosine(spark, col("va"), col("vb")))
      .withColumn("c_hof", Vectors.cosine(col("va"), col("vb")))
      .filter(abs(col("c_expr") - col("c_hof")) > 1e-12 ||
        col("c_expr").isNull =!= col("c_hof").isNull)
    assert(diff.count() == 0)
  }

  test("cosine_sim nulls out on zero vectors") {
    val z = emb.limit(3)
      .withColumn("zero", expr("transform(vec, x -> 0.0d)"))
      .select(VectorExprs.cosine(spark, col("vec"), col("zero")).as("c"))
    assert(z.collect().forall(_.isNullAt(0)))
  }

  test("lsh_bucket expression == HOF lshBucket for both configs in use") {
    for (bits <- Seq(4, 8)) {
      val tables = explode(sequence(lit(0), lit(7))).as("tbl")
      val both = emb.select(col("vec_id"), col("vec"), tables)
        .withColumn("b_expr",
          VectorExprs.lshBucket(spark, col("vec"), col("tbl"), bits))
        .withColumn("b_hof", Vectors.lshBucket(col("vec"), col("tbl"), 64, bits))
      assert(both.filter(col("b_expr") =!= col("b_hof")).count() == 0,
        s"bucket mismatch at bits=$bits")
    }
  }
}
