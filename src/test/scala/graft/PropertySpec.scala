package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Cleaning

/** Property tests (SURVEY §5.3): totality of the cleaning parsers over
  * arbitrary strings, anti-join containment, and write→read roundtrip
  * identity. Raw ScalaCheck generators with fixed seeds (deterministic,
  * no scalatestplus bridge needed); each batch evaluates through a real
  * Spark job so the ANSI/codegen path is what's exercised.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val weirdString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('0', '9', ',', '.', ' ', 'm', '²', 't', 'ỷ',
      'r', 'i', 'ệ', 'u', '-', '+', 'e', 'E')).map(_.mkString),
    Gen.const(null: String))

  test("cleaning parsers are total: never throw, null or finite output") {
    for (trial <- 1 to 10) {
      val inputs = sample(Gen.listOfN(100, weirdString), 42L + trial)
      val rows = inputs.toDF("s")
        .select(
          Cleaning.parseArea(col("s")).as("a"),
          Cleaning.parseNumber(col("s")).as("n"),
          Cleaning.normalizePrice(col("s")).as("p"))
        .collect()
      assert(rows.length == inputs.length)
      rows.foreach { r =>
        if (!r.isNullAt(0)) assert(!r.getDouble(0).isNaN)
        if (!r.isNullAt(2)) assert(!r.getDouble(2).isNaN)
      }
    }
  }

  test("anti-join output = left minus seen, exactly") {
    for (trial <- 1 to 5) {
      val left = sample(Gen.listOf(Gen.chooseNum(0L, 50L)), 100L + trial)
      val seen = sample(Gen.listOf(Gen.chooseNum(0L, 50L)), 200L + trial)
      val out = left.toDF("k")
        .join(seen.toDF("sk"), col("k") === col("sk"), "left_anti")
        .select("k").as[Long].collect().toList
      assert(out.sorted == left.filterNot(seen.contains).sorted)
    }
  }

  test("partitioned parquet write -> read is an identity on rows") {
    for (trial <- 1 to 3) {
      val rows = sample(Gen.listOfN(20,
        Gen.zip(Gen.chooseNum(1L, 999L), Gen.oneOf("a", "b", "c"))), 300L + trial)
      val out = "/root/repo/target/scratch/prop_roundtrip"
      rows.toDF("v", "part").write.mode("overwrite")
        .partitionBy("part").parquet(out)
      val back = spark.read.parquet(out)
        .select(col("v"), col("part")).as[(Long, String)].collect().toList
      assert(back.sorted == rows.sorted)
    }
  }
}
