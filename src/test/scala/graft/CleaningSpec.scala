package graft

import org.apache.spark.sql.functions.col
import graft.functions.Cleaning

/** Truth-table tests for the F1–F3 cleaning semantics (FIXTURES.md §1.4),
  * matching the reference Python UDFs at app/sliver.py:41-83 exactly —
  * including the ANSI-mode edge cases the round-1 advisor flagged (empty
  * regex match, "5.2.3", Int-overflow) which must null out, never throw.
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def runArea(in: Seq[String]): Seq[Option[Double]] =
    in.toDF("s").select(Cleaning.parseArea(col("s")).as("v"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  private def runNumber(in: Seq[String]): Seq[Option[Int]] =
    in.toDF("s").select(Cleaning.parseNumber(col("s")).as("v"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))

  private def runPrice(in: Seq[String]): Seq[Option[Double]] =
    in.toDF("s").select(Cleaning.normalizePrice(col("s")).as("v"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("parseArea truth table (reference app/sliver.py:41-51)") {
    val cases: Seq[(String, Option[Double])] = Seq(
      "80 m²" -> Some(80.0),
      "80,5" -> Some(805.0),      // comma STRIPPED, not decimal (quirk)
      "5,2 tỷ" -> Some(52.0),     // same quirk
      "3.7" -> Some(3.7),
      "  12.5 m² " -> Some(12.5),
      "" -> None,
      "   " -> None,
      (null: String) -> None,
      "n/a" -> None,              // no digits -> None
      "5.2.3" -> None,            // Python float("5.2.3") raises -> None
      "abc 42 def" -> Some(42.0))
    val (in, expected) = cases.unzip
    assert(runArea(in) == expected)
  }

  test("parseNumber truth table (reference app/sliver.py:54-60)") {
    val cases: Seq[(String, Option[Int])] = Seq(
      "3" -> Some(3),
      "3.7" -> Some(3),           // int(float("3.7")) truncates
      "-2.9" -> Some(-2),         // truncate toward zero
      "  5  " -> Some(5),
      "80 m²" -> None,            // not a pure float literal
      "80,5" -> None,
      "" -> None,
      (null: String) -> None,
      "x" -> None,
      "inf" -> None,              // int(float('inf')) raises -> None
      "nan" -> None,
      "1e2" -> Some(100),
      "3000000000" -> None)       // beyond Int range -> null (IntegerType)
    val (in, expected) = cases.unzip
    assert(runNumber(in) == expected)
  }

  test("normalizePrice truth table (reference app/sliver.py:63-83)") {
    val cases: Seq[(String, Option[Double])] = Seq(
      "5 tỷ" -> Some(5.0),
      "5.2 tỷ" -> Some(5.2),
      "5,2 tỷ" -> Some(5.0),      // ',' not in [0-9.]+ -> first match "5"
      "500 triệu" -> Some(0.5),
      "1.5 Tỷ" -> Some(1.5),      // lowercase applied first
      "2000000000" -> Some(2.0),  // plain digits / 1e9
      "2,000,000,000 đ" -> Some(2.0), // strip non-digits
      "" -> None,
      (null: String) -> None,
      "thỏa thuận" -> None)       // no digits -> nullif -> None
    val (in, expected) = cases.unzip
    assert(runPrice(in) == expected)
  }

  test("parseArea/parseNumber/normalizePrice never throw on garbage (ANSI-safe)") {
    val garbage = Seq("..", "...", ".", "+-3", "1/2", "∞", "tỷ", "triệu x",
      "e5", "--1", "0x1F", "١٢٣")
    // would throw CAST_INVALID_INPUT under ANSI if cast were used
    runArea(garbage)
    runNumber(garbage)
    runPrice(garbage)
  }

  test("native kernels ≡ functions-composition reference on the truth " +
      "table, the garbage set, and the bronzeish generator space") {
    // the composition forms are the semantic spec (CleaningExprs.scala);
    // any divergence is a kernel bug, whatever the truth table says
    val inputs = Seq(
      "80 m²", "80,5", "5,2 tỷ", "3.7", "  12.5 m² ", "", "   ", null,
      "n/a", "5.2.3", "abc 42 def", "3", "-2.9", "  5  ", "x", "inf",
      "nan", "1e2", "3000000000", "5 tỷ", "5.2 tỷ", "500 triệu",
      "1.5 Tỷ", "2000000000", "2,000,000,000 đ", "thỏa thuận",
      "..", "...", ".", "+-3", "1/2", "∞", "tỷ", "triệu x", "e5",
      "--1", "0x1F", "١٢٣", "5.", ".5", ",,", "0.", "+.5e3", "1E-2",
      // bronzeish generator shapes (p2/silver corpus)
      "123 m²", "123,4 m²", "123.4", "123.4 tỷ", "123 triệu",
      "123000000") ++
      // a numeric sweep over the generator's modular space
      (0 to 999 by 7).flatMap(k => Seq(s"$k m²", s"$k,${k % 10} m²",
        s"$k.${k % 10}", s"$k.${k % 10} tỷ", s"$k triệu", s"${k}000000"))
    val df = inputs.toDF("s")
    val diverged = df.select(
        col("s"),
        Cleaning.parseArea(col("s")).as("a_n"),
        Cleaning.parseAreaReference(col("s")).as("a_r"),
        Cleaning.parseNumber(col("s")).as("n_n"),
        Cleaning.parseNumberReference(col("s")).as("n_r"),
        Cleaning.normalizePrice(col("s")).as("p_n"),
        Cleaning.normalizePriceReference(col("s")).as("p_r"))
      .filter(!(col("a_n") <=> col("a_r")) ||
        !(col("n_n") <=> col("n_r")) || !(col("p_n") <=> col("p_r")))
      .collect()
    assert(diverged.isEmpty,
      s"native != reference on: ${diverged.take(10).mkString("; ")}")
  }
}
