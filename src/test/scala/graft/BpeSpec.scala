package graft

import org.apache.spark.sql.functions._

/** Semantic pins for engine-side BPE vocabulary training
  * (operators.TextAnalysis text_bpe_merge_train) — the DuckDB oracle
  * pins cross-engine value equality; these pin that the merge fold IS
  * greedy left-to-right BPE.
  */
class BpeSpec extends SparkSpec {

  private def applyMerge(word: String, pa: String, pb: String): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("w")
      .withColumn("pa", lit(pa)).withColumn("pb", lit(pb))
      .withColumn("syms", filter(split(col("w"), ""), y => y =!= lit("")))
      .withColumn("m", expr(
        s"filter(split(aggregate(syms, '', " +
          s"${operators.TextAnalysis.bpeMergeLambda("endswith")}), " +
          "chr(31)), y -> y <> '')"))
      .select("m").collect()(0).getSeq[String](0)
  }

  test("merge fold is greedy left-to-right BPE") {
    // the canonical run case: 'l l l' merges the FIRST pair only
    assert(applyMerge("lllo", "l", "l") == Seq("ll", "l", "o"))
    assert(applyMerge("llll", "l", "l") == Seq("ll", "ll"))
    assert(applyMerge("hello", "l", "l") == Seq("h", "e", "ll", "o"))
    // untouched word passes through as single chars
    assert(applyMerge("abab", "l", "l") == Seq("a", "b", "a", "b"))
    // distinct-symbol pair merges every non-overlapping occurrence
    assert(applyMerge("abab", "a", "b") == Seq("ab", "ab"))
    // a one-symbol word never matches (no adjacent pair)
    assert(applyMerge("a", "a", "a") == Seq("a"))
  }

  test("multi-char symbols cannot false-match on their suffixes") {
    import spark.implicits._
    // symbols [c, ab]: pair (b, x) must NOT fire even though the
    // delimited accumulator ends in ...b — the chr(31) guard sees the
    // full tail symbol 'ab', not its suffix 'b'
    val r = Seq(Seq("c", "ab", "x")).toDF("syms")
      .withColumn("pa", lit("b")).withColumn("pb", lit("x"))
      .withColumn("m", expr(
        s"filter(split(aggregate(syms, '', " +
          s"${operators.TextAnalysis.bpeMergeLambda("endswith")}), " +
          "chr(31)), y -> y <> '')"))
      .select("m").collect()(0).getSeq[String](0)
    assert(r == Seq("c", "ab", "x"), s"suffix false-match: $r")
    // and the true multi-char pair does fire
    val r2 = Seq(Seq("c", "ab", "x")).toDF("syms")
      .withColumn("pa", lit("ab")).withColumn("pb", lit("x"))
      .withColumn("m", expr(
        s"filter(split(aggregate(syms, '', " +
          s"${operators.TextAnalysis.bpeMergeLambda("endswith")}), " +
          "chr(31)), y -> y <> '')"))
      .select("m").collect()(0).getSeq[String](0)
    assert(r2 == Seq("c", "abx"), s"multi-char merge failed: $r2")
  }

  test("trained merges are well-formed with non-increasing counts") {
    val rows = SparkEntry.queries("text_bpe_merge_train")(spark, sf).collect()
    assert(rows.length == 13, "3 merges + top-10 vocab")
    val merges = rows.filter(_.getString(0) == "merge").sortBy(_.getLong(1))
    assert(merges.length == 3)
    // each learned merge is a concatenation of ≥2 chars
    assert(merges.forall(_.getString(2).length >= 2))
    // merging can only shrink any pair's count → round maxima are
    // non-increasing (the classic BPE monotonicity)
    val cnts = merges.map(_.getLong(3))
    assert(cnts.sliding(2).forall { case Array(a, b) => a >= b },
      s"round maxima increased: ${cnts.mkString(",")}")
    val vocab = rows.filter(_.getString(0) == "vocab")
    assert(vocab.length == 10)
    val vc = vocab.sortBy(_.getLong(1)).map(_.getLong(3))
    assert(vc.sliding(2).forall { case Array(a, b) => a >= b },
      "vocab not ordered by count")
  }

  test("encode token economics bracket between words and chars") {
    val rows = SparkEntry.queries("text_bpe_encode")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (words, tokens, chars) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      // every word is ≥1 token; every token is ≥1 char; 3 merges can
      // only shrink the token count below the char count
      assert(tokens >= words, s"${r.getString(0)}: tokens < words")
      assert(tokens < chars, s"${r.getString(0)}: merges bought nothing")
      assert(r.getDouble(5) > 1.0 && r.getDouble(5) <= 3.0)
    }
  }
}
