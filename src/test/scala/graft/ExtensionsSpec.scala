package graft

/** The SparkSessionExtensions path: custom functions must resolve from SQL
  * text with no per-query registration (SparkSpec builds the session with
  * spark.sql.extensions=graft.GraftExtensions).
  */
class ExtensionsSpec extends SparkSpec {

  test("injected functions resolve from bare SQL text") {
    val row = spark.sql("""
      SELECT rolling_hash('abc') AS rh,
             cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
             lsh_bucket(array(1.0d, -1.0d), 0L, 4L) AS lb,
             minhash_sig(array(5L, 9L), 2) AS ms
    """).collect()(0)
    assert(row.getLong(0) != 0L)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getLong(2) >= 0L && row.getLong(2) < 16L)
    assert(row.getSeq[Long](3).length == 2)
  }

  test("round-3 injections resolve from SQL: shingles, heavy hitters") {
    val row = spark.sql("""
      SELECT trigram_shingles(array('a', 'b', 'c', 'd')) AS sh
    """).collect()(0)
    assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
    val hh = spark.sql("""
      SELECT misra_gries(t, 4) AS sk
      FROM VALUES ('x'), ('x'), ('y') AS v(t)
    """).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("x" -> 2L, "y" -> 1L))
  }

  test("injected functions appear in the catalog with descriptions") {
    val desc = spark.sql("DESCRIBE FUNCTION rolling_hash")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("rolling_hash"))
  }
}
