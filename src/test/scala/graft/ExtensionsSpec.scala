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

  test("injected functions appear in the catalog with descriptions") {
    val desc = spark.sql("DESCRIBE FUNCTION rolling_hash")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("rolling_hash"))
  }
}
