package graft

import org.apache.spark.sql.functions._

/** Sink-side layout properties: the range-clustered write must produce
  * files covering disjoint (at most boundary-touching) o_orderdate ranges —
  * that disjointness is what lets parquet min/max stats skip whole files
  * for a date filter at scale.
  */
class RoundtripSpec extends SparkSpec {

  test("range-clustered write produces files with disjoint date ranges") {
    SparkEntry.queries("range_clustered_write")(spark, sf).collect()
    val out = s"${Tables.scratchRoot}/range_clustered_orders"
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      .orderBy("lo")
      .collect()
    assert(perFile.length > 1, "range repartition should emit several files")
    perFile.sliding(2).foreach { w =>
      val (prev, next) = (w(0), w(1))
      // o_orderdate is timestamp_ntz -> LocalDateTime in Row
      val prevHi = prev.getAs[java.time.LocalDateTime]("hi")
      val nextLo = next.getAs[java.time.LocalDateTime]("lo")
      assert(!prevHi.isAfter(nextLo),
        s"file ranges overlap: $prev vs $next")
    }
  }
}
