package graft

import java.sql.DriverManager

/** Smoke for the EP2 serving endpoint: a FRESH JDBC connection (real
  * HiveServer2 wire protocol over loopback, hive-jdbc client) must see
  * the catalog tables by name and run an aggregate over one. This is
  * the reference's Metabase-connects-to-Thrift contract
  * (docker-compose.yml:70-88) reduced to its observable behavior.
  */
class ServeSpec extends SparkSpec {

  test("fresh JDBC connection lists catalog tables and aggregates one") {
    val port = 10137
    spark.conf.set("hive.server2.thrift.port", port.toString)
    val server = Serve.start(spark, sf)
    var conn: java.sql.Connection = null
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously; retry the fresh connection
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last: Throwable = null
      while (conn == null && System.nanoTime() < deadline) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port", "", "")
        catch { case e: Throwable => last = e; Thread.sleep(500) }
      }
      assert(conn != null, s"could not connect: $last")
      val st = conn.createStatement()

      // SHOW TABLES over the wire: the persistent-catalog dims
      // registered by Serve.start must be visible to a NEW session
      val rs = st.executeQuery("SHOW TABLES")
      val tables = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("tableName")).toSet
      assert(tables.contains("graft_cat_nation") &&
        tables.contains("graft_cat_region"),
        s"catalog dims missing from SHOW TABLES: $tables")

      // a named-table aggregate over the warehouse: 25 nations in 5
      // regions, exercised as a join so the endpoint runs a real plan
      val rs2 = st.executeQuery("""
        SELECT r.r_name, count(*) AS n
        FROM graft_cat_nation n JOIN graft_cat_region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name""")
      var rows = 0; var total = 0L
      while (rs2.next()) { rows += 1; total += rs2.getLong("n") }
      assert(rows == 5, s"expected 5 region groups, got $rows")
      assert(total == 25, s"expected 25 nations total, got $total")
    } finally {
      if (conn != null) conn.close()
      server.stop()
    }
  }
}
