package graft

import org.apache.spark.sql.functions._

/** Catalog DDL surface (operators.Catalog): the CREATE/INSERT/SHOW/
  * DESCRIBE lifecycle, and the metastore contract that matters — a NEW
  * session over the same warehouse sees the same tables and rows (the
  * reference serves BI tools through a shared Hive metastore; reference:
  * hive-metastore/metastore-site.xml:29-40, docker-compose.yml:70-88).
  */
class CatalogSpec extends SparkSpec {

  test("catalog round-trip survives a new session over the same warehouse") {
    operators.Catalog.rebuildCatalogDims(spark, sf)
    // newSession() = fresh session state (temp views, conf) over the
    // SAME shared catalog + warehouse — the in-JVM analogue of a second
    // Thrift client connecting to the metastore
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists("graft_cat_nation"))
    assert(s2.table("graft_cat_nation").count() == 25)
    // temp views do NOT leak across sessions; catalog tables DO
    assert(spark.catalog.tableExists("graft_src_nation"))
    assert(!s2.catalog.tableExists("graft_src_nation"))
    // the warehouse directory holds real parquet readable by path — what
    // any other engine pointed at the warehouse would see
    val loc = new java.net.URI(
      s2.conf.get("spark.sql.warehouse.dir") + "/graft_cat_nation")
    assert(s2.read.parquet(new java.io.File(loc).getAbsolutePath)
      .count() == 25)
  }

  test("INSERT OVERWRITE replaces rather than appends") {
    operators.Catalog.rebuildCatalogDims(spark, sf)
    assert(spark.table("graft_cat_region").count() == 5)
    spark.sql("""INSERT OVERWRITE graft_cat_region
                 SELECT CAST(r_regionkey AS BIGINT), r_name
                 FROM graft_src_region WHERE r_regionkey < 2""")
    assert(spark.table("graft_cat_region").count() == 2)
  }

  test("DESCRIBE reflects the declared DDL types") {
    operators.Catalog.rebuildCatalogDims(spark, sf)
    val types = spark.sql("DESCRIBE TABLE graft_cat_nation")
      .filter(col("col_name") =!= "" && !col("col_name").startsWith("#"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types == Map("n_nationkey" -> "bigint", "n_name" -> "string",
      "n_regionkey" -> "bigint"))
  }

  test("view is catalogued as VIEW and re-resolves after base-table change") {
    SparkEntry.queries("catalog_ctas_view")(spark, sf).collect()
    val v = spark.catalog.listTables().collect()
      .filter(_.name == "graft_cat_v_revenue")
    assert(v.length == 1 && v(0).tableType == "VIEW",
      s"expected a catalogued VIEW, got ${v.toSeq}")
    // views are definitions, not snapshots: emptying the base table must
    // flow through at next read
    spark.sql("INSERT OVERWRITE graft_cat_orders_gold " +
      "SELECT o_orderstatus, CAST(0 AS BIGINT) FROM graft_src_orders LIMIT 1")
    assert(spark.table("graft_cat_v_revenue").count() == 1)
  }

  test("ALTER TABLE ADD COLUMNS: one catalog schema spans both row generations") {
    val rows = SparkEntry.queries("catalog_alter_add_column")(spark, sf)
      .collect()
    assert(spark.table("graft_cat_evolve").schema.fieldNames.toSeq ==
      Seq("id", "name", "region_key"))
    val (pre, post) = rows.partition(_.getLong(0) < 10)
    assert(pre.nonEmpty && pre.forall(_.isNullAt(2)),
      "pre-ALTER rows must read NULL in the added column")
    assert(post.nonEmpty && post.forall(!_.isNullAt(2)),
      "post-ALTER rows must carry the added column")
  }

  test("SHOW PARTITIONS lists the dynamic-partition registry") {
    val parts = SparkEntry.queries("catalog_show_partitions")(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("status=F", "status=O", "status=P"))
    // partition pruning works against the catalog table
    val pruned = spark.table("graft_cat_part").filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.head
    assert(scan.metadata.getOrElse("PartitionFilters", "").contains("status"))
  }
}
