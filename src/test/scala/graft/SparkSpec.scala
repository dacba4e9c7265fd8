package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. One session per suite (getOrCreate
  * reuses the JVM-wide session, so suites in one forked JVM share it).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    .getOrCreate()

  lazy val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session for the next suite (stop() would break sharing)
    super.afterAll()
  }
}
