package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule, Tables}

/** Typed Dataset[T] surface: case-class Encoders + the typed combinator
  * API (`filter(_.x)`, `groupByKey`, `mapGroups`, `joinWith`) where
  * compile-time row types matter. The untyped modules show the DataFrame
  * path; this one proves the same engine semantics hold through Encoders
  * (serialization boundary, object-based group processing).
  *
  * Scale note: `mapGroups` materializes each group's iterator — fine for
  * bounded key spaces (event types here); unbounded keys belong in
  * groupBy(...).agg (partial aggregation). That trade-off is the point of
  * having both surfaces.
  */
object Typed extends QueryModule {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)

  val all: Seq[Q] = Seq(

    Q(
      "typed_event_stats",
      Some("""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events WHERE value > 0 GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "events").as[Event]
          .filter(_.value > 0)
          .groupByKey(_.event_type)
          .mapGroups { (etype, events) =>
            var n = 0L
            var cents = 0L
            val users = scala.collection.mutable.HashSet.empty[Long]
            events.foreach { e =>
              n += 1
              cents += math.round(e.value * 100)
              users += e.user_id
            }
            (etype, n, cents, users.size.toLong)
          }
          .toDF("event_type", "n", "value_cents", "n_users")
          .orderBy("event_type")
      }),

    // typed joinWith: pairs of full typed objects, not flattened columns —
    // the type-safe theta-join surface.
    Q(
      "typed_joinwith_region_nation",
      Some("""
        SELECT r_name, n_name FROM region JOIN nation
        ON r_regionkey = n_regionkey
        ORDER BY r_name, n_name"""),
      (s, dir) => {
        import s.implicits._
        val regions = Tables.load(s, dir, "region")
          .select(col("r_regionkey").cast("int"), col("r_name"))
          .as[(Int, String)]
        val nations = Tables.load(s, dir, "nation")
          .select(col("n_regionkey").cast("int"), col("n_name"))
          .as[(Int, String)]
        regions.joinWith(nations, regions("r_regionkey") === nations("n_regionkey"))
          .map { case ((_, rName), (_, nName)) => (rName, nName) }
          .toDF("r_name", "n_name")
          .orderBy("r_name", "n_name")
      })
  )
}
