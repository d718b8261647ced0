package graft.analytics

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset aggregation (the user-facing `Aggregator[IN, BUF,
  * OUT]` rung of the custom-aggregation ladder; the imperative-buffer
  * rung is [[graft.functions.MinHashAgg]]). Welford-free running
  * stats with an exact mergeable buffer.
  */
case class EventRow(user_id: Long, event_type: String, value: Double)

case class UserStats(n_events: Long, total_value: Double, max_value: Double,
    n_purchases: Long)

object TypedAggs {

  /** §2.2#74 oracle surface: the typed aggregator over every user's
    * events, flattened to scalar columns. `total_value` (a double sum
    * whose partial-merge order differs per engine) is rounded;
    * `max_value` is order-independent and stays exact.
    */
  def typedAggregatorQuery(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ds = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value")).as[EventRow]
    ds.groupByKey(_.user_id).agg(userStats).toDF("user_id", "stats")
      .select(col("user_id"),
        col("stats.n_events").as("n_events"),
        round(col("stats.total_value"), 2).as("total_value"),
        col("stats.max_value").as("max_value"),
        col("stats.n_purchases").as("n_purchases"))
      .orderBy(col("user_id"))
  }

  val userStats: TypedColumn[EventRow, UserStats] =
    new Aggregator[EventRow, (Long, Double, Double, Long), UserStats] {
      override def zero: (Long, Double, Double, Long) = (0L, 0.0, Double.NegativeInfinity, 0L)
      override def reduce(b: (Long, Double, Double, Long), e: EventRow): (Long, Double, Double, Long) =
        (b._1 + 1, b._2 + e.value, math.max(b._3, e.value),
          b._4 + (if (e.event_type == "purchase") 1L else 0L))
      override def merge(x: (Long, Double, Double, Long), y: (Long, Double, Double, Long)): (Long, Double, Double, Long) =
        (x._1 + y._1, x._2 + y._2, math.max(x._3, y._3), x._4 + y._4)
      override def finish(b: (Long, Double, Double, Long)): UserStats =
        UserStats(b._1, b._2, b._3, b._4)
      override def bufferEncoder: Encoder[(Long, Double, Double, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaDouble, Encoders.scalaLong)
      override def outputEncoder: Encoder[UserStats] = Encoders.product[UserStats]
    }.toColumn
}
