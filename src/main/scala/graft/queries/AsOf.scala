package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Merge as-of join — the no-blowup scale path.
  *
  * The composed formulation (Analytics.asofJoin: equi-join on the key
  * with `o_orderdate <= ts`, then keep-latest per event) materializes
  * every (event, prior order) pair before the window filter — at 100 TB
  * that intermediate is quadratic in per-key history. This version
  * cogroups both sides on the key (one shuffle each, no pair
  * materialization) and runs a two-pointer merge per key: events in
  * time order, orders advancing once — O(|events| + |orders|) per key,
  * constant memory beyond the per-key buffers.
  *
  * Semantics are identical to the composed form (spec + shared oracle):
  * for each event, the key's latest order with o_orderdate <= ts, ties
  * on o_orderdate broken by the largest o_orderkey; events with no
  * qualifying order keep nulls (left join).
  */
object AsOf {

  def asofJoinMerged(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, Timestamp, Long)]
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .as[(Long, Long, Timestamp)]

    events.groupByKey(_._3)
      .cogroup(orders.groupByKey(_._1)) { (key, evs, ords) =>
        val es = evs.toArray.sortBy(e => (e._2.getTime, e._1))
        // orders ascending by (date, orderkey): the last pointer value
        // is the max-date / max-orderkey qualifying order
        val os = ords.toArray.sortBy(o => (o._3.getTime, o._2))
        var oi = 0
        var last: (Long, Long, Timestamp) = null
        es.iterator.map { case (eid, ts, uid) =>
          while (oi < os.length && !os(oi)._3.after(ts)) {
            last = os(oi); oi += 1
          }
          if (last == null) (eid, ts, uid, None: Option[Long], None: Option[Timestamp])
          else (eid, ts, uid, Some(last._2), Some(last._3))
        }
      }
      .toDF("event_id", "ts", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }
}
