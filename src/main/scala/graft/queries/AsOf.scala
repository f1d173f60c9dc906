package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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

  private def num(v: Any): Double = graft.core.RowNum.num(v)

  /** GENERIC as-of join — the library entry point (QueryService routes
    * here). For every left row: the right row with the greatest
    * (rightTime, rightTieBreak...) such that rightTime <= leftTime
    * within the same key; right columns null when nothing qualifies
    * (left-join semantics).
    *
    * Plan: one shuffle per side (cogroup on the key), then a
    * two-pointer merge per key — O(|left| + |right|) per key, never
    * the (left × prior-right) pair blowup of the composed
    * window formulation (Analytics.asofJoin, kept ONLY as the
    * oracle baseline). AQE handles skewed keys; per-key buffers are
    * the only memory beyond the shuffle.
    */
  def asofJoinTables(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     rightTieBreak: Seq[String] = Nil): DataFrame = {
    val lSchema = left.schema
    val rSchema = right.schema
    val clash = lSchema.fieldNames.toSet.intersect(rSchema.fieldNames.toSet)
    require(clash.isEmpty, s"column name clash: $clash — rename before joining")
    val outSchema = StructType(lSchema.fields ++ rSchema.fields.map(_.copy(nullable = true)))
    val lKeyI = lSchema.fieldIndex(leftKey)
    val lTimeI = lSchema.fieldIndex(leftTime)
    val rKeyI = rSchema.fieldIndex(rightKey)
    val rTimeI = rSchema.fieldIndex(rightTime)
    val rTieIs = rightTieBreak.map(rSchema.fieldIndex)
    val rWidth = rSchema.length
    // SQL join semantics (matching the composed-window oracle baseline):
    // a null LEFT key matches nothing → null-extend directly, outside
    // the cogroup; RIGHT rows with a null key or null time can never be
    // "the most recent match" → dropped before the merge. Without this,
    // string-keying would equi-match null with null.
    val nullExtended = left.filter(left(leftKey).isNull)
      .select(lSchema.fieldNames.map(col) ++
        rSchema.fields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val lValid = left.filter(left(leftKey).isNotNull)
    val rValid = right.filter(right(rightKey).isNotNull && right(rightTime).isNotNull)
    val lg = lValid.groupByKey((r: Row) => String.valueOf(r.get(lKeyI)))(Encoders.STRING)
    val rg = rValid.groupByKey((r: Row) => String.valueOf(r.get(rKeyI)))(Encoders.STRING)
    val merged = lg.cogroup(rg) { (_, ls, rs) =>
      import scala.math.Ordering.Implicits.seqOrdering
      val lsArr = ls.toArray.sortBy(r => num(r.get(lTimeI)))
      val rsArr = rs.toArray.sortBy(r =>
        num(r.get(rTimeI)) +: rTieIs.map(i => num(r.get(i))))
      var ri = 0
      var last: Row = null
      lsArr.iterator.map { lrow =>
        val lt = num(lrow.get(lTimeI))
        while (ri < rsArr.length && num(rsArr(ri).get(rTimeI)) <= lt) {
          last = rsArr(ri); ri += 1
        }
        if (last == null) Row.fromSeq(lrow.toSeq ++ Seq.fill[Any](rWidth)(null))
        else Row.fromSeq(lrow.toSeq ++ last.toSeq)
      }
    }(Encoders.row(outSchema))
    merged.unionByName(nullExtended)
  }
}
