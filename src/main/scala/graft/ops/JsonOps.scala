package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column handling — the reference's event
  * tables carry JSON property blobs (events.props here), and every
  * dashboard eventually needs a typed field OUT of one: filter on a
  * property, aggregate a metric buried in the blob, group by a tag.
  *
  * Design: `get_json_object` (codegen'd path evaluation, total — null
  * on malformed JSON or missing path) + `try_cast` (ANSI mode throws
  * on bad casts; a property bag NEVER gets to fail a query) — so
  * extraction is a pure, total, per-row scalar: zero shuffle,
  * column-prunable, pushdown-friendly when used in a filter. For
  * hot fields at 100 TB the right long-term move is materializing
  * the extraction once into a typed column at ingest (these helpers
  * are exactly that `withColumn`); re-parsing JSON per query is the
  * cost this module makes visible, not a cost it hides.
  */
object JsonOps {

  /** One typed field out of a JSON column: `$.path` evaluated, cast
    * with TRY semantics — null on missing key, malformed JSON, or
    * untypeable value (Cast in EvalMode.TRY is codegen'd like any
    * cast; ANSI's throwing cast never reaches a property bag).
    */
  def field(jsonCol: Column, path: String, castTo: String): Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.Cast(
      expression(get_json_object(jsonCol, s"$$.$path")),
      org.apache.spark.sql.types.DataType.fromDDL(castTo),
      None,
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))
  }

  /** Materialize several typed fields from a JSON column at once —
    * the ingest-time flattening that makes hot properties first-class
    * (and pushdown-able) columns.
    */
  def flatten(df: DataFrame, jsonCol: String,
              fields: Seq[(String, String, String)]): DataFrame =
    fields.foldLeft(df) { case (acc, (name, path, t)) =>
      acc.withColumn(name, field(col(jsonCol), path, t))
    }
}
