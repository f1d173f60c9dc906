package graft.core

/** Shared orderable-scalar coercion for row values pulled out of
  * `Row.get` in per-group merge/sort kernels (as-of join, exact LTTB).
  *
  * All datetime types land on the SAME axis — microseconds since the
  * epoch — so cross-type comparisons (DATE column vs TIMESTAMP column)
  * order correctly:
  *  - Timestamp: floorDiv for the seconds part, so pre-1970 sub-second
  *    values don't round toward zero and mis-order;
  *  - java.sql.Date: ms → µs (was the 1000× trap vs Timestamp);
  *  - LocalDate: days → µs.
  * Nulls map to -Infinity: deterministic nulls-first ordering in every
  * kernel that sorts with this.
  */
object RowNum {
  def num(v: Any): Double = v match {
    case null => Double.NegativeInfinity
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L).toDouble * 1e6 + (t.getNanos / 1000).toDouble
    case i: java.time.Instant =>
      i.getEpochSecond.toDouble * 1e6 + (i.getNano / 1000).toDouble
    case l: java.time.LocalDateTime => // TIMESTAMP_NTZ rows
      l.toEpochSecond(java.time.ZoneOffset.UTC).toDouble * 1e6 +
        (l.getNano / 1000).toDouble
    case d: java.time.LocalDate => d.toEpochDay.toDouble * 86400e6
    case d: java.sql.Date => d.getTime.toDouble * 1000.0
    case b: java.math.BigDecimal => b.doubleValue
    case n: Number => n.doubleValue
    case other => other.toString.toDouble
  }
}
