package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (the time-series "latest value at or before
  * t" join the reference's denormalized `current_price` carry sidesteps
  * — SURVEY §2.3 — and a first-class operator of every market-data
  * store).
  *
  * Implementation is union + window, NOT a join: right rows are tagged
  * and unioned with left rows, then ONE window pass per key (ordered by
  * (ts, side)) carries the latest right value forward with
  * `last(ignoreNulls = true)`. Left rows are filtered back out with
  * their carried value attached.
  *
  * Why this shape at 100 TB:
  *  - one shuffle on the key + one spillable sort — exactly the window
  *    pipeline's cost profile, no new machinery;
  *  - a range-predicate join (`l.ts >= r.ts` + max-per-left) explodes
  *    to O(|L|·|R|) pairs per key before the max; a per-left correlated
  *    probe is a driver-side anti-pattern. The union-window form is
  *    O(|L|+|R|) rows through a linear scan;
  *  - works unmodified as a stream-static or watermarked stream-stream
  *    pattern (the window becomes `mapGroupsWithState` carrying the
  *    same "latest right value" state).
  */
object AsOfJoin {

  /** For each left row, attach the latest `rightVal` from the right
    * side with `right.tsCol <= left.tsCol` within the same `key`
    * (null when no such row — left rows are never dropped).
    *
    * Both inputs must expose `key` and `tsCol` under the same names;
    * the right side must be unique per (key, ts) — pre-aggregate
    * (e.g. `max_by`) if it is not, otherwise the carried value among
    * equal timestamps is nondeterministic.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightVal: String, outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val lrowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rvType = right.schema(rightVal).dataType

    val l = left.select(col(key).as("_k"), col(tsCol).as("_t"),
      struct(leftCols.map(col): _*).as("_lrow"),
      lit(null).cast(rvType).as("_rv"), lit(0).as("_side"))
    val r = right.select(col(key).as("_k"), col(tsCol).as("_t"),
      lit(null).cast(lrowType).as("_lrow"),
      col(rightVal).as("_rv"), lit(1).as("_side"))

    // right rows sort BEFORE left rows at equal ts (side desc) so the
    // as-of predicate is inclusive (right.ts <= left.ts)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(outCol, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(leftCols.map(c => col(s"_lrow.$c").as(c)) :+ col(outCol): _*)
  }
}
