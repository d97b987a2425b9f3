package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a regular grid with forward fill — the
  * gap-filling pass every bar/OHLCV pipeline needs before indicator
  * math (the reference's source delivers irregular ticks; rolling
  * windows assume a regular cadence).
  *
  * Shape: per-key observed buckets (max_by keeps the LATEST value in
  * a bucket — deterministic because the event time is unique per
  * key), per-key bounds, grid generation as a per-key `sequence`
  * explode (rows expand map-side — no shuffle for the grid), one left
  * join back to observations on (key, bucket), and the carry-forward
  * as `last(ignoreNulls)` over the per-key ordered window — the same
  * single key-shuffle + spillable-sort cost profile as the indicator
  * pipeline. Grid size is bounded by span/step per key; a key with a
  * pathological span is visible directly in its bounds row.
  */
object Resample {

  /** Fill `value` forward onto a regular `stepUs` grid per `key`,
    * from each key's first observed bucket to its last. Output:
    * key, bucket (epoch-µs index), value (carried forward within
    * gaps; never null because each key's grid starts at an observed
    * bucket).
    */
  def gridFill(df: DataFrame, key: Column, tsUs: Column, value: Column,
      stepUs: Long): DataFrame = {
    require(stepUs >= 1, "step must be positive")
    val ev = df.select(key.as("_k"), tsUs.as("_t"), value.as("_v"))
      .withColumn("_b", expr(s"_t DIV ${stepUs}L"))
    val obs = ev.groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_v"), col("_t")).as("_obs"))
    val grid = ev.groupBy(col("_k"))
      .agg(min(col("_b")).as("_mn"), max(col("_b")).as("_mx"))
      .select(col("_k"),
        explode(sequence(col("_mn"), col("_mx"))).as("_b"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("_k", "_b"), "left")
      .withColumn("value", last(col("_obs"), ignoreNulls = true).over(w))
      .select(col("_k").as("key"), col("_b").as("bucket"), col("value"))
  }
}
