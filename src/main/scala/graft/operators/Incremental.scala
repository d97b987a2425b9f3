package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (merge-able) aggregation — the warm-start pattern for
  * recurring pipelines at scale: keep per-(key, partition-unit)
  * PARTIAL aggregates (e.g. daily), and answer the full-history
  * question by merging partials instead of rescanning 100 TB of raw
  * events. Correct exactly when the aggregate is algebraic (count,
  * sum, min, max — and means as sum/count); the DECIMAL sum
  * accumulator keeps the merge order-independent, so
  * merge(partials(A), partials(B)) is bit-equal to aggregate(A ∪ B)
  * under any partitioning or arrival order.
  */
object Incremental {

  /** Per-(key, unit) partial aggregate of `value`: n, decimal sum,
    * min, max. `unit` is the incremental batch column (e.g. the day).
    */
  def partials(df: DataFrame, key: Column, unit: Column,
      value: Column): DataFrame =
    df.groupBy(key.as("_k"), unit.as("_u"))
      .agg(count(lit(1)).as("p_n"),
        sum(value.cast("decimal(38,10)")).as("p_sum"),
        min(value).as("p_min"), max(value).as("p_max"))

  /** Merge partials down to per-key totals: the same schema the direct
    * aggregation over raw rows produces (avg derived once from the
    * exact decimal sum).
    */
  def merge(partials: DataFrame): DataFrame =
    partials.groupBy(col("_k"))
      .agg(sum(col("p_n")).as("n"),
        sum(col("p_sum")).as("_s"),
        min(col("p_min")).as("vmin"), max(col("p_max")).as("vmax"))
      .withColumn("vsum", col("_s").cast("double"))
      .withColumn("vavg", col("vsum") / col("n").cast("double"))
      .drop("_s")
}
