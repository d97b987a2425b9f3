package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling variants for heavy-key aggregation (SURVEY §7.2 E5).
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. [[saltedAgg]] splits each key into `salt` sub-keys for the
  * first (wide) aggregation, then combines the partials in a second,
  * tiny aggregation — the classic two-phase salted pattern. Spark's
  * partial aggregation (map-side combine) already covers mild skew;
  * explicit salting is for the pathological case where even one
  * reducer's combined partials blow past executor memory, or where AQE
  * skew handling can't apply (aggregations, not joins).
  *
  * The decomposition must be algebraic: the caller provides the
  * partial aggregate and the merge of partials (e.g. sum/sum,
  * count/sum, min/min). Results are EXACTLY those of the unsalted
  * aggregation for algebraic aggregates — the oracle query checks this
  * equivalence, not merely plausibility.
  *
  * NOT salt-able: order-dependent per-key recursions (the EMA window) —
  * a sequential recursion has no algebraic merge, so a monster key is a
  * straggler by construction there (documented in SURVEY §7.4; the
  * mitigation is bounding key cardinality upstream, not salting).
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param df       input
    * @param key      grouping key
    * @param salt     number of sub-keys per key
    * @param partial  aggregates for phase 1, keyed by output name
    * @param merge    for each phase-1 name, how to merge partials
    */
  def saltedAgg(df: DataFrame, key: Column, salt: Int,
      partial: Seq[(String, Column)],
      merge: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(key, monotonically_increasing_id()), lit(salt)))
    val phase1 = salted.groupBy(key.as("_key"), col("_salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(col("_key"))
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** Salted exact count + sum of integer cents for a double column —
    * the common "hot key metering" shape, result identical to the
    * unsalted aggregation.
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      salt: Int = 16): DataFrame =
    saltedAgg(df, key, salt,
      partial = Seq(
        "cnt" -> count(lit(1)),
        "sum_cents" -> sum(round(value * 100).cast("long"))),
      merge = Seq(
        "cnt" -> (c => sum(c)),
        "sum_cents" -> (c => sum(c))))
}
