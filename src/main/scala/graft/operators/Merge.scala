package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational MERGE/upsert (SCD type-1 apply): fold a changes relation
  * into a base relation by key — matched rows take the change's
  * non-null values, unmatched changes are inserted, unmatched base
  * rows pass through. This is the CDC-apply step every periodically
  * refreshed corpus needs (the reference refreshes its OHLCV table by
  * full rewrite — fine at 135k rows, impossible at 100 TB; MERGE
  * touches one shuffle of base ∪ changes instead).
  *
  * Expressed as a single FULL OUTER equi-join + per-column COALESCE —
  * declarative, so Catalyst plans it as one sort-merge join keyed on
  * the merge key (broadcast when changes are small), and AQE handles a
  * skewed key. No MERGE INTO DML needed: the OUTPUT is the merged
  * relation, which a caller then writes wherever the base lives.
  */
object Merge {

  /** Upsert `changes` into `base` on equality of `key` (a column
    * present on both sides). `updateCols` are the base columns a
    * matched change overwrites when its value is non-null; base
    * columns absent from `changes` ride through unchanged, and
    * inserted rows take nulls there.
    *
    * CONTRACT: `changes` must be unique per key — a duplicated change
    * key would fan out its base row through the join. CDC feeds
    * pre-collapse with last-per-key (`q_last_per_group`'s max_by
    * shape) before applying.
    */
  def upsert(base: DataFrame, changes: DataFrame, key: String,
      updateCols: Seq[String]): DataFrame = {
    val b = base.as("b")
    val c = changes.as("c")
    val merged = b.join(c, Seq(key), "full_outer")
    val changeCols = changes.columns.toSet - key
    require(updateCols.forall(changeCols.contains),
      s"updateCols must exist in changes: missing ${updateCols.filterNot(changeCols.contains)}")
    val outCols = col(key) +: base.columns.filterNot(_ == key).map { name =>
      if (updateCols.contains(name))
        coalesce(col(s"c.$name"), col(s"b.$name")).as(name)
      else col(s"b.$name").as(name)
    }.toSeq
    merged.select(outCols: _*)
  }

  /** SCD type-2 versioning: turn a change log (key, change-time,
    * attributes) into interval-versioned dimension rows — each version
    * valid from its change time until just before the key's next
    * change; the latest version is open-ended (null `valid_to`,
    * `is_current` true). One window per key (`lead`), exact integer
    * time arithmetic; at scale this is the same single key-shuffle
    * shape as every other per-key window in the engine.
    */
  def scd2(changes: DataFrame, key: Column, tsUs: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsUs)
    changes
      .withColumn("valid_from", tsUs.cast("long"))
      .withColumn("valid_to", lead(tsUs.cast("long"), 1).over(w) - 1L)
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
