package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Clamped running sum — the one-sided CUSUM recursion (Page 1954,
  * "Continuous Inspection Schemes"):
  *
  * {{{
  *   s_0 = max(0, d_0)
  *   s_t = max(0, s_{t-1} + d_t)
  * }}}
  *
  * where `d_t` is the caller-supplied deviation (`x_t − target` for the
  * upward chart, `target − x_t` for the downward one). The clamp resets
  * the accumulated evidence whenever it dips below zero, which is what
  * distinguishes CUSUM change detection from a plain prefix sum: only
  * CONSECUTIVE drift accumulates.
  *
  * Same execution contract as [[Ema]] (the other recursive member of
  * this family): an `AggregateWindowFunction` over the running row
  * frame — one shuffle on the partition key, streaming O(1) state per
  * group, spill-capable sort, no group buffering. Null deviations leave
  * the state unchanged (defensive; callers never feed nulls).
  *
  * FP note: the update is evaluated exactly as written
  * (`greatest(0.0, s + d)` on IEEE doubles), so results are
  * bit-identical to any engine running the same recursion in the same
  * operand order — the DuckDB oracle's recursive CTE does.
  */
case class Cusum(input: Expression)
    extends AggregateWindowFunction
    with UnaryLike[Expression]
    with ImplicitCastInputTypes {

  override def child: Expression = input
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cusum"
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  private lazy val s =
    AttributeReference("cusum", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(s)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(
      IsNull(input),
      s,
      Greatest(Seq(
        Literal(0.0),
        If(IsNull(s), input, Add(s, input))))
    )
  )

  override lazy val evaluateExpression: Expression = s

  override protected def withNewChildInternal(newChild: Expression): Cusum =
    copy(input = newChild)
}

object Cusum {

  /** `cusum(d) OVER (PARTITION BY part ORDER BY ord ROWS UNBOUNDED
    * PRECEDING)` as a complete windowed Column — built directly as a
    * Catalyst node for the same Spark 4.x `.over` reason documented on
    * [[Ema.emaSpan]].
    */
  def over(d: Column, partitionBy: Seq[Column],
      orderBy: Seq[Column]): Column = {
    val spec = WindowSpecDefinition(
      partitionBy.map(Bridge.expression),
      orderBy.map(c => SortOrder(Bridge.expression(c), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    Bridge.column(WindowExpression(
      Cusum(Bridge.expression(d.cast("double"))), spec))
  }
}
