package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Recursive exponential moving average as a native Catalyst window
  * function.
  *
  * Semantics replicate pandas `Series.ewm(span=n, adjust=False).mean()`
  * as used by the reference engine for MACD
  * (/root/reference/spark/stock_analysis.py:186-190):
  *
  * {{{
  *   e_0 = x_0
  *   e_t = alpha * x_t + (1 - alpha) * e_{t-1},   alpha = 2 / (span + 1)
  * }}}
  *
  * Null inputs restart nothing: a null x_t leaves the running value
  * unchanged (the reference never feeds nulls, so this branch is
  * defensive only).
  *
  * Implemented as an [[AggregateWindowFunction]] — a `DeclarativeAggregate`
  * evaluated by `WindowExec` over the running frame
  * `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`. This keeps the
  * recursion inside Spark's window machinery: one shuffle on the
  * partition key, sort by the ordering key, spill-capable via
  * `UnsafeExternalSorter` — so it scales to arbitrarily many groups
  * (each group's rows stream through sequentially, O(1) state).
  *
  * FP note: the update is evaluated exactly as written
  * (`alpha * x + (1 - alpha) * e`), which makes results bit-identical to
  * any engine computing the same recursion with IEEE doubles in the same
  * operand order (the DuckDB oracle's recursive CTE does).
  */
case class Ema(input: Expression, alpha: Expression)
    extends AggregateWindowFunction
    with BinaryLike[Expression]
    with ImplicitCastInputTypes {

  override def left: Expression = input
  override def right: Expression = alpha
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ema"
  // coerce SQL-literal alphas (e.g. `2.0/13.0` is DECIMAL(8,6)) and
  // non-double inputs — required for the registered SQL surface
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  private lazy val ema =
    AttributeReference("ema", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(
      IsNull(ema),
      input,
      If(
        IsNull(input),
        ema,
        Add(
          Multiply(alpha, input),
          Multiply(Subtract(Literal(1.0), alpha), ema)
        )
      )
    )
  )

  override lazy val evaluateExpression: Expression = ema

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Ema = copy(input = newLeft, alpha = newRight)
}

object Ema {

  /** pandas-style span smoothing factor: alpha = 2 / (span + 1). */
  def alphaForSpan(span: Int): Double = 2.0 / (span + 1.0)

  /** `ema(x, span) OVER (PARTITION BY part ORDER BY ord ROWS UNBOUNDED
    * PRECEDING)` as a complete windowed Column.
    *
    * The `WindowExpression` is constructed directly rather than via
    * `Column.over`: Spark 4.x's classic Column-node converter wraps any
    * `AggregateFunction` (including an `AggregateWindowFunction`) in an
    * `AggregateExpression` on the `.over` path, after which CheckAnalysis
    * rejects the plan with WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE. Building
    * the Catalyst node explicitly keeps the window function directly
    * under its `WindowExpression`, which analyzes and runs.
    */
  def emaSpan(x: Column, span: Int,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val spec = WindowSpecDefinition(
      partitionBy.map(Bridge.expression),
      orderBy.map(c => SortOrder(Bridge.expression(c), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    Bridge.column(WindowExpression(
      Ema(Bridge.expression(x.cast("double")), Literal(alphaForSpan(span))),
      spec))
  }
}
