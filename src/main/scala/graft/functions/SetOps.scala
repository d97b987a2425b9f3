package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `sorted_overlap(a, b)` — intersection size of two SORTED distinct
  * `array<long>` columns via a single merge scan.
  *
  * Why custom: `size(array_intersect(a, b))` builds a hash set per
  * row-pair (boxing every element); the set-similarity verification
  * stage evaluates it once per candidate pair, which made it the
  * hottest stage of the exact Jaccard join (measured 4 s of an ~11 s
  * run at sf0.1). The merge scan does ~|a|+|b| primitive comparisons
  * with zero allocation. Codegen calls the kernel directly (same
  * pattern as [[DotProduct]]), keeping whole-stage codegen intact.
  *
  * Caller contract: both arrays sorted ascending with distinct
  * elements (the operator sorts once upstream, amortized over all
  * pairs touching the row).
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_overlap"
  override def dataType: DataType = IntegerType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sovl", this, classOf[SortedOverlapCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  def compute(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}
