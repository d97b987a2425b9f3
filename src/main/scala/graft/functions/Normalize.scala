package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * codegen scalar — the first cleaning step of any serious text
  * pipeline: "é" as U+0065 U+0301 and as U+00E9 must hash, dedup,
  * shingle, and join identically, and raw web text mixes both freely.
  * Spark ships no normalizer; a Scala UDF would serialize through the
  * encoder boundary on every row, so this is a native Expression with
  * real `doGenCode` (the kernel is invoked directly from generated
  * code — no eval island, same pattern as the TextScan kernels).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that returns
  * true for ASCII and already-composed text (the overwhelming
  * majority of a real corpus), in which case the INPUT UTF8String is
  * returned as-is — zero allocation per row on the hot path.
  *
  * Oracle parity: DuckDB's `nfc_normalize` and the JDK's
  * `java.text.Normalizer` both implement UAX #15; q_text_normalize
  * hash-matches through the full fixture corpus.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  // Declared so misuse (nfc_normalize(123)) is an analysis-time type
  // error, not a runtime ClassCastException.
  override def inputTypes: Seq[DataType] = Seq(StringType)

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this,
      classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(text: UTF8String): UTF8String = {
    import java.text.Normalizer
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}
