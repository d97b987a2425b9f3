package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in first-occurrence
  * order — semantics identical to
  * `array_distinct(zip_with-joined shifted slices)` but one tight JVM
  * pass per row (the HOF composition pays interpreted per-element
  * lambda evaluation plus repeated slicing; measured as the dominant
  * cost of the dedup queries at sf0.1). Same single-pass rationale as
  * [[MinHashBase]].
  *
  * With `hashed = true` the same pass emits the 64-bit xxhash64 (seed
  * 42, identical to Spark's `xxhash64` SQL function on a string) of
  * each gram instead of the gram text: downstream explodes, frequency
  * aggregations, and equi-joins then move 8-byte longs instead of
  * variable-width strings, and sorted-long verification can use the
  * zero-allocation [[SortedOverlapCount]] merge kernel. Jaccard over
  * the hashes equals Jaccard over the grams up to 64-bit collisions
  * (~|grams|²/2⁶⁵ — negligible at any realistic gram-space size, and
  * the same equivalence the MinHash band path already relies on).
  */
case class Shingles(child: Expression, n: Int, hashed: Boolean = false,
    md5Parity: Boolean = false, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def prettyName: String =
    if (md5Parity) "shingles_md5" else if (hashed) "shingles_hashed" else "shingles"
  override def dataType: DataType =
    if (hashed || md5Parity) ArrayType(LongType, containsNull = false)
    else ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    // `distinct = false` keeps every positional gram (index i = gram
    // starting at token i) — the form the positional gram table and
    // the per-(doc, gram) frequency consumers need; `true` dedups in
    // first-occurrence order (array_distinct semantics).
    val seen: java.util.Collection[Any] =
      if (distinct) new java.util.LinkedHashSet[Any](m * 2)
      else new java.util.ArrayList[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = toks.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      val gram = UTF8String.concat(parts: _*)
      if (md5Parity) seen.add(Shingles.md5Prefix60(gram))
      else if (hashed)
        seen.add(XXH64.hashUnsafeBytes(
          gram.getBaseObject, gram.getBaseOffset, gram.numBytes, 42L))
      else seen.add(gram)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) of a token
  * array in one pass: the DISTINCT sliding-window minima of the
  * positional word-n-gram md5-prefix-60 hashes — value-identical to
  * positional [[Shingles]] (md5Parity) → posexplode →
  * `min(_h) over (partition by doc order by _pos rows window-1
  * preceding)` → `_pos >= window-1` filter → per-doc distinct, but
  * with NO exchange, sort, window, or distinct operator: the window
  * minimum of a row-local gram sequence never needed to leave the row
  * (guide §2.4). Docs with fewer than `window` grams emit nothing
  * (the relational form's `_pos >= window-1` filter kept no row).
  * Distinctness is per document; callers joining on the fingerprint
  * must supply unique doc ids (the contract every pair consumer here
  * already holds).
  */
case class WinnowFps(child: Expression, n: Int, window: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  require(window >= 1, "window must be >= 1")
  override def prettyName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFps].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    val g = m - n + 1
    if (m < n || g < window)
      return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = toks.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      hs(i) = Shingles.md5Prefix60(UTF8String.concat(parts: _*))
      i += 1
    }
    // sliding-window minima, deduped in first-occurrence order (the
    // relational distinct's order never mattered — consumers join on
    // the value)
    val seen = new java.util.LinkedHashSet[Any](g * 2)
    var p = window - 1
    while (p < g) {
      var mn = hs(p - window + 1)
      var q = p - window + 2
      while (q <= p) { if (hs(q) < mn) mn = hs(q); q += 1 }
      seen.add(java.lang.Long.valueOf(mn))
      p += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object Shingles {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The oracle-parity 60-bit gram hash, computed from digest BYTES:
    * the integer value of the first 15 hex chars of md5(gram) equals
    * the big-endian unsigned value of the digest's first 8 bytes
    * logically shifted right by 4 (one hex char = one nibble), so no
    * hex string is ever materialized. Value-identical to SQL
    * `conv(substring(md5(g),1,15),16,10)` / DuckDB
    * `('0x' || substr(md5(g),1,15))::BIGINT` — pinned by
    * ShinglesSpec's side-by-side SQL comparison. Always non-negative
    * (top 4 bits zeroed), fitting both engines' signed BIGINT.
    */
  def md5Prefix60(gram: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(gram.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
