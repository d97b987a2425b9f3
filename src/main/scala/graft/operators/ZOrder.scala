package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the clustering transform behind
  * multi-dimensional data skipping: sorting a table by the interleaved
  * key places rows close in BOTH dimensions into the same file/row
  * group, so per-file min/max statistics prune scans filtered on
  * either dimension (the layout trick lakehouse OPTIMIZE/CLUSTER BY
  * implementations apply before writing 100 TB of parquet; classic
  * B-tree-era reference: Orenstein & Merrett 1984).
  *
  * The key is pure bit interleaving — integer-exact, engine-neutral,
  * a narrow codegen projection with zero shuffles. The demonstration
  * aggregate [[bucketProfile]] makes the skipping claim checkable
  * relationally: group rows by aligned key prefix ("the file") and
  * emit each bucket's per-dimension min/max span — for an aligned
  * 2k-bit prefix each dimension's span is < 2^(bits−k), the bound a
  * min-max pruner exploits (and the bound [[ZOrderSpec]] pins
  * exactly; an unclustered layout gives each file the FULL domain
  * span, pruning nothing).
  */
object ZOrder {

  /** The Morton key interleaving the low `bits` bits of two
    * non-negative integer columns: bit k of x lands at position 2k,
    * bit k of y at 2k+1. Values must fit in `bits` bits (the caller
    * range-reduces first — quantile ranks or fixed-grid coordinates);
    * 2·bits ≤ 62 keeps the key a positive long.
    */
  def zkey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { k =>
      shiftleft(shiftright(x.cast("long"), k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), k).bitwiseAND(lit(1L)),
            2 * k + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** DuckDB SQL text computing the identical key — the oracle side of
    * the interleave, generated from the same loop.
    */
  def zkey2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { k =>
      s"((($x >> $k) & 1) << ${2 * k}) | ((($y >> $k) & 1) << ${2 * k + 1})"
    }.mkString("(", " | ", ")")

  /** Per-bucket layout profile under an aligned Z-prefix of
    * `prefixBits` bit-pairs: bucket = zkey >> (2·(bits − prefixBits)),
    * with each bucket's row count and per-dimension min/max — the
    * relational form of "what would a min-max pruner see per file".
    * Output: bucket, n, x_min, x_max, y_min, y_max.
    */
  def bucketProfile(df: DataFrame, x: Column, y: Column,
      bits: Int = 16, prefixBits: Int = 4): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= bits,
      "prefixBits must be in [1, bits]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    df.select(xl.as("_x"), yl.as("_y"),
        zkey2(xl, yl, bits).as("_z"))
      .groupBy(shiftright(col("_z"), 2 * (bits - prefixBits)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("_x")).as("x_min"), max(col("_x")).as("x_max"),
        min(col("_y")).as("y_min"), max(col("_y")).as("y_max"))
  }
}
