package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over classifier scores — the audit pass a
  * corpus pipeline runs after training (or importing) a quality /
  * language / topic gate before trusting it on 100 TB of data: ROC
  * AUC, calibration (reliability) bins, and a two-sample
  * Kolmogorov-Smirnov drift statistic.
  *
  * Everything here is EXACT integer arithmetic over integer scores
  * (the hashed-classifier scores, quantized logits, fixed-point
  * prices): the metric numerators and denominators are BIGINTs and
  * the only doubles are single trailing divisions of exactly-known
  * integers — IEEE-correctly-rounded in any engine, so every metric
  * hash-gates against the DuckDB oracle.
  *
  * Scale shape: each metric is one map-side-combinable group-by on
  * the score value followed by either a broadcast of the per-score
  * relation's 1-row totals or the two-phase distributed prefix scan
  * ([[Packing.withGlobalCumsum]] — range partition, per-partition
  * windows, broadcast offsets). No metric ever sorts, windows, or
  * collects the raw observation relation: after the first aggregate
  * the working set is |distinct scores| rows, and the only
  * single-task window anywhere runs over ~|partitions| rows of scan
  * metadata.
  */
object Eval {

  /** Tie-aware ROC AUC of `score` (integral) predicting boolean
    * `label`, as one row:
    * (n_pos, n_neg, auc_num, auc_den, auc) with
    * auc = auc_num / auc_den, auc_num = 2·U = Σₛ pos(s)·(2·negBelow(s)
    * + neg(s)), auc_den = 2·n_pos·n_neg — the Mann-Whitney U
    * formulation with ties counted half, kept in exact BIGINTs (the
    * standard "sort by score and sum ranks" formulation needs a global
    * rank; this one needs only the exclusive prefix sum of negative
    * counts over the distinct-score relation, which
    * [[Packing.withGlobalCumsum]] computes without a single-task
    * window).
    *
    * auc is NULL when either class is empty (0/0 is
    * engine-dialect-dependent; NULL is not). Overflow contract:
    * auc_num ≤ 2·n_pos·n_neg, so the exact-integer surface needs
    * n_pos·n_neg < 2⁶² (~3·10⁹ rows per class); the double `auc` is
    * the value that matters at corpus scale and survives beyond that
    * because long→double conversion and division round identically
    * (to-nearest-even) everywhere.
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val obs = df.select(score.cast("long").as("_s"),
      when(label, 1L).otherwise(0L).as("_y"))
    val byScore = obs.groupBy("_s")
      .agg(sum(col("_y")).as("_pos"),
        (count(lit(1)) - sum(col("_y"))).as("_neg"))
    val cum = Packing.withGlobalCumsum(byScore, col("_s"), col("_neg"),
      "_neg_below")
    cum.agg(sum(col("_pos")).as("n_pos"), sum(col("_neg")).as("n_neg"),
        sum(col("_pos") * (col("_neg_below") * 2 + col("_neg")))
          .as("auc_num"))
      .select(col("n_pos"), col("n_neg"), col("auc_num"),
        (col("n_pos") * col("n_neg") * 2).as("auc_den"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(col("auc_num").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double"))
          .cast("double").as("auc"))
  }

  /** Calibration (reliability) table: `bins` equal-width score bins
    * between the global min and max score, one row per non-empty bin:
    * (bin, score_lo, score_hi, n, n_pos, pos_rate). A well-calibrated
    * scorer shows pos_rate rising monotonically with bin — the
    * standard reliability diagram, as a relation.
    *
    * bin = (score − min)·bins DIV (max − min + 1): exact integer
    * floor-division on non-negative operands, identical in any
    * dialect (`/` would be double division). The min/max pair is a
    * 1-row broadcast; everything else is one map-side-combinable
    * aggregate. pos_rate is the single trailing division.
    */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val obs = df.select(score.cast("long").as("_s"),
      when(label, 1L).otherwise(0L).as("_y"))
    val mm = obs.agg(min(col("_s")).as("_mn"), max(col("_s")).as("_mx"))
    obs.crossJoin(broadcast(mm))
      .withColumn("bin", expr(s"(_s - _mn) * $bins DIV (_mx - _mn + 1)"))
      .groupBy("bin")
      .agg(min(col("_s")).as("score_lo"), max(col("_s")).as("score_hi"),
        count(lit(1)).as("n"), sum(col("_y")).as("n_pos"))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n").cast("double"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between the `isA` and
    * ¬`isA` populations of integral `value`, as one row:
    * (n_a, n_b, ks_num, ks_den, ks) with
    * ks = max over distinct values v of |F_A(v) − F_B(v)|, kept exact
    * by cross-multiplication: ks_num = max |cumA(v)·n_b − cumB(v)·n_a|,
    * ks_den = n_a·n_b — the distribution-drift test a pipeline runs
    * between train/val splits, between snapshots, or between a source
    * and the blend (PSI's nonparametric, binning-free sibling).
    *
    * Both running CDFs ride ONE two-phase prefix scan by packing the
    * per-value counts into a single long (cntA + cntB·2³²): the packed
    * sums are carry-free while each population has < 2³¹ rows, which a
    * raise_error guard on the (already-needed) 1-row totals enforces —
    * beyond that, run two scans. Exact-integer surface needs
    * n_a·n_b < 2⁶² (cross-multiplied terms); the double `ks` is the
    * scale-path value.
    */
  def ksTest(df: DataFrame, value: Column, isA: Column): DataFrame = {
    val Pack = 4294967296L // 2^32
    val obs = df.select(value.cast("long").as("_v"),
      when(isA, 1L).otherwise(0L).as("_a"))
    val byV = obs.groupBy("_v")
      .agg(sum(col("_a")).as("_ca"),
        (count(lit(1)) - sum(col("_a"))).as("_cb"))
    val cum = Packing.withGlobalCumsum(
        byV.withColumn("_packed", col("_ca") + col("_cb") * lit(Pack)),
        col("_v"), col("_packed"), "_cum_before")
      .withColumn("_cum", col("_cum_before") + col("_packed"))
    val tot = byV.agg(sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") < lit(Pack / 2) && col("n_b") < lit(Pack / 2),
          lit(0L)).otherwise(raise_error(lit(
            "ksTest: packed scan needs each side < 2^31 rows — " +
              "run two scans")).cast("long")).as("_guard"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        (abs(expr(s"_cum % ${Pack}L") * col("n_b") -
          expr(s"_cum DIV ${Pack}L") * col("n_a")) + col("_guard"))
          .as("_d"))
      .groupBy("n_a", "n_b")
      .agg(max(col("_d")).as("ks_num"))
      .select(col("n_a"), col("n_b"), col("ks_num"),
        (col("n_a") * col("n_b")).as("ks_den"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          .otherwise(col("ks_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double"))
          .cast("double").as("ks"))
  }
}
