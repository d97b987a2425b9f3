package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-bounded intra-bucket pair generation — the candidate stage
  * shared by every banded-LSH family member (MinHash bands, SimHash
  * chunks, sign-LSH cosine buckets).
  *
  * The naive form is a self-equi-join on the bucket key: correct, but a
  * degenerate bucket (N identical documents — boilerplate pages, empty
  * docs) funnels all N rows to ONE reducer which then enumerates all
  * N²/2 pairs in a single task. The total candidate work is inherently
  * quadratic in the bucket size (the OUTPUT is every pair), but it does
  * not have to land on one task.
  *
  * Salting scheme (upper-triangle replication): each bucket of size m
  * is split into s = ceil(m / cap) sub-buckets by a deterministic hash
  * of the id. A pair whose members land in sub-buckets (u_a, u_b) with
  * u_a <= u_b is generated exactly once, in cell (i=u_a, j=u_b):
  *
  *  - "A" role: a row with sub-bucket u is replicated to cells (u, j)
  *    for j = u..s-1;
  *  - "B" role: the same row is replicated to cells (i, u) for
  *    i = 0..u;
  *  - the join key becomes (bucket key, i, j), so each cell holds
  *    ~2·m/s rows — bounded per-task input and memory — and the m²/2
  *    pair enumeration spreads over s·(s+1)/2 tasks.
  *
  * An OFF-DIAGONAL cell (i < j) holds two disjoint sub-buckets in
  * fixed roles, so each pair joins in exactly one role assignment. A
  * DIAGONAL cell (i = j) holds ONE sub-bucket in both roles — a plain
  * self-join that would produce both orderings — so diagonal cells
  * keep only id_a < id_b (exactly-once pinned by
  * BucketPairsProperties, which falsified the earlier uniform
  * `id_a != id_b` filter: every same-sub-bucket pair was emitted
  * twice, surviving only because callers dedup downstream). Ids are
  * then canonicalized (id_a < id_b, payloads swapped along) because
  * off-diagonal cells fix WHICH member takes the A role, not the id
  * order. For buckets with m <= cap, s = 1 and the plan degenerates to
  * the plain triangular self-join (one diagonal cell (0,0)).
  *
  * The per-bucket size lookup is a group-by + join on the SAME bucket
  * key the candidate join uses, so the extra stage is co-partitioned
  * with work we were doing anyway — and it never broadcasts, so the
  * hot-bucket count can be unbounded (at 100 TB a heavy-hitter list
  * might not fit on the driver).
  */
private[graft] object BucketPairs {

  /** All unordered intra-bucket pairs with bounded per-task input.
    *
    * @param rows    one row per (bucket, item): `keys ++ id ++ payload`
    * @param keys    bucket key column names (the equi-join key)
    * @param id      unique item id column name (pairs have id_a < id_b)
    * @param payload payload column names, carried to both sides with
    *                `_a`/`_b` suffixes (swapped along with the ids)
    * @param cap     target max sub-bucket size (rows per join cell side)
    * @return columns: s"${id}_a", s"${id}_b", payload with _a/_b
    *         suffixes — one row per (pair, covering bucket); callers
    *         dedup across buckets as before
    */
  def boundedPairs(rows: DataFrame, keys: Seq[String], id: String,
      payload: Seq[String], cap: Int = 1000,
      spreadInput: Boolean = false): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val sizes = rows.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_pm"))
    val salted0 = rows.join(sizes, keys)
      .withColumn("_ps",
        ceil(col("_pm").cast("double") / lit(cap.toDouble)).cast("int"))
      .withColumn("_pu", pmod(xxhash64(col(id)), col("_ps")).cast("int"))
      .drop("_pm")
    // Pair ENUMERATION parallelism (round-17; guide §2.5 input skew +
    // §8 "use what you know the planner does not"): the cell join's
    // output is quadratic in cell sizes, but its INPUT bytes are tiny,
    // so the planner gives the enumeration the probe side's partition
    // count — and when the banded relation enters on fewer partitions
    // than the session's parallelism (a single-row-group parquet scans
    // as ONE task; an unsplittable gzip likewise), every candidate
    // pair and its verifier run serially on those few cores no matter
    // the join strategy (a broadcast join inherits probe parallelism;
    // a shuffled join's tiny input coalesces to one partition — the
    // expansion factor is invisible to AQE, which sizes by bytes).
    // Known here by construction, so callers with LIGHT payloads opt
    // in via `spreadInput`: when under-partitioned, the salted
    // relation spreads round-robin across defaultParallelism tasks
    // (retry-safe — sortBeforeRepartition is on; the pair SET is
    // partitioning-invariant, pinned by BucketPairsProperties). Both
    // join sides derive from the same spread frame, so the exchange is
    // planned once and reused; at scale the scan side already carries
    // >= parallelism partitions and the branch is a no-op. Measured
    // q_fuzzy_join 3.6 -> 1.2 s at sf0.1 on local[32]. Callers whose
    // payload is a per-doc ARRAY (shingle sets, signatures, quantized
    // vectors) must NOT opt in: the spread would shuffle the heavy
    // payload bytes that the broadcast cell join otherwise moves once
    // (guide §2.3 — shuffle keys, not payloads; measured q_dedup_near_
    // pairs 1.4 -> 2.3–15.9 s when spread). Light-payload callers
    // whose A/B showed only noise (simhash chunks, PPJoin prefix,
    // triplet LSH keys, media phashes) stay at the default — only
    // measured wins opt in.
    val salted = if (!spreadInput) salted0 else {
      val par = rows.sparkSession.sparkContext.defaultParallelism
      if (rows.rdd.getNumPartitions < par) salted0.repartition(par)
      else salted0
    }

    val aCols = (id +: payload).map(c => col(c).as(s"${c}_a"))
    val bCols = (id +: payload).map(c => col(c).as(s"${c}_b"))
    val aSide = salted
      .withColumn("_pj", explode(sequence(col("_pu"), col("_ps") - 1)))
      .select(keys.map(col) ++ Seq(col("_pu").as("_pi"), col("_pj")) ++ aCols: _*)
    val bSide = salted
      .withColumn("_pi", explode(sequence(lit(0), col("_pu"))))
      .select(keys.map(col) ++ Seq(col("_pi"), col("_pu").as("_pj")) ++ bCols: _*)

    val ida = col(s"${id}_a")
    val idb = col(s"${id}_b")
    val joined = aSide.join(bSide, keys ++ Seq("_pi", "_pj"))
      .filter(when(col("_pi") === col("_pj"), ida < idb).otherwise(ida =!= idb))
    // canonicalize to id_a < id_b (the cell fixes roles, not id order)
    val ordered = ida < idb
    val canon = Seq(
      when(ordered, ida).otherwise(idb).as(s"${id}_a"),
      when(ordered, idb).otherwise(ida).as(s"${id}_b")) ++
      payload.flatMap(c => Seq(
        when(ordered, col(s"${c}_a")).otherwise(col(s"${c}_b")).as(s"${c}_a"),
        when(ordered, col(s"${c}_b")).otherwise(col(s"${c}_a")).as(s"${c}_b")))
    joined.select(canon: _*)
  }
}
