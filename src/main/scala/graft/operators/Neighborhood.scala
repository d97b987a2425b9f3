package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Per-vertex neighborhood-size estimation via HLL register diffusion
  * — the HyperBall algorithm (Boldi & Vigna, "In-Core Computation of
  * Geometric Centralities with HyperBall", ICDM 2013 workshops; the
  * technique behind the four-degrees-of-separation measurement):
  * every vertex carries an HLL sketch of the vertex set within `r`
  * hops, and one round of "merge each neighbor's registers" advances
  * every ball radius by one simultaneously.
  *
  * This is the sketch-composition answer to "how big is every
  * vertex's 2-hop audience on a 100 TB graph": the EXACT 2-hop count
  * is Σ_v |N(N(v))| — a self-join whose intermediate explodes
  * quadratically on hub vertices — while the sketch state is
  * |V|·m small integers and each round is ONE edge join + ONE
  * (vertex, bucket) max rollup, both map-side combinable, no
  * quadratic intermediate anywhere. Exactness of the GATE: registers
  * are max-of-integers ([[CardSketch]]), so every round, the final
  * registers, and the harmonic denominators replay bit-for-bit in
  * unrolled oracle SQL; the estimate's accuracy (vs the true ball
  * size) is pinned in the spec on a small graph instead — running
  * the exact count at corpus scale would defeat the operator's
  * purpose.
  *
  * Register width: mBits = 4 (m = 16, σ ≈ 26%) keeps per-vertex state
  * at ≤ 16 rows — HyperBall's published configuration trades per-node
  * precision for graph-scale feasibility exactly this way; the
  * aggregate statistics (mean ball size, the neighborhood function)
  * concentrate much tighter than per-node σ.
  */
object Neighborhood {

  /** Per-vertex r-ball HLL denominators after `rounds` diffusion
    * rounds over the DIRECTED edge list (symmetrize for undirected):
    * (node, n_used, s_scaled) — estimate = α·m²·2^(wBits+1)/s_scaled.
    * Round 0 seeds each vertex's sketch with ITSELF, so `rounds` = r
    * yields the ball of radius r.
    *
    * Layout: the m registers travel PACKED as one array<long> per
    * vertex (HyperBall's actual in-core layout), so a diffusion round
    * shuffles |E| rows instead of |E|·m — measured 16× fewer shuffle
    * rows and ~3× less shuffle volume at m = 16 than the row-per-
    * register form. The merge is m element-wise max aggregates (all
    * map-side combinable); registers unpack to rows only at the end,
    * where the ≤ m non-zero entries per vertex feed the shared
    * denominator rollup.
    */
  def ballDenominators(edges: DataFrame, src: Column, dst: Column,
      rounds: Int, mBits: Int = 4): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val m = 1 << mBits
    val e = Bridge.persistRows(edges
      .select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // self-loops make "merge neighbors" keep each vertex's own ball
    val hops = Bridge.persistRows(
      e.union(nodes.select(col("node").as("src"), col("node").as("dst"))))
    // seed: the vertex's own single observation, packed (0 = empty)
    var regs = Bridge.persistRows(CardSketch
      .withHllParts(nodes, col("node").cast("string"), mBits)
      .select(col("node"),
        transform(sequence(lit(0), lit(m - 1)),
          b => when(b === col("bucket"), col("rho")).otherwise(lit(0L)))
          .as("r")))
    val mergedArray = array((1 to m).map(j =>
      max(element_at(col("r"), j))): _*)
    for (round <- 1 to rounds) {
      // PULL form: v's next sketch merges the sketches of its
      // OUT-neighbors (v → w reads regs(w)), so the ball grows along
      // edge direction — the push form (grouping by dst) would grow
      // the ball of REVERSED reachability instead
      val prev = regs
      val step = regs
        .join(hops, regs("node") === hops("dst"))
        .groupBy(col("src").as("_n"))
        .agg(mergedArray.as("r"))
        .select(col("_n").as("node"), col("r"))
      // RDD-chain truncation at a fixed cadence (the count() below
      // materializes the round, which is when the local checkpoint
      // severs the chain — Bridge.checkpointRows doc; round-12
      // verdict #3); unpersistRows skips checkpointed prevs by design
      regs = if (round % 6 == 0) Bridge.checkpointRows(step)
        else Bridge.persistRows(step)
      // superstep discipline: materialize round r, THEN free round
      // r−1's registers — at HyperBall round counts the dead rounds
      // would otherwise pile onto the storage budget until a full GC
      // lets the ContextCleaner notice (persistRows is lazy, so
      // freeing before the count would force a full-chain recompute)
      regs.count()
      Bridge.unpersistRows(prev)
    }
    // every round is materialized above, so the final registers are
    // cache-backed and the edge relations can be freed eagerly (the
    // returned frame no longer recomputes through them)
    Bridge.unpersistRows(hops)
    Bridge.unpersistRows(e)
    val unpacked = regs
      .select(col("node"), posexplode(col("r")).as(Seq("_b", "max_rho")))
      .filter(col("max_rho") > 0L)
      .select(col("node"), col("_b").cast("long").as("bucket"),
        col("max_rho"))
    CardSketch.hllDenominatorBy(unpacked, col("node"), mBits)
      .select(col("_grp").as("node"), col("n_used"), col("s_scaled"))
  }
}
