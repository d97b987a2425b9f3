package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Connected components over an undirected edge list, and the dedup
  * clustering built on it (near-duplicate PAIRS → duplicate CLUSTERS →
  * one canonical survivor per cluster — the missing last step of a
  * production dedup pipeline: greedy pair-based dropping is
  * order-dependent and over-deletes on chains, while
  * cluster-then-survive is deterministic and keeps exactly one document
  * per transitive duplicate group).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * shuffle-native formulation that converges in O(log² n) rounds on any
  * graph (O(log n) in practice; dedup graphs, whose components are
  * near-cliques with tiny diameters, converge in 2-3 rounds). Each
  * round is two aggregate+join stages keyed on the node id — no
  * adjacency list is ever materialized per node (no collect_list, no
  * driver-side graph), so a 100 TB edge set with a billion-node
  * component flows through the same bounded-memory shuffles as any
  * group-by. The min-label invariant makes the output deterministic
  * under any partitioning: every node labels itself with the smallest
  * node id reachable from it.
  */
object Clusters {

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the smallest node of its closed neighborhood.
    * Formulated as min-aggregate + equi-join on the center id (both
    * co-partitioned), never as a gathered neighbor list.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = und.groupBy("u").agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("u"), col("_mn")).as("_m"))
    // No trailing distinct: duplicates here are bounded (≤ 2|E| rows)
    // and the following smallStar ends in a distinct anyway — dropping
    // it removes one shuffle stage per round (round-8 fixpoint-loop
    // cost trim; the loop was pure stage overhead on tiny edge sets).
    und.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("_m").as("v"))
  }

  /** One small-star round: every node connects its smaller-or-equal
    * neighbors (and itself) to the smallest of them. Input and output
    * edges are oriented u > v.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min(col("v")).as("_m"))
    val moved = edges.join(mins, "u")
      .filter(col("v") =!= col("_m"))
      .select(col("v").as("u"), col("_m").as("v"))
    moved.union(mins.select(col("u"), col("_m").as("v"))).distinct()
  }

  /** (count, order-independent checksum) — a cheap set signature for
    * the fixpoint test. Edge sets are distinct, so XORing a 64-bit
    * hash of each row (overflow-free under ANSI mode, unlike sum)
    * detects any change with collision probability ~2⁻⁶⁴ per round.
    * Returned as a 1-row frame so two rounds' signatures can be
    * unioned into a SINGLE driver action (see the batched loop below).
    */
  private def signatureDf(edges: DataFrame, round: Int): DataFrame =
    edges.agg(
      count(lit(1)).as("_n"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("_x"))
      .select(lit(round).as("_r"), col("_n"), col("_x"))

  /** Connected components of the undirected graph given by
    * (`src`, `dst`) pairs (long-castable ids; self-loops ignored).
    *
    * @return (node, component) for every node appearing in an edge,
    *         where component = min node id of the connected component.
    *         Isolated nodes never reach this function — callers union
    *         them back with component = own id (see [[dedupClusters]]).
    *
    * Runs large-star + small-star rounds until the edge set reaches a
    * fixpoint (a star forest: every node points directly at its
    * component root), checked by an order-independent set signature —
    * driver control flow only, never a data collect. Rounds run in
    * BATCHES OF TWO per driver action: both rounds' plans are built
    * lazily and their two 1-row signature aggregates unioned into one
    * job, halving driver round-trips and letting the scheduler
    * pipeline all stages of both rounds (round-8 fix: the per-round
    * action structure made the fixpoint loop pure job-scheduling
    * overhead — the sf0.1 dedup graph is 244 edges converging in 1
    * round, yet the loop cost ~2.5 s). Intermediate edge sets are
    * persisted at the RDD layer (each round reads its input twice:
    * min-aggregate + join; batch-mate reads it again) and freed by the
    * ContextCleaner as earlier rounds' frames go out of scope.
    */
  def connectedComponents(edges: DataFrame, src: Column, dst: Column,
      maxIter: Int = 25): DataFrame = {
    var cur = Bridge.persistRows(edges
      .select(src.cast("long").as("u"), dst.cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct())
    // sig of the previous round's edge set; None before any round has
    // run (the initial set's signature is never computed on its own —
    // it would cost a whole extra job just to catch the rare
    // already-a-star-forest input one round earlier).
    var sig: Option[(Long, Long)] = None
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val n1 = Bridge.persistRows(smallStar(largeStar(cur)))
      val n2 = Bridge.persistRows(smallStar(largeStar(n1)))
      val sigs = signatureDf(n1, 1).union(signatureDf(n2, 2))
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getLong(1), r.getLong(2)))
      val (s1, s2) = (sigs(0), sigs(1))
      if (sig.contains(s1)) { // round it+1 was a no-op; n1 == cur
        converged = true
        cur = n1
        it += 1
      } else {
        converged = s2 == s1
        sig = Some(s2)
        cur = n2
        it += 2
      }
    }
    // star forest: every edge is (node, root); roots appear only on the
    // v side and label themselves
    cur.select(col("u").as("node"), col("v").as("component"))
      .union(cur.select(col("v")).distinct()
        .select(col("v").as("node"), col("v").as("component")))
  }

  /** Duplicate clusters over a document table: MinHash-LSH near-dup
    * pairs at `threshold`, closed transitively into components.
    *
    * @return one row per INPUT document: (doc_id, cluster_id), where
    *         cluster_id = min doc_id of the duplicate cluster and
    *         singletons (no near-duplicate) label themselves. Keeping
    *         `doc_id === cluster_id` rows is the canonical-survivor
    *         dedup; the full labeling also supports cluster-size stats
    *         and duplicate-aware sampling.
    *
    * The component relation is bounded by the number of docs appearing
    * in any near-dup pair — tiny relative to the corpus — so the final
    * enrichment join broadcasts under AQE at any corpus scale.
    */
  def dedupClusters(df: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, bucketCap: Int = 1000): DataFrame = {
    val pairs = Dedup.nearDupPairs(df, id, text, shingleN, k, bands,
      threshold, bucketCap)
    val cc = connectedComponents(pairs, col("doc_a"), col("doc_b"))
      .withColumnRenamed("node", "_cc_id")
    df.select(id.as("doc_id"))
      .join(cc, col("doc_id") === col("_cc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
  }
}
