package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join — the record-linkage /
  * entity-resolution primitive: find pairs of rows whose string key is
  * within `maxDist` Levenshtein edits, without ever comparing all
  * pairs.
  *
  * Candidate generation is equi-join blocking on caller-chosen keys
  * (brand + size here; phonetic codes, sorted-token prefixes, or
  * length buckets in other linkage schemes), routed through
  * [[BucketPairs.boundedPairs]] so a degenerate block (every row
  * sharing one block key) salts into capped join cells instead of
  * quadratic work on a single reducer — the same 100 TB shape as the
  * MinHash band join. Verification is one codegen'd `levenshtein`
  * per candidate pair.
  *
  * The blocking keys are the recall contract: a pair in different
  * blocks is never compared (exactly like LSH bands — recall comes
  * from the key design, not the verifier). Distances are integers and
  * the pair set is a pure function of the blocks, so the whole output
  * is hash-gateable against an oracle that re-blocks and re-verifies
  * in SQL.
  */
object FuzzyJoin {

  /** All intra-block pairs (id_a < id_b) with
    * `levenshtein(name_a, name_b) <= maxDist`, columns
    * `id_a, id_b, name_a, name_b, dist`. `id` must be unique; block
    * keys must be non-NULL (NULL never equi-joins — NULL-keyed rows
    * are silently unblocked, matching SQL join semantics).
    */
  def selfJoin(df: DataFrame, id: Column, name: Column,
      blocks: Seq[(String, Column)], maxDist: Int,
      cap: Int = 1000): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val keys = blocks.map(_._1)
    val rows = df.select(
      blocks.map { case (n, c) => c.as(n) } ++
        Seq(id.as("id"), name.as("name")): _*)
    // Thresholded levenshtein: banded DP with early bailout, -1 when
    // the distance exceeds maxDist — ~10% over the full O(len²) DP on
    // the part-name fixture. A separate |len(a)−len(b)| <= maxDist
    // prefilter was measured SLOWER here (4.4→7.7 s at sf0.1): the
    // extra Filter between the pair join and the verify projection
    // breaks the fused codegen stage, and the length bound is already
    // the first row the banded DP rejects.
    // Block-key study (round 9): ADDING a length band to the block key
    // (spacing maxDist+1, adjacent-band emit — recall-complete, output
    // verified identical) was also measured SLOWER at sf0.1:
    // candidates ROSE 1.55M → 2.35M because the fixture's name
    // lengths cluster in a few bands while the ×2 band emit doubles
    // the join input; wall went 2.1 → 3.1 s. Length blocking only
    // pays when lengths actually spread — for this key distribution
    // the (brand, szb) scheme stays.
    // spreadInput: the name payload is one short string — the pair
    // enumeration + levenshtein verify dominate and must not inherit a
    // single scan task's parallelism (3.6 -> 1.2 s at sf0.1)
    BucketPairs.boundedPairs(rows, keys, "id", Seq("name"), cap,
        spreadInput = true)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }
}
