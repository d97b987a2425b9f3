package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Skew}

/** Salted two-phase aggregation must equal the plain aggregation
  * exactly, including under pathological skew; banded-LSH candidate
  * generation must survive degenerate buckets with bounded per-task
  * input (BucketPairs salting).
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedCountSum equals plain groupBy on a 99%-one-key skew") {
    val rows = Seq.tabulate(10000)(i =>
      (if (i % 100 == 0) i.toLong % 7 else 42L, (i % 97) / 10.0))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, col("k"), col("v"), salt = 16)
      .select(col("_key").as("k"), col("cnt"), col("sum_cents"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("v") * 100).cast("long")).as("sum_cents"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("salted result is stable across salt factors") {
    val df = Seq.tabulate(1000)(i => (i % 3L, i.toDouble)).toDF("k", "v")
    val at = (s: Int) => Skew.saltedCountSum(df, col("k"), col("v"), salt = s)
      .orderBy("_key").collect().map(_.toSeq).toSeq
    assert(at(2) === at(64))
  }

  // --- BucketPairs: hot-band salting for the LSH dedup family ---

  test("nearDupPairs on 1k IDENTICAL docs: all pairs, bucket cap forced") {
    // every band key degenerates to ONE bucket of 1000 rows; with
    // bucketCap=50 the candidate join runs over 20 sub-buckets per
    // band (~50-row cells) instead of one 1000-row reducer
    val n = 1000
    val docs = Seq.tabulate(n)(i =>
      (i.toLong, "the same boilerplate page body repeated verbatim " +
        "across every single crawled document in the corpus"))
      .toDF("doc_id", "text").repartition(8)
    val pairs = Dedup.nearDupPairs(docs, col("doc_id"), col("text"),
      bucketCap = 50)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    // identical docs: every jaccard is exactly 1.0
    assert(pairs.filter(col("jaccard") =!= 1.0).count() === 0)
  }

  test("bucket salting does not change the pair set (cap 7 == cap huge)") {
    // mixed corpus: some unique docs, one 40-copy hot group
    val docs = (Seq.tabulate(60)(i =>
        (i.toLong, s"unique document number $i with words w$i x$i y$i z$i")) ++
      Seq.tabulate(40)(i =>
        (1000L + i, "hot duplicated body shared by forty documents")))
      .toDF("doc_id", "text").repartition(8)
    val run = (cap: Int) => Dedup.nearDupPairs(docs, col("doc_id"),
        col("text"), bucketCap = cap)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(run(7) === run(1000000))
  }

  test("simhash pair set is salting-invariant too") {
    val docs = (Seq.tabulate(30)(i =>
        (i.toLong, s"unique document number $i with words w$i x$i y$i z$i")) ++
      Seq.tabulate(25)(i =>
        (1000L + i, "hot duplicated body shared by many documents")))
      .toDF("doc_id", "text").repartition(8)
    val run = (cap: Int) => Dedup.simhashNearDupPairs(docs, col("doc_id"),
        col("text"), bucketCap = cap)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(run(5) === run(1000000))
  }

  test("AQE splits a skewed sort-merge join at runtime (OptimizeSkewedJoin)") {
    // the built-in complement to manual salting: one hot key dominates
    // the left side; with aggressive thresholds AQE must mark the join
    // skewed and split the oversized partition
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val left = (0 until 200000).map(i =>
        (if (i % 10 == 0) 7L else (i % 1000).toLong, s"payload-$i-left"))
        .toDF("k", "lv")
      val right = (0 until 1000).map(i => (i.toLong, s"r-$i")).toDF("k", "rv")
      val joined = left.join(right, "k")
      // execute THIS instance so AQE finalizes it (count() derives a
      // new plan — same caveat as PlanAuditSpec's codegen test)
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n${plan.take(1200)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
