package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x made `Column` representation-agnostic (`ColumnNode`-backed);
  * the `Expression` <-> `Column` converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils` and are `private[sql]`.
  * This object sits in a subpackage of `org.apache.spark.sql` purely to
  * re-export them for graft's custom Catalyst expressions (e.g. the EMA
  * window function in `graft.functions`).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Persist `df`'s computed rows at the RDD layer, bypassing the
    * `CacheManager`.
    *
    * `Dataset.persist` registers the plan in the session-global
    * CacheManager: a second invocation building the same plan logs
    * "Asked to cache already cached data" and silently REUSES the first
    * invocation's blocks (so repeated benchmark reps measure cache
    * reads), and entries accumulate until someone calls `unpersist` —
    * awkward for an operator that returns a lazy result (round-4
    * verdict finding #3). Persisting the materialized `InternalRow` RDD
    * instead gives each invocation private blocks that the
    * `ContextCleaner` frees automatically once the returned plan is
    * garbage-collected, keeps the lineage intact (block loss on
    * executor failure recomputes instead of failing the job — the
    * reason this is NOT `localCheckpoint`, which truncates lineage),
    * and stays fully lazy: nothing runs until the returned frame is
    * consumed. The `_.copy()` is load-bearing — `toRdd` re-uses unsafe
    * row buffers, so caching without a copy would alias every row to
    * the last buffer state.
    */
  def persistRows(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
  }

  /** [[persistRows]] + RDD-lineage truncation — the iterative-loop
    * primitive (round-12 verdict #3). persistRows already truncates
    * the LOGICAL plan (the returned frame is a bare `LogicalRDD`), so
    * Catalyst planning stays O(one round) however long a loop runs;
    * what still grows linearly in round count is the RDD DEPENDENCY
    * chain — round r's RDD references round r−1's, so a deep loop
    * (BFS to a large diameter, a k-core peel) accumulates an
    * ever-longer graph the DAGScheduler re-walks per job and the
    * ContextCleaner can never free mid-loop (each round pins its
    * ancestors). `localCheckpoint` severs the parent references once
    * the RDD first materializes, capping the chain at the checkpoint
    * cadence.
    *
    * Trade-off (why this is not the persistRows default): a locally
    * checkpointed RDD's blocks are UNRECOVERABLE — lineage is gone, so
    * an executor loss fails the job instead of recomputing (the
    * documented `RDD.localCheckpoint` contract). That is the right
    * trade INSIDE an iterative loop at a coarse cadence (the loop can
    * simply be re-run; the alternative at a 100-round diameter is a
    * quadratic DAG walk and a driver-memory leak), and on a
    * 1000-executor run with real churn the same call sites are where
    * a RELIABLE `sparkContext.setCheckpointDir` + `rdd.checkpoint()`
    * would go — same cadence, HDFS-backed blocks, loss-tolerant.
    */
  def checkpointRows(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint() // persists MEMORY_AND_DISK internally
    ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
  }

  /** Eagerly free the blocks behind a [[persistRows]] frame.
    *
    * `Dataset.unpersist` consults only the CacheManager, so on a
    * persistRows frame it is a silent NO-OP — the blocks otherwise
    * wait for the ContextCleaner to notice the RDD is unreachable
    * (GC-driven, eventually). Iterative trainers that materialize a
    * relation per round (BPE) want the previous round's blocks gone
    * NOW, not at the next full GC. Matches the `LogicalRDD` the frame
    * wraps; anything else is left alone.
    */
  def unpersistRows(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          // a locally-checkpointed RDD's blocks ARE its data (lineage
          // severed) — unpersisting one would make it unreadable, so
          // checkpointRows frames are left to the ContextCleaner
          if !lr.rdd.isCheckpointed =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Register a shutdown action through Spark's priority-ordered
    * `ShutdownHookManager` (private[spark]).
    *
    * A plain JVM hook (`sys.addShutdownHook`) runs CONCURRENTLY with
    * Spark's context-stop hook, so anything touching the SparkContext
    * races its teardown — measured: `query.stop()` in a JVM hook dies
    * with "Cannot call methods on a stopped SparkContext" under real
    * SIGTERM (ShutdownHookSpec). Priorities above
    * `SPARK_CONTEXT_SHUTDOWN_PRIORITY` (50) run strictly BEFORE the
    * context stops.
    */
  def addShutdownHook(priority: Int)(body: () => Unit): AnyRef =
    org.apache.spark.util.ShutdownHookManager.addShutdownHook(priority)(body)

  /** Runs before Spark stops the context (50) — safe for query.stop(). */
  val BeforeContextStopPriority: Int =
    org.apache.spark.util.ShutdownHookManager.SPARK_CONTEXT_SHUTDOWN_PRIORITY + 10

  /** Register a function builder on a LIVE session's function registry
    * (builder-time `SparkSessionExtensions` is the public path; this
    * covers already-constructed sessions).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
