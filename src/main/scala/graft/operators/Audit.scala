package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-scan pipeline observability via `Dataset.observe`
  * (Spark's `Observation`/`CollectMetrics` API): named aggregates that
  * evaluate inside the SAME job that materializes the stage — an
  * accumulator fed row-by-row as data streams past, no second action,
  * no extra scan, no shuffle.
  *
  * Why this matters at 100 TB: the obvious way to report "rows kept
  * after dedup / after blocklist / after quality gating" is a
  * `.count()` per stage — each one a FULL re-execution of the plan
  * up to that stage, so a 5-stage pipeline pays ~15 stage-scans
  * instead of 5. The reference logs per-batch row counts exactly this
  * way on pandas frames (free there, catastrophic on a cluster).
  * `observe` rides the one real job; the counters are ready as soon as
  * the action completes.
  *
  * Contract notes: metrics must be aggregates (Spark enforces);
  * results become available only AFTER an action runs over the
  * observed plan, and reflect that action's one execution. Under AQE
  * retries the last complete execution wins — counters are exact for
  * the rows the action actually processed.
  */
object Audit {

  /** Attach named metric aggregates to a stage. Returns the SAME
    * logical stage (plus the metric collection node, a streaming
    * pass-through) and the handle to read after an action.
    */
  def observe(df: DataFrame, name: String,
      metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric aggregate required")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Instrument a multi-stage pipeline as a retention funnel: applies
    * each named stage in order and observes `rows` (plus any
    * caller-supplied extras) after it. One action on the returned
    * frame materializes the WHOLE funnel — every stage's counters fill
    * from that single execution.
    *
    * @return (instrumented frame, read-back thunk). Call the thunk
    *         after an action; it yields (stage name, metric map) in
    *         stage order.
    */
  def funnel(input: DataFrame,
      stages: Seq[(String, DataFrame => DataFrame)],
      extras: Seq[Column] = Nil)
      : (DataFrame, () => Seq[(String, Map[String, Any])]) = {
    val observed = scala.collection.mutable.ArrayBuffer.empty[(String, Observation)]
    val out = stages.foldLeft(input) { case (df, (name, stage)) =>
      val (o, obs) = observe(stage(df), name,
        count(lit(1)).as("rows") +: extras)
      observed += ((name, obs))
      o
    }
    (out, () => observed.toSeq.map { case (n, o) => (n, o.get) })
  }
}
