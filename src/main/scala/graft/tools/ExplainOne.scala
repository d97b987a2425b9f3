package graft.tools

import graft._

/** Print the executed plan of one or more SparkEntry queries (operator
  * skeleton only) — the .explain feedback loop the build brief asks
  * for, runnable as `runMain graft.tools.ExplainOne q_name`.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { q =>
      println(s"=== $q ===")
      val df = SparkEntry.queries(q)(spark, d)
      df.collect() // finalize AQE so ReusedExchange/Reused subplans show
      val plan = df.queryExecution.executedPlan
      // operator skeleton: node names + exchange/join/window detail lines
      plan.toString.linesIterator
        .filter(l => l.exists(_.isLetter))
        .foreach { l =>
          val t = l.replaceAll("#\\d+[L]?", "").take(160)
          println(t)
        }
    }
    spark.stop()
  }
}
