package graft.tools
import graft._
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val p = SparkEntry.queries(args(0))(spark, args(1))
      .queryExecution.executedPlan.toString
    // full dump on demand (kernel-duplication audits need the whole
    // Project lines, which carry constant weight vectors)
    println(if (sys.env.contains("SPARK_GRAFT_PLAN_FULL")) p else p.take(4000))
    spark.stop()
  }
}
