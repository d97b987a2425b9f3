package graft.tools
import graft._
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val p = SparkEntry.queries(args(0))(spark, args(1))
      .queryExecution.executedPlan.toString
    println(p.take(4000))
    spark.stop()
  }
}
