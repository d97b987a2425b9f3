package graft.tools

import graft._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val d = "/root/testdata/sf0.01"
    val plan1 = SparkEntry.queries("q_join_bcast")(spark, d).queryExecution.executedPlan.toString
    println("q_join_bcast broadcast: " + plan1.contains("BroadcastHashJoin"))
    val plan2 = SparkEntry.queries("q_filter_eq")(spark, d).queryExecution.executedPlan.toString
    println("q_filter_eq pushed: " + plan2.linesIterator.filter(_.contains("PushedFilters")).take(1).mkString.trim.take(200))
    val plan3 = SparkEntry.queries("q_limit_sort")(spark, d).queryExecution.executedPlan.toString
    println("q_limit_sort TakeOrdered: " + plan3.contains("TakeOrderedAndProject"))
    spark.stop()
  }
}
