package graft.tools
import graft._
/** Driver-style smoke: entry() on sf0.001 must return rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_SMOKE rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
