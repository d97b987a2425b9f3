package graft.tools
import graft._
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      val t0 = System.nanoTime()
      // full materialization through the noop sink, same as graft.Bench
      // (count() lets Catalyst prune unreferenced projections/windows)
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"BENCHONE $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
