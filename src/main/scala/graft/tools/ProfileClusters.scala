package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.{Clusters, Dedup}

/** Phase-level timing for the dedup-clusters pipeline — which of
  * (pair generation | CC fixpoint | final enrichment) carries the
  * cost at a given SF. Debug aid, not part of the query surface.
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.fromEnv()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    (1 to 2).foreach { rep =>
      System.err.println(s"--- rep $rep")
      val pairs = time("nearDupPairs materialize") {
        val p = org.apache.spark.sql.graft.Bridge.persistRows(
          Dedup.nearDupPairs(docs, col("doc_id"), col("text")))
        p.count(); p
      }
      val cc = time("connectedComponents") {
        val c = Clusters.connectedComponents(pairs, col("doc_a"), col("doc_b"))
        c.write.format("noop").mode("overwrite").save(); c
      }
      time("full dedupClusters") {
        Clusters.dedupClusters(docs, col("doc_id"), col("text"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
