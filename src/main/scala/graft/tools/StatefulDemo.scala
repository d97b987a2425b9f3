package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.Sessions
import graft.streaming.{Bar, StatefulIndicators}

/** Demo driver: continuous indicators over an in-memory stream, with
  * bars arriving out-of-order inside a batch.
  */
object StatefulDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv()
    implicit val sqlCtx = spark.sqlContext
    import StatefulIndicators.barEnc
    val stream = MemoryStream[Bar]
    val query = StatefulIndicators.enrich(stream.toDS())
      .writeStream.format("memory").queryName("demo_out")
      .outputMode("append").start()
    // batch 0: bars 0..20 shuffled (out of order within the batch)
    val bars = (0 to 20).map(i => Bar("VNM", i.toLong, 90.0 + i))
    stream.addData(scala.util.Random.shuffle(bars.toList))
    query.processAllAvailable()
    // batch 1: continuation — MA20/RSI must be DEFINED immediately
    stream.addData(Bar("VNM", 21L, 112.0))
    query.processAllAvailable()
    query.stop()
    spark.sql("SELECT symbol, ts, close, ma20, rsi, suggestion FROM demo_out ORDER BY ts DESC LIMIT 3").show()
    spark.stop()
  }
}
