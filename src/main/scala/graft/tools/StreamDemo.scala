package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions
import graft.streaming.{Parse, StreamingPipeline}

/** Demo driver: the full streaming pipeline over an in-memory source —
  * what a user without a Kafka broker runs to see the engine work.
  * Prints the Kafka-shaped (key, value) records per micro-batch.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def doc(symbol: String, bars: Seq[(String, Double)]): String = {
      val hist = bars.map { case (t, c) =>
        s"""{"time":"$t","open":$c,"high":$c,"low":$c,"close":$c,"volume":10.0}"""
      }.mkString("[", ",", "]")
      s"""{"symbol":"$symbol","current_price":${bars.last._2},"historical_data":$hist}"""
    }

    val stream = MemoryStream[String]
    val checkpoint = Files.createTempDirectory("graft-demo-ckpt").toString
    val query = StreamingPipeline.start(
        Parse.parse(stream.toDF().select(col("value"))), checkpoint,
        trigger = Trigger.ProcessingTime(0L), queryName = "graft-demo") {
      (records: DataFrame, batchId: Long) =>
        println(s"=== batch $batchId: ${records.count()} records ===")
        records.show(3, truncate = 120)
    }
    StreamingPipeline.stopOnShutdown(query)

    val days = (1 to 22).map(i => f"2024-01-$i%02d")
    stream.addData(doc("VNM", days.zipWithIndex.map { case (d, i) => (d, 80.0 + i) }))
    query.processAllAvailable()
    // second trigger: malformed + valid mixed
    stream.addData("not json", doc("FPT", days.map((_, 55.0))))
    query.processAllAvailable()
    query.stop()
    spark.stop()
  }
}
