package graft

import graft.streaming.StreamingPipeline

/** Forked-JVM child for ShutdownHookSpec: starts a rate-source
  * streaming query, installs [[StreamingPipeline.stopOnShutdown]], and
  * reports — from a SECOND, independent shutdown hook — whether the
  * query was actually stopped during JVM termination. Hooks run
  * concurrently, so the witness hook polls the query state instead of
  * assuming ordering.
  */
object ShutdownHookChild {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("2")
    val query = spark.readStream.format("rate")
      .option("rowsPerSecond", "5").load()
      .writeStream.format("noop")
      .option("checkpointLocation", args(0))
      .start()

    StreamingPipeline.stopOnShutdown(query) // the hook under test

    sys.addShutdownHook { // witness: did the hook under test stop it?
      val deadline = System.currentTimeMillis() + 20000
      while (query.isActive && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      // stdout may already be torn down mid-shutdown; stderr survives
      System.err.println(
        if (query.isActive) "GRAFT-STILL-ACTIVE" else "GRAFT-CLEAN-STOP")
      System.err.flush()
    }

    println("GRAFT-CHILD-STARTED")
    Console.flush()
    query.awaitTermination()
  }
}
