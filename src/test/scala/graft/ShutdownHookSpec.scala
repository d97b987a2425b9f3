package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** Exercises the §2 T7 graceful-shutdown row for real: forks a JVM
  * running a live streaming query with
  * [[graft.streaming.StreamingPipeline.stopOnShutdown]] installed,
  * SIGTERMs it, and asserts the hook stopped the query during JVM
  * termination (witnessed by an independent hook in the child polling
  * the query state — see [[ShutdownHookChild]]).
  *
  * This harness caught a real defect: a `sys.addShutdownHook`-based
  * stop races Spark's own context-stop hook and dies with "Cannot
  * call methods on a stopped SparkContext" — the fix registers at a
  * before-context-stop priority in Spark's ShutdownHookManager.
  */
class ShutdownHookSpec extends AnyFunSuite {

  test("SIGTERM triggers the shutdown hook which stops the live query") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val ckpt = Files.createTempDirectory("graft-shutdown-ckpt-")
    val outFile = Files.createTempFile("graft-shutdown-out-", ".log").toFile
    val pb = new ProcessBuilder(
      javaBin, "-Xmx1g",
      "-cp", sys.props("java.class.path"),
      "graft.ShutdownHookChild", ckpt.toString)
    pb.redirectErrorStream(true)
    pb.redirectOutput(outFile)
    val proc = pb.start()

    def output(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(Paths.get(outFile.getPath)).asScala.toSeq
    }

    try {
      // wait for the child's query to be live (cold JVM + Spark startup)
      val deadline = System.currentTimeMillis() + 120000
      while (!output().contains("GRAFT-CHILD-STARTED") &&
          proc.isAlive && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(output().contains("GRAFT-CHILD-STARTED"),
        s"child never started; output so far:\n${output().mkString("\n")}")

      proc.destroy() // SIGTERM → JVM shutdown sequence
      assert(proc.waitFor(60, TimeUnit.SECONDS), "child did not exit")

      val out = output()
      assert(out.contains("GRAFT-CLEAN-STOP"),
        s"query was not stopped by the shutdown hook; child output:\n${out.mkString("\n")}")
      assert(!out.contains("GRAFT-STILL-ACTIVE"))
    } finally {
      proc.destroyForcibly()
      ()
    }
  }
}
