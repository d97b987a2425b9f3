package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** Cross-SESSION persistence of the ANN index (round-15 standing
  * item, cleared same round): forks [[AnnCatalogChild]], which builds
  * the LSH index under one SparkSession, stops it, and appends +
  * probes under a brand-new session against the same embedded-Derby
  * catalog — proving `lshAppendIndex`'s `saveAsTable(append)` reads
  * the bucket spec from durable catalog metadata, not from the
  * building session's memory, and the appended index still equals a
  * full rebuild.
  */
class AnnCatalogSpec extends AnyFunSuite {

  test("LSH index built in one session appends + probes correctly in " +
      "a fresh session against the same catalog (forked JVM)") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"),
      "java").getAbsolutePath
    val base = Files.createTempDirectory("graft-ann-catalog-")
    val outFile = Files.createTempFile("graft-ann-out-", ".log").toFile
    // inherit this JVM's --add-opens/--add-exports set: Hive + Hadoop
    // on JDK 17 reflect into java.base (the same inheritance recipe
    // Bench's re-measure children use)
    val raw = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
      .toArray(Array.empty[String])
    val inherited = scala.collection.mutable.ArrayBuffer.empty[String]
    var ai = 0
    while (ai < raw.length) {
      val a = raw(ai)
      if ((a == "--add-opens" || a == "--add-exports") &&
          ai + 1 < raw.length) {
        inherited += a += raw(ai + 1); ai += 2
      } else if (a.startsWith("--add-opens") ||
          a.startsWith("--add-exports")) {
        inherited += a; ai += 1
      } else ai += 1
    }
    val pb = new ProcessBuilder(
      (Seq(javaBin, "-Xmx2g") ++ inherited ++
        Seq("-cp", sys.props("java.class.path"),
          "graft.AnnCatalogChild", base.toString)): _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(outFile)
    val proc = pb.start()
    try {
      assert(proc.waitFor(300, TimeUnit.SECONDS), "child timed out")
      import scala.jdk.CollectionConverters._
      val out = Files.readAllLines(outFile.toPath).asScala.toSeq
      // substring match: the merged stdout/stderr stream can
      // interleave log writes onto the marker's line
      assert(out.exists(_.contains("GRAFT-ANN-OK")),
        s"catalog round-trip failed; child output tail:\n${
          out.takeRight(40).mkString("\n")}")
      assert(!out.exists(_.contains("GRAFT-ANN-MISMATCH")))
    } finally {
      proc.destroyForcibly()
      ()
    }
  }
}
