package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the scheduled-ingest demo: ticks of batch files flow
  * through parse → enrich → Kafka-shaped records → directory sink.
  */
class IngestDemoSpec extends AnyFunSuite {
  test("scheduled ingest lands every replayed bar as a sink record") {
    // 2 ticks × 5 symbols × 22 bars
    val n = graft.tools.IngestDemo.run(TestSpark.spark,
      ticks = 2, cadenceMs = 300L)
    assert(n === 220L)
  }
}
