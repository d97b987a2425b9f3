package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Indicators

/** ScalaCheck properties: the indicator pipeline is deterministic under
  * repartitioning (the property the reference's batch-scoped pandas
  * lacks — quirk Q7), and invariants hold for arbitrary price series.
  */
object PipelineProperties extends Properties("IndicatorPipeline") {
  private lazy val spark = TestSpark.spark

  private val seriesGen: Gen[List[Double]] =
    Gen.choose(25, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1.0, 1000.0).map(x => math.rint(x * 100) / 100)))

  private def enriched(xs: List[Double], parts: Int) = {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => ("A", i.toLong, x) }
      .toDF("symbol", "ts", "close").repartition(parts)
    Indicators.enrich(df, col("symbol"), Seq(col("ts")), col("close"))
      .orderBy("ts")
      .select("ts", "ma5", "ma20", "rsi", "macd_line", "macd_signal",
        "macd_histogram", "suggestion")
      .collect().map(_.toSeq).toSeq
  }

  property("repartition-invariant (Q7 fixed)") = Prop.forAll(seriesGen) { xs =>
    enriched(xs, 1) == enriched(xs, 7)
  }

  property("rsi in [0,100] or null; suggestion in the 5-label set") =
    Prop.forAll(seriesGen) { xs =>
      val rows = enriched(xs, 3)
      val labels = Set("BUY", "HOLD/SELL", "WATCH/BUY", "SELL/AVOID", "HOLD")
      rows.forall { r =>
        val rsiOk = r(3) == null ||
          (r(3).asInstanceOf[Double] >= 0.0 && r(3).asInstanceOf[Double] <= 100.0)
        val histOk = r(6).asInstanceOf[Double] ==
          r(4).asInstanceOf[Double] - r(5).asInstanceOf[Double]
        rsiOk && histOk && labels(r(7).asInstanceOf[String])
      }
    }

  property("ma5 null iff row index < 4 within the symbol") =
    Prop.forAll(seriesGen) { xs =>
      enriched(xs, 2).zipWithIndex.forall { case (r, i) =>
        (r(1) == null) == (i < 4)
      }
    }
}
