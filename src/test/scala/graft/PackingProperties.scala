package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Packing

/** Integer edge cases of the sliding-window chunker: full coverage,
  * stride-aligned starts, clamped final window, exact chunk count —
  * over random (n, window, stride) well beyond the goldens.
  */
object PackingProperties extends Properties("Packing") {
  private lazy val spark = TestSpark.spark

  private val caseGen: Gen[(Long, Int, Int)] = for {
    n <- Gen.choose(1L, 500L)
    w <- Gen.choose(1, 64)
    s <- Gen.choose(1, w)
  } yield (n, w, s)

  property("slidingChunks: coverage, alignment, clamp, count") =
    Prop.forAll(Gen.listOfN(5, caseGen)) { cases =>
      import spark.implicits._
      Prop.all(cases.zipWithIndex.map { case ((n, w, s), id) =>
        val out = Packing.slidingChunks(
            Seq((id.toLong, n)).toDF("id", "nt"), col("id"), col("nt"), w, s)
          .select("chunk_idx", "tok_start", "tok_end")
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
        val k = if (n <= w) 1L else (n - w + s - 1) / s + 1L
        val aligned = out.forall { case (i, st, _) => st == i * s }
        val clamped = out.forall { case (_, st, en) =>
          en == math.min(n, st + w) && st < n
        }
        val covered = out.flatMap { case (_, st, en) => st until en }.toSet
        Prop(out.size.toLong == k &&
          out.map(_._1) == (0L until k) &&
          aligned && clamped &&
          covered == (0L until n).toSet) :| s"n=$n w=$w s=$s out=$out"
      }: _*)
    }
}
