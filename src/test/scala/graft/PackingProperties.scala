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

  property("withGlobalPrefixMax == sequential exclusive prefix max " +
    "under any partitioning") =
    Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(-1000L, 1000L),
        Gen.choose(-50L, 50L))).map(_.distinctBy(_._1)),
      Gen.choose(1, 7)) { (rows, parts) =>
      import spark.implicits._
      if (rows.isEmpty) Prop.passed else {
        val df = rows.toDF("ord", "v").repartition(parts)
        val out = Packing
          .withGlobalPrefixMax(df, col("ord"), col("v"), "pm")
          .select("ord", "v", "pm")
          .as[(Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
        val sorted = rows.sortBy(_._1)
        val ref = sorted.indices.map { i =>
          val before = sorted.take(i).map(_._2)
          (sorted(i)._1, sorted(i)._2,
            if (before.isEmpty) None else Some(before.max))
        }
        Prop(out == ref) :| s"parts=$parts out=$out ref=$ref"
      }
    }

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
