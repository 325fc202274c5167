package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q121 (b-bit minwise hashing): recomputes the
  * full 32-permutation signatures from shingle STRINGS in plain Scala
  * (char-fold hash → permute → min — an independent reimplementation
  * of the ShingleHash algebra) and checks every pair's agreement
  * counts, plus the estimator laws the query's value rests on:
  * c32 ≥ a32 always (full equality implies low-bit equality), the
  * chance-collision gap exists (b-bit without unbiasing would
  * overestimate), and the unbiased b-bit estimate tracks exact
  * Jaccard about as well as the full-width estimate does.
  */
class BbitMinhashSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"
  private val P = 1000000007L

  test("q121 equals the string-level signature model; estimator laws bind") {
    val out = SparkEntry.queries("q121_bbit_minhash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out.nonEmpty, "no candidate pairs at spec scale — vacuous")

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val shingles = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      id -> (if (toks.length < 3) Set.empty[String]
             else toks.sliding(3).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty).toMap
    def charHash(s: String): Long =
      s.map(_.toLong).reduceLeft((a, x) => (a * 31 + x) % P)
    val sigs = shingles.view.mapValues { gs =>
      val hs = gs.map(charHash)
      (0 until 32).map(j => hs.map(h => ((2L * j + 3) * h + (5L * j + 7)) % P).min)
    }.toMap

    for ((da, db, a32, c32, jf, jb, jac) <- out) {
      val (sa, sb) = (sigs(da), sigs(db))
      val expA = (0 until 32).count(j => sa(j) == sb(j)).toLong
      val expC = (0 until 32).count(j => sa(j) % 4 == sb(j) % 4).toLong
      assert(a32 == expA, s"($da,$db): a32 $a32 vs model $expA")
      assert(c32 == expC, s"($da,$db): c32 $c32 vs model $expC")
      assert(c32 >= a32, s"($da,$db): b-bit collisions fewer than full agreements")
      val i = (shingles(da) & shingles(db)).size.toDouble
      val expJ = i / (shingles(da).size + shingles(db).size - i)
      assert(math.abs(jac - expJ) < 1e-12, s"($da,$db): jac drifts from string model")
      assert(math.abs(jf - a32 / 32.0) < 1e-12 )
    }
    // chance collisions exist — the unbiasing has something to remove
    assert(out.exists(r => r._4 > r._3),
      "no pair has b-bit collisions beyond full agreements — unbiasing unexercised")
    // estimator quality: the unbiased b-bit estimate is in the same
    // error regime as the full-width one (paper's point at b=2, k=32)
    val maeB = out.map(r => math.abs(r._6 - r._7)).sum / out.length
    val maeF = out.map(r => math.abs(r._5 - r._7)).sum / out.length
    assert(maeB < 0.25, f"b-bit MAE $maeB%.3f too large — estimator broken")
    assert(maeB < maeF + 0.15, f"b-bit MAE $maeB%.3f far beyond full-width $maeF%.3f")
  }
}
