package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.PolyHash
import graft.ops.TextOps

/** The native PolyHash expression must agree bit-for-bit with the pure
  * built-in HOF fold it replaces, in both evaluation modes (codegen'd
  * top-level projection and interpreted lambda body).
  */
class PolyHashSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val asciiString =
    Gen.listOf(Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString)

  test("PolyHash == built-in fold on random ASCII strings (both moduli)") {
    val batch = (1 to 300).map(_ => asciiString.sample.getOrElse("x"))
    for (m <- Seq(TextOps.P, TextOps.P16)) {
      val rows = batch.toDF("s")
        .select(PolyHash(col("s"), m).as("native"), TextOps.charHashFold(col("s"), m).as("fold"))
        .as[(Long, Long)].collect()
      assert(rows.forall { case (n, f) => n == f })
    }
  }

  test("PolyHash inside a higher-order lambda matches per-element application") {
    val df = Seq(Seq("spark", "graft", "")).toDF("a")
    val viaLambda = df.select(transform(col("a"), x => PolyHash(x, TextOps.P)))
      .as[Seq[Long]].collect().head
    val direct = Seq("spark", "graft", "").map { s =>
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % TextOps.P)
    }
    assert(viaLambda === direct)
    assert(viaLambda.last === 0L) // empty string hashes to 0
  }

  test("PolyHashFusion rule rewrites the built-in fold into the native expression") {
    import graft.functions.PolyHashFusion
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PolyHashFusion
    try {
      val df = spark.range(50).select(col("id").cast("string").as("s"))
        .select(col("s"), TextOps.charHashFold(col("s"), 65536L).as("h"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_poly_hash"),
        df.queryExecution.optimizedPlan.toString)
      val native = spark.range(50).select(col("id").cast("string").as("s"))
        .select(PolyHash(col("s"), 65536L)).as[Long].collect()
      assert(df.select(col("h")).as[Long].collect() === native)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PolyHashFusion)
    }
  }

  test("PolyHashFusion leaves non-matching folds alone") {
    import graft.functions.PolyHashFusion
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PolyHashFusion
    try {
      // different multiplier (37) — must NOT fuse, and must stay correct
      val df = Seq("spark").toDF("s").select(
        aggregate(
          transform(sequence(lit(1), length(col("s"))), i => ascii(col("s").substr(i, lit(1))).cast("long")),
          lit(0L), (h, x) => (h * 37 + x) % 65536).as("h"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_poly_hash"))
      val expect = "spark".getBytes.foldLeft(0L)((h, b) => (h * 37 + b) % 65536)
      assert(df.as[Long].collect().head === expect)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PolyHashFusion)
    }
  }

  test("ShingleHash3 == HOF pipeline (shingleHashes3 ∘ charHash) on random word strings") {
    import graft.functions.ShingleHash3
    val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val sentence = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val batch = (1 to 200).map(_ => sentence.sample.getOrElse("a b c")) :+ "" :+ "one two"
    val df = batch.toDF("text")
      .select(
        ShingleHash3(col("text"), TextOps.P).as("native"),
        TextOps.bindOnce(TextOps.tokens(col("text"))) { toks =>
          TextOps.bindOnce(transform(toks, t => TextOps.charHash(t, TextOps.P))) { th =>
            TextOps.shingleHashes3(toks, th)
          }
        }.as("hof"))
    val rows = df.as[(Seq[Long], Seq[Long])].collect()
    assert(rows.forall { case (n, h) => n == h })
  }

  test("dual-residue ShingleHash packs the two single-residue arrays exactly") {
    import graft.functions.ShingleHash
    val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val sentence = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val batch = (1 to 200).map(_ => sentence.sample.getOrElse("a b c")) :+ "" :+ "one two three four five"
    val df = batch.toDF("text")
      .select(
        ShingleHash(col("text"), TextOps.P, 5, TextOps.P2).as("dual"),
        zip_with(
          ShingleHash(col("text"), TextOps.P, 5),
          ShingleHash(col("text"), TextOps.P2, 5),
          (a, b) => a * lit(2147483648L) + b).as("packed"))
    val rows = df.as[(Seq[Long], Seq[Long])].collect()
    assert(rows.forall { case (n, h) => n == h })
    // 62-bit keys stay nonnegative (h1 < P < 2^31.5, h2 < P2 < 2^31)
    assert(rows.forall(_._1.forall(_ >= 0L)))
  }

  test("SimHash16 == HOF simhash fold on random word strings") {
    import graft.functions.SimHash16
    val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val sentence = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val batch = (1 to 200).map(_ => sentence.sample.getOrElse("a b c")) :+ "solo"
    val rows = batch.toDF("text")
      .select(SimHash16(col("text")).as("native"), TextOps.simhash16(col("text")).as("hof"))
      .as[(Long, Long)].collect()
    assert(rows.forall { case (n, h) => n == h })
  }

  test("StatusDecode == built-in statusRoutes on random frames") {
    import graft.functions.StatusDecode
    import graft.ops.Protocol
    val part = Gen.oneOf(
      Gen.choose(0, 999999999).map(_.toString), // digits (Int-safe)
      Gen.oneOf("x", "", "1a", "a1", " 5", "-3"),
      // overflow edges: > Int.MaxValue, 19-digit with leading zeros,
      // exactly Int.MaxValue / one past it — both twins must drop the
      // same parts without shifting positions
      Gen.oneOf("3000000000", "0000000000000000001", "2147483647",
        "2147483648", "99999999999999999999"))
    val frame = for {
      parts <- Gen.listOf(part)
      wrap <- Gen.oneOf(0, 1, 2)
    } yield wrap match {
      case 0 => s"{BASTATUS,${parts.mkString(",")}}"
      case 1 => s"noise{BASTATUS,${parts.mkString(",")}}tail"
      case 2 => s"{BASTATUS,${parts.mkString(",")}" // unterminated
    }
    val batch = (1 to 300).map(_ => frame.sample.getOrElse("{BASTATUS,1}"))
    val rows = batch.toDF("raw")
      .select(StatusDecode(col("raw")).as("native"), Protocol.statusRoutes(col("raw")).as("hof"))
      .as[(Seq[(Int, Int)], Seq[(Int, Int)])].collect()
    assert(rows.forall { case (n, h) => n == h })
  }

  test("PolyHash propagates null") {
    val got = Seq(Option.empty[String]).toDF("s").select(PolyHash(col("s"), TextOps.P))
      .collect().head
    assert(got.isNullAt(0))
  }
}
