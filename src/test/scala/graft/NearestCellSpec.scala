package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The NearestCell native argmin must be bit-for-bit the relational
  * `crossJoin(centroids) → min(struct(d2, cid))` it replaced — same
  * DotFold fold order inside d2, same (d2, cid) tie direction — on
  * real embeddings (codegen path) AND on adversarial fixtures: exact
  * ties from duplicated centroids, empty centroid array (null), and a
  * deliberately unsorted... rather, the sorted-input contract the
  * builder guarantees via array_sort.
  */
class NearestCellSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def relationalArgmin(emb: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame) = {
    import graft.functions.DotFold
    emb.crossJoin(broadcast(cents))
      .withColumn("d2", DotFold(col("v"), col("v"))
        - lit(2.0) * DotFold(col("v"), col("cv")) + DotFold(col("cv"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
  }

  test("NearestCell == relational min-struct argmin on the real corpus") {
    val emb = graft.ops.Ivf.prep(
      spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"))
    // a deterministic 23-centroid table from the corpus itself
    val cents = emb.filter(col("vec_id") < 23)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    val centsRow = cents
      .agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cents"))
    val native = emb.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(centsRow))
      .select(col("vec_id"),
        graft.functions.NearestCell(col("v"), col("cents")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rel = relationalArgmin(emb.select(col("vec_id"), col("v")), cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native.size === 500)
    assert(native === rel)
  }

  test("exact ties break to the smaller cid; empty centroids yield null") {
    // duplicated centroid vector under two cids: d2 bit-identical, so
    // the winner must be the smaller cid — for every input row
    val c = Seq((7, Seq(1.0, 2.0)), (3, Seq(1.0, 2.0)), (9, Seq(100.0, 100.0)))
      .toDF("cid", "cv")
      .agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cents"))
    val rows = Seq((1L, Seq(1.1, 2.2)), (2L, Seq(0.0, 0.0)), (3L, Seq(1.0, 2.0)))
      .toDF("vec_id", "v")
    val out = rows.crossJoin(broadcast(c))
      .select(col("vec_id"),
        graft.functions.NearestCell(col("v"), col("cents")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 3, 2L -> 3, 3L -> 3))
    val empty = rows.limit(1)
      .select(graft.functions.NearestCell(col("v"),
        expr("CAST(array() AS array<struct<cid:int, cv:array<double>>>)")).as("cell"))
      .collect()(0)
    assert(empty.isNullAt(0))
  }
}
