package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.KMeans
import graft.streaming.RouteCommandSink

/** IVF trainer behavior + the sink-throughput claim from BASELINE.md
  * (reference ceiling: ~10 routes/s from the 0.1 s global spacing; the
  * engine keeps per-device serialization but parallelizes across
  * devices).
  */
class KMeansThroughputSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("k-means cost is non-increasing over iterations on real embeddings") {
    val rows = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val (costs, centroids) = KMeans.train(rows, k = 8, iters = 3, dim = 64)
    assert(costs.length === 3)
    assert(costs.zip(costs.tail).forall { case (a, b) => b <= a + 1e-9 }, costs)
    assert(centroids.count() === 8)
    // centroids are real vectors, not NaN-poisoned
    val c = centroids.as[(Int, Seq[Double])].collect()
    assert(c.forall(_._2.forall(v => !v.isNaN && !v.isInfinite)))
  }

  test("route sink throughput beats the reference's 10 routes/s ceiling by orders of magnitude") {
    val n = 2000
    val routes = spark.range(n)
      .select(concat(lit("dev"), pmod(col("id"), lit(8))).as("device"),
        pmod(col("id"), lit(256)).cast("int").as("output"),
        pmod(col("id") * 7, lit(256)).cast("int").as("input"))
    val t0 = System.nanoTime()
    val res = RouteCommandSink.applyRoutes(routes, _ => _ => None).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(res.map(_.getLong(2)).sum === n) // all succeeded
    val throughput = n / secs
    info(f"sink throughput: $throughput%.0f routes/s across 8 devices (reference ceiling ~10/s)")
    assert(throughput > 100, s"$throughput routes/s")
  }
}
