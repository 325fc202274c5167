package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotFold

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * behind the IVF index (q42 uses hash-picked seeds; this refines them).
  * Each iteration is one broadcast-assign pass (k centroids to every
  * executor) + one shuffle-free-ish partial aggregation via
  * [[Aggregators.Centroid]] — the canonical 100 TB shape: the only
  * shuffle per iteration carries k partial sums per partition.
  */
object KMeans {

  /** rows: (id long, vec array<float|double>). Returns (iteration cost,
    * centroids) after `iters` Lloyd iterations from the first k vectors
    * by id (deterministic seeding).
    */
  def train(rows: DataFrame, k: Int, iters: Int, dim: Int): (Seq[Double], DataFrame) = {
    val spark = rows.sparkSession
    import spark.implicits._
    val vecs = rows.select(col("id"),
      transform(col("vec"), x => x.cast("double")).as("v")).cache()
    var centroids = vecs.orderBy("id").limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
    val costs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 until iters) {
      val cDf = centroids.toSeq.toDF("cid", "cv")
      // assign: nearest centroid by squared distance = |v|² − 2v·c + |c|²
      val w = Window.partitionBy(col("id")).orderBy(col("d2"), col("cid"))
      val assigned = vecs.crossJoin(broadcast(cDf))
        .withColumn("d2",
          DotFold(col("v"), col("v")) - lit(2.0) * DotFold(col("v"), col("cv"))
            + DotFold(col("cv"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      costs += assigned.agg(sum(col("d2"))).as[Double].collect().head
      // update: per-cluster centroid via the typed Aggregator; clusters
      // that attracted no vectors keep their previous centroid (they
      // produce no aggregation row and would otherwise silently shrink k)
      val updated = assigned.select(col("cid"), col("v")).as[(Int, Seq[Double])]
        .groupByKey(_._1).mapValues(_._2).agg(new Aggregators.Centroid(dim).toColumn)
        .collect().toMap
      centroids = centroids.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    (costs.toSeq, centroids.toSeq.toDF("cid", "cv"))
  }
}
