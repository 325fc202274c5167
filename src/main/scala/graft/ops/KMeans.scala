package graft.ops

import org.apache.spark.sql.DataFrame
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
      // assign: nearest centroid by squared distance = |v|² − 2v·c + |c|².
      // argmin via min(struct(d2, cid)) — a hash aggregate with map-side
      // partial reduction (each partition reduces its n_part·k rows to
      // n_part before the shuffle), not a window sort over all n·k rows.
      val assigned = vecs.crossJoin(broadcast(cDf))
        .withColumn("d2",
          DotFold(col("v"), col("v")) - lit(2.0) * DotFold(col("v"), col("cv"))
            + DotFold(col("cv"), col("cv")))
        .groupBy(col("id"))
        .agg(min(struct(col("d2"), col("cid"))).as("m"), first(col("v")).as("v"))
        .select(col("id"), col("m.cid").as("cid"), col("m.d2").as("d2"), col("v"))
        // persisted: the cost action and the centroid update both read it
        // (invariant 6 — without this the crossJoin+argmin runs twice per
        // iteration)
        .persist()
      costs += assigned.agg(sum(col("d2"))).as[Double].collect().head
      // update: per-cluster centroid via the typed Aggregator; clusters
      // that attracted no vectors keep their previous centroid (they
      // produce no aggregation row and would otherwise silently shrink k)
      val updated = assigned.select(col("cid"), col("v")).as[(Int, Seq[Double])]
        .groupByKey(_._1).mapValues(_._2).agg(new Aggregators.Centroid(dim).toColumn)
        .collect().toMap
      assigned.unpersist()
      centroids = centroids.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    (costs.toSeq, centroids.toSeq.toDF("cid", "cv"))
  }
}
