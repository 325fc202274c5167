package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plain-Scala models of the ONLINE ingest contracts, shared by
  * StreamingCorpusSpec (per-component) and RollingPipelineSpec (the
  * composed loop) — one formulation, so the two specs can never drift
  * on what "the greedy admit rule" means.
  */
object OnlineModels {

  def corpus(spark: SparkSession, d: String): Seq[(Long, String, String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
  }

  /** Sequential greedy admit model (no Spark): first-wins bucketed
    * witness dedup in arrival order — the independent formulation of
    * the AdmitProcessor contract.
    */
  def greedyAdmitted(docs: Seq[(Long, String, String, String)]): Set[Long] = {
    val mods = graft.queries.TextQueries.SimhashMods
    def sim16(text: String, mod: Long): Long = {
      // per-bit majority vote of token hashes — the SimHash16 contract
      val votes = Array.fill(16)(0)
      for (w <- text.split(" ", -1)) {
        var h = 0L
        for (c <- w) h = (h * 31 + c.toLong) % mod
        for (b <- 0 until 16) votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
      }
      (0 until 16).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    val sigs = docs.map(r => r._1 -> mods.map(m => sim16(r._4, m))).toMap
    val buckets = scala.collection.mutable.Map.empty[(Int, Long), scala.collection.mutable.ArrayBuffer[Long]]
    val admitted = scala.collection.mutable.Set.empty[Long]
    for ((id, _, _, _) <- docs) {
      val sig = sigs(id)
      val dup = (0 until 4).exists { b =>
        buckets.getOrElse((b, sig(b)), Nil).exists { other =>
          val o = sigs(other)
          (0 until 4).map(i => java.lang.Long.bitCount(sig(i) ^ o(i))).sum <=
            graft.queries.TextQueries.SimhashMaxDist
        }
      }
      for (b <- 0 until 4) {
        val buf = buckets.getOrElseUpdate((b, sig(b)), scala.collection.mutable.ArrayBuffer.empty)
        if (buf.size < graft.queries.TextQueries.BandOccCap) buf += id
      }
      if (!dup) admitted += id
    }
    admitted.toSet
  }

  /** Greedy-admitted ∩ shared quality gate ∩ stratified sample. */
  def expectedIds(spark: SparkSession, d: String, admitted: Set[Long]): Set[Long] = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id").isInCollection(admitted))
      .filter(graft.queries.PipelineQueries.qualityGate(col("text")))
      .filter(graft.queries.TextQueries.sampleHash < graft.queries.TextQueries.sampleRateBp)
      .select(col("doc_id")).as[Long].collect().toSet
  }
}
