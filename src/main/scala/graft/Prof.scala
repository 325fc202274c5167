package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch stage-level profiler (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label%-18s rows=$n%8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val parts = spark.read.parquet(s"$d/events.parquet").select(
      col("user_id"), col("event_id"),
      when(col("event_type") === "error", lit("x"))
        .otherwise(round(col("value")).cast("long").cast("string")).as("part"))
    t("q11.scan")(parts.count())
    val frames = parts.groupBy(col("user_id")).agg(
      concat(lit("{BASTATUS,"),
        graft.functions.StructSortJoin(collect_list(struct(col("event_id"), col("part"))), ","),
        lit("}")).as("frame"))
    t("q11.frames")(frames.count())
    val dec = frames.select(col("user_id"), explode(graft.functions.StatusDecode(col("frame"))).as("r"))
      .select(col("user_id"), col("r.output").as("output"), col("r.input").as("input"))
    t("q11.decoded")(dec.count())
    t("q11.sorted")(dec.orderBy(col("user_id"), col("output")).count())
    t("q11.again")(dec.orderBy(col("user_id"), col("output")).count())
    val P = graft.ops.TextOps.P
    val tok = spark.read.parquet(s"$d/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), array_distinct(graft.functions.ShingleHash(col("text"), P, 2)).as("t"))
      .filter(size(col("t")) > 0)
    t("q32.tok")(tok.count())
    val tokP = tok.persist()
    val ex = tokP.select(col("doc_id"), explode(col("t")).as("w"))
    t("q32.explode")(ex.count())
    val rare = ex.withColumn("df", count(lit(1)).over(Window.partitionBy(col("w"))))
      .filter(col("df") <= 64).select(col("doc_id"), col("w"))
    t("q32.rare")(rare.count())
    val shared = rare.as("a").join(rare.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    t("q32.shared")(shared.count())
    t("q32.full")(SparkEntry.queries("q32_ngram_jaccard")(spark, d).count())
    t("q32.again")(SparkEntry.queries("q32_ngram_jaccard")(spark, d).count())
    spark.stop()
  }
}
