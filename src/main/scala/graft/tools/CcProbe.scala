package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: rounds + wall time of the q56 connected-components loop
  * on a real corpus. Usage: runMain graft.tools.CcProbe <sfDir>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = graft.queries.tracked(
      graft.SparkEntry.queries("q51_simhash64")(spark, dir).select(col("da"), col("db")))
    println(s"pairs=${pairs.count()}")
    val verts = pairs.select(col("da").as("id"))
      .union(pairs.select(col("db").as("id"))).distinct()
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
    val t0 = System.nanoTime()
    val (lbl, rounds) = graft.ops.Dedup.connectedComponentsWithRounds(
      verts, edges, track = graft.queries.tracked,
      onRound = (r, changed) => println(s"round=$r frontier=$changed"))
    val nc = lbl.select(countDistinct(col("lbl"))).first().getLong(0)
    println(f"rounds=$rounds clusters=$nc ccSecs=${(System.nanoTime() - t0) / 1e9}%.2f")
    graft.queries.releasePersisted()
    spark.stop()
  }
}
