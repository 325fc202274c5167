package graft
import org.apache.spark.sql.functions._
object TreeDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(3).select(col("id").cast("string").as("s"))
      .select(graft.ops.TextOps.charHashFold(col("s"), 65536L).as("h"))
    println(df.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
