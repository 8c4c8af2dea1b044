package graft
import org.apache.spark.sql.SparkSession
object GateDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("gatedump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("kg_content_gate")(spark, "/root/testdata/sf0.01")
    df.show(50, false)
    spark.stop()
  }
}
