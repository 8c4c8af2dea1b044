package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.operators.Similarity

/** Microbench: UDF vs native expression vs Column-expr cosine over N pairs
  * of dim-D float arrays. Usage: runMain graft.plans.CosineBench [n] [dim]
  */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(62000)
    val dim = args.lift(1).map(_.toInt).getOrElse(1536)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    import spark.implicits._

    val pairs = spark.range(n).mapPartitions { it =>
      it.map { i =>
        val rng = new scala.util.Random(i)
        (i, Array.fill(dim)(rng.nextFloat()), Array.fill(dim)(rng.nextFloat()))
      }
    }.toDF("id", "a", "b").repartition(32).localCheckpoint(true)
    println(s"pairs: ${pairs.count()} dim=$dim partitions=${pairs.rdd.getNumPartitions}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$r)")
    }
    time("warmup") { pairs.select($"id").count() }
    time("udf") {
      pairs.select(Similarity.cosineUdf($"a", $"b").as("c")).where($"c" > 2).count()
    }
    time("native-expr") {
      pairs.select(expr("graft_cosine(a, b)").as("c")).where($"c" > 2).count()
    }
    time("column-expr") {
      pairs.select(Similarity.cosineCol($"a", $"b").as("c")).where($"c" > 2).count()
    }
    time("udf-again") {
      pairs.select(Similarity.cosineUdf($"a", $"b").as("c")).where($"c" > 2).count()
    }
    spark.stop()
  }
}
