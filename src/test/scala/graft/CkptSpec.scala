package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The resilience switch must change ONLY the storage level of the
  * checkpointed blocks, never the data.
  */
class CkptSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("default path truncates lineage and preserves data") {
    val df = (1 to 100).toDF("n").withColumn("sq", col("n") * col("n"))
    val ck = Ckpt.local(df)
    assert(ck.as[(Int, Int)].collect().toSet ==
      (1 to 100).map(n => (n, n * n)).toSet)
    // lineage is truncated: the checkpointed plan is a scan of an RDD,
    // not the original project-over-range
    assert(ck.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")))
  }

  test("replicated conf stores MEMORY_AND_DISK_2 blocks") {
    val sc = spark.sparkContext
    spark.conf.set(Ckpt.ReplicatedConf, "true")
    try {
      val before = sc.getPersistentRDDs.keySet
      val ck = Ckpt.local((1 to 50).toDF("n"))
      assert(ck.count() == 50)
      val added = sc.getPersistentRDDs.collect {
        case (id, rdd) if !before.contains(id) => rdd
      }
      // the checkpoint RDD must carry replication 2 (on a one-executor box
      // the second replica has nowhere to land, but the LEVEL is what ships
      // to a real cluster)
      assert(added.exists(_.getStorageLevel.replication == 2),
        s"no replicated RDD among ${added.map(_.getStorageLevel).toList}")
    } finally spark.conf.set(Ckpt.ReplicatedConf, "false")
  }
}
