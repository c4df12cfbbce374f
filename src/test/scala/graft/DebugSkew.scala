package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Sample user program: skew-safe aggregates over lineitem. */
object DebugSkew {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    Skew.countDistinctTwoPhase(li, col("l_returnflag"), col("l_partkey"))
      .orderBy("__key").collect()
      .foreach(r => println(s"DBG distinct $r"))
    val s = Skew.saltedCollectSet(li.where(col("l_suppkey") === 1),
      col("l_suppkey"), col("l_returnflag"))
      .collect()(0)
    println(s"DBG collectset ${s.getLong(0)} -> ${s.getSeq[String](1)}")
    spark.stop()
  }
}
