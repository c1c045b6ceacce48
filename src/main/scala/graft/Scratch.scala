package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: does AQE coalesce partitions under localCheckpoint
  * / .rdd materialization? DELETE before committing.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 100).toDF("x").groupBy("x").count()
    println("groupBy->rdd partitions: " + df.rdd.getNumPartitions)
    val ck = df.localCheckpoint()
    println("groupBy->localCheckpoint partitions: " + ck.rdd.getNumPartitions)
    val rep = (1 to 100).toDF("x").repartition($"x")
    println("repartition(col)->localCheckpoint partitions: " +
      rep.localCheckpoint().rdd.getNumPartitions)
    val union = ck.union(ck).union(ck)
    println("union x3 partitions: " + union.rdd.getNumPartitions)
    println("union->localCheckpoint partitions: " +
      union.localCheckpoint().rdd.getNumPartitions)
    spark.stop()
  }
}
