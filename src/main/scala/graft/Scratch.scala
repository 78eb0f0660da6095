package graft

import org.apache.spark.sql.SparkSession

/** Local smoke main: replicates the driver's t1 check (entry rows > 0). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(f"[smoke] entry rows=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    df.groupBy("disposition").count().show()
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
