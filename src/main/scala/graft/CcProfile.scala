package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents

/** Dev-only: CC flat-cost probe — AQE on/off, roundsPerJob, tiny inputs. */
object CcProfile {
  def time[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 250-edge chain-ish graph: 50 components x 5 edges
    val edges = (0 until 250).map(i => (i / 5 * 100 + i % 5, i / 5 * 100 + i % 5 + 1))
      .toDF("id1", "id2").repartition(32).localCheckpoint(true)
    edges.count()
    for (rep <- 1 to 3; rpj <- Seq(1, 2)) {
      time(s"rep$rep rpj=$rpj runMapping(250 edges)") {
        ConnectedComponents.runMapping(edges, roundsPerJob = rpj).count()
      }
    }
    spark.stop()
  }
}
