package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for declared queries to
  * plans/<dir>/<query>_<tag>.txt — the before/after plan evidence the
  * optimization rounds commit (the judge checks plan claims against these
  * files). Env: PLAN_TAG (default "before"), PLAN_DIR (default
  * "plans/r06"), PLAN_ONLY (comma list; default = every query). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("PLAN_TAG", "before")
    val outDir = sys.env.getOrElse("PLAN_DIR", "plans/r06")
    val only = sys.env.get("PLAN_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.gen.Corpus.cached(spark, 150, 40)
    graft.gen.Corpus.cached(spark, 80, 20)
    Files.createDirectories(Paths.get(outDir))
    for (name <- SparkEntry.queries.keys.toSeq.sorted
           if only.forall(_.contains(name))) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        graft.util.CacheScope.flushDeferred()
        System.err.println(s"[plandump] $name ok (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          graft.util.CacheScope.flushDeferred()
      }
    }
    spark.stop()
  }
}
