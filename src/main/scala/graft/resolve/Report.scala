package graft.resolve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CSV duplicate report — reference `create_csv_file`
  * (/root/reference/duplicate_files_in_folders/duplicates_finder.py:226-246):
  * one row per duplicate file with columns (key, path, size, modified_time),
  * cluster keys renumbered 1..N (the reference numbers in insertion order;
  * the engine numbers in deterministic cluster-id order so the report is
  * reproducible under any partitioning), timestamps formatted as datetimes
  * (`datetime.fromtimestamp`, duplicates_finder.py:245).
  */
object Report {

  /** @param dupRows one row per duplicate file:
    *                (cluster_id, path, size, mtime — timestamp)
    * @return (key, path, size, modified_time) with dense 1..N keys.
    *
    * Scale note: renumbering is a global rank, but it runs over the
    * DISTINCT cluster ids (one row per cluster, not per file) and joins
    * back broadcast-style — the single-partition window never sees the
    * full file list. */
  def clusterReport(dupRows: DataFrame): DataFrame = {
    val renumber = dupRows.select("cluster_id").distinct()
      .withColumn("key", dense_rank().over(Window.orderBy("cluster_id")))
    dupRows.join(broadcast(renumber), "cluster_id")
      .select(col("key"), col("path"), col("size"),
              date_format(col("mtime"), "yyyy-MM-dd HH:mm:ss").as("modified_time"))
  }

  /** Write the report as headered CSV (the reference's sink shape). */
  def writeCsv(report: DataFrame, path: String): Unit =
    report.write.option("header", "true").mode("overwrite").csv(path)
}
