package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Large-scale training-data pipeline operators (dedup, similarity search,
  * text analysis, multimodal) — SURVEY.md §7.4 surplus, driver north-star.
  * Filled in incrementally; each op gets a `queries` entry and, where
  * SQL-expressible, a DuckDB oracle. */
object PipelineOps {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
