package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 through the full
    * reference-shaped engine path (source URL dispatch → Spark SQL), the
    * analogue of `sql2all -u <url> -q <sql>` (reference src/main.rs:24-31).
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Engine.query(
      spark,
      "parquet:///root/testdata/sf0.001",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2)      AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       count(*)                       AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  /** One entry per implemented operator from SURVEY.md §2 (and the
    * training-data-pipeline extensions). Defined in graft.Registry. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** DuckDB-executable ANSI twin for each oracle-checkable query. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
