package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-table access over the driver-generated parquet fixtures
  * (TESTDATA.md) plus the warehouse directory layout.
  *
  * Reference analog: the staging/int/mart schema split of the mini-DW
  * (reference `code/SQL_1_Assignment_2_David_Färm.sql:135-152`). Our
  * "schemas" are directories under a warehouse root; a real deployment
  * would point these at object-store prefixes and register them in a
  * catalog — nothing here assumes a local filesystem beyond the paths.
  */
object Tables {
  def src(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

/** Warehouse layout (reference SQL:142-151 `CREATE SCHEMA` ×3 + meta). */
final case class Warehouse(root: String) {
  def int(table: String): String  = s"$root/int/$table"
  def mart(table: String): String = s"$root/mart/$table"
  def meta(table: String): String = s"$root/meta/$table"
}
