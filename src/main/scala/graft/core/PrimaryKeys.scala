package graft.core

import org.apache.spark.sql.SparkSession

import scala.util.Try

/** Primary-key "reflection" (reference `db_access.get_primary_keys`,
  * `db_access.py:1002-1013`). Spark's catalog has no first-class PK concept;
  * the closest public analogue is a `primaryKey` table property
  * (comma-separated column names), which Delta-style tables and
  * `ALTER TABLE ... SET TBLPROPERTIES` can carry. Sources that are not
  * catalog tables (parquet paths, frames, raw queries) have no PK metadata —
  * `None`, mirroring the reference's NotImplementedError for non-table
  * sources.
  */
object PrimaryKeys {
  def of(spark: SparkSession, source: DataSource): Option[Seq[String]] = source match {
    case TableSource(table) =>
      Try {
        spark
          .sql(s"SHOW TBLPROPERTIES $table")
          .collect()
          .collectFirst {
            case row if row.getString(0) == "primaryKey" =>
              row.getString(1).split(",").map(_.trim).toSeq.filter(_.nonEmpty)
          }
      }.toOption.flatten
    case _ => None
  }
}
