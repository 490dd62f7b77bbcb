package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StructType, TimestampType}

/** Component-tree sensor ingestion.
  *
  * The reference infers a dataset schema from a directory tree — one
  * subdirectory per machine component, each holding CSVs with a Timestamp
  * column plus DOUBLE sensor columns (reference schema.py:23-183,
  * `create_data_schema_from_dir_structure`) — then uploads the CSVs for the
  * service to ingest. Here the same tree becomes Spark DataFrames directly:
  * schema inference is Spark's CSV reader (sampled, distributed), and the
  * directory listing is driver-side metadata only (one filesystem call per
  * component, never per file at read time — the scan itself lists in
  * parallel on executors).
  *
  * [[readLong]] returns the engine's canonical long format
  * (component, sensor, ts, value): wide CSV columns unpivot into rows so
  * downstream operators (resample, rank, flags) are schema-independent and
  * partition by the (component, sensor) series key — the layout that scales
  * to arbitrarily many sensors without thousand-column rows.
  */
object ComponentSource {

  case class ColumnSpec(name: String, dtype: String)
  case class ComponentSpec(name: String, columns: Seq[ColumnSpec])

  /** List component subdirectories (driver-side metadata call). */
  private def componentDirs(spark: SparkSession, root: String): Seq[Path] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath).sortBy(_.getName).toSeq
  }

  /** Read one component's CSVs with header + inferred types. */
  def readComponent(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(dir)

  /** The reference's schema document: component name → typed column list.
    * Timestamp-typed columns report DATETIME, numeric columns DOUBLE —
    * mirroring the two types the reference schema language has
    * (schema.py:146-183).
    */
  def inferSchema(spark: SparkSession, root: String): Seq[ComponentSpec] =
    componentDirs(spark, root).map { dir =>
      val schema: StructType = readComponent(spark, dir.toString).schema
      ComponentSpec(
        dir.getName,
        schema.fields.map { f =>
          val dtype = f.dataType match {
            case TimestampType => "DATETIME"
            case _: NumericType => "DOUBLE"
            case other => other.simpleString.toUpperCase
          }
          ColumnSpec(f.name, dtype)
        }.toSeq)
    }

  /** All components as one long-format DataFrame:
    * (component, sensor, ts, value). The unpivot is a map-side transform —
    * no shuffle; each input split yields its own long rows.
    */
  def readLong(spark: SparkSession, root: String,
               timestampCol: String = "Timestamp"): DataFrame = {
    val parts = componentDirs(spark, root).map { dir =>
      val wide = readComponent(spark, dir.toString)
      val sensorCols = wide.schema.fields
        .filter(f => f.name != timestampCol && f.dataType.isInstanceOf[NumericType])
        .map(_.name)
      wide
        .select(col(timestampCol).cast(TimestampType).as("ts") +:
          sensorCols.map(c => col(c).cast(DoubleType)): _*)
        .unpivot(Array(col("ts")), sensorCols.map(col), "sensor", "value")
        .select(lit(dir.getName).as("component"), col("sensor"), col("ts"), col("value"))
    }
    parts.reduce(_ unionByName _)
  }
}
