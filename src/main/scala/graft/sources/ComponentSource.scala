package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StructType, TimestampType}

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
    * (component, sensor, ts, value).
    *
    * ONE text scan over `root/&#47;*&#47;` — the plan is O(1) in the component
    * count (a per-directory union adds a plan node per component: fine at
    * 10, pathological at 10,000). The per-component column inventory comes
    * from the driver-side [[inferSchema]] pass (metadata, not data) and
    * joins in as a broadcast dimension keyed on the component name derived
    * from each file's path; the unpivot is then one generic
    * parse-and-explode — map-side, no shuffle, each input split yields its
    * own long rows. Sensor CSVs are unquoted numeric columns, so the
    * line-level split is an exact CSV parse here; header lines fall out as
    * failed timestamp parses.
    */
  def readLong(spark: SparkSession, root: String,
               timestampCol: String = "Timestamp"): DataFrame = {
    import spark.implicits._
    // (component, ts column position, [(sensor name, column position), ...])
    val meta = inferSchema(spark, root).map { sp =>
      val tsIdx = sp.columns.indexWhere(_.name == timestampCol)
      // fail at metadata-build time with a clear message — a -1 here would
      // otherwise surface at runtime as an opaque element_at(f, 0) index error
      require(tsIdx >= 0,
        s"component '${sp.name}' has no '$timestampCol' column " +
          s"(found: ${sp.columns.map(_.name).mkString(", ")})")
      val sensors = sp.columns.zipWithIndex.collect {
        case (c, i) if i != tsIdx && c.dtype == "DOUBLE" => (c.name, i)
      }
      (sp.name, tsIdx, sensors)
    }.toDF("component", "ts_idx", "sensors")

    spark.read.text(s"$root/*/")
      .select(
        regexp_extract(input_file_name(), "([^/]+)/[^/]+$", 1).as("component"),
        split(col("value"), ",").as("f"))
      .join(broadcast(meta), "component")
      .withColumn("ts",
        try_to_timestamp(element_at(col("f"), col("ts_idx") + 1),
          lit("yyyy-MM-dd HH:mm:ss")))
      .where(col("ts").isNotNull) // header lines (and malformed rows) drop here
      .select(col("component"), col("ts"), explode(col("sensors")).as("sv"), col("f"))
      .select(col("component"), col("sv._1").as("sensor"), col("ts"),
        // try_cast: malformed numeric cells become null (the CSV reader's
        // permissive behavior), not an ANSI runtime error
        expr("try_cast(element_at(f, sv._2 + 1) AS DOUBLE)").as("value"))
  }
}
