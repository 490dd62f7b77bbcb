package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType}
import graft.sources.CsvQuarantine

/** Malformed-CSV ingestion: good rows parse typed, bad rows are classified
  * (field-count drift vs type rot) and counted, and the good set is
  * EXACTLY what a DROPMALFORMED read keeps — so the quarantine census is a
  * pure audit add-on, not a different parser.
  */
class CsvQuarantineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("sensor", StringType),
    StructField("value", DoubleType)))

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("csvq")
    Files.writeString(dir.resolve("part-0.csv"),
      Seq(
        "1,temp,20.5",
        "2,pressure,101.3",
        "3,temp",              // missing_fields
        "4,temp,oops",         // type_mismatch (value not numeric)
        "5,flow,7.7,EXTRA",    // extra_fields
        "6,temp,21.0",
        "notanint,temp,3.0"    // type_mismatch (id not numeric)
      ).mkString("\n"))
    dir.toString
  }

  test("good rows parse typed and match DROPMALFORMED exactly") {
    val dir = writeFixture()
    val parsed = CsvQuarantine.parse(spark, dir, schema,
      Seq("id", "sensor", "value"))
    val good = CsvQuarantine.goodRows(parsed)
    assert(good.schema.map(_.dataType) ==
      Seq(LongType, StringType, DoubleType))
    val ids = good.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 6L))
    assert(good.where(col("id") === 6L).select("value")
      .collect().head.getDouble(0) == 21.0)

    // the CSV reader's DROPMALFORMED drops short, long, AND type-failed
    // rows — exactly the quarantine gate (unlike from_csv PERMISSIVE,
    // which silently truncates extra fields; the n_fields check restores
    // the reader's stricter contract)
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").csv(dir)
      .where(col("id").isNotNull && col("sensor").isNotNull
        && col("value").isNotNull)
    val dIds = dropped.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(dIds == ids, "quarantine gate must match DROPMALFORMED")
  }

  test("quarantine census classifies the three failure modes") {
    val dir = writeFixture()
    val parsed = CsvQuarantine.parse(spark, dir, schema,
      Seq("id", "sensor", "value"))
    val census = CsvQuarantine.quarantine(parsed).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(census("missing_fields") == (1L, "3,temp"))
    assert(census("extra_fields") == (1L, "5,flow,7.7,EXTRA"))
    assert(census("type_mismatch")._1 == 2L)
    assert(census("type_mismatch")._2 == "4,temp,oops")
    // conservation: every input line is exactly one of ok/quarantined
    assert(CsvQuarantine.goodRows(parsed).count()
      + census.values.map(_._1).sum == 7L)
  }
}
