package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV landing-zone ingest with schema validation and permissive drift
  * handling — the reference's intake semantics re-expressed as pure,
  * testable functions (reference: src/main/transformations/jobs/main.py:112-204).
  *
  * Semantics preserved:
  *   - name-based mandatory-column validation; a file missing any mandatory
  *     column is rejected (main.py:115-121), never unioned;
  *   - extra columns beyond the mandatory set are collapsed into one string
  *     column `additional_column` via `concat_ws(", ", ...)` (main.py:192-198);
  *   - files with no extras carry a null `additional_column` (main.py:200);
  *   - accumulation onto one canonical frame. The reference uses positional
  *     `union` guarded by a fixed-order select (main.py:196-204); we emit the
  *     canonical column order from `normalize` and accumulate with
  *     `unionByName` so the safety is structural, not incidental.
  *
  * Scale notes: validation reads only the CSV header line per file (cheap,
  * driver-side); accepted files are read with an explicit schema — no
  * inferSchema pass — in ONE multi-path `spark.read.csv(paths: _*)` per
  * schema-shape group, so a 100k-file landing zone is a single distributed
  * scan per shape, not a per-file loop of Spark jobs.
  */
object SalesIngest {

  /** Mandatory fact columns (reference: resources/dev/config.py:40). */
  val mandatoryColumns: Seq[String] = Seq(
    "customer_id", "store_id", "product_name", "sales_date",
    "sales_person_id", "price", "quantity", "total_cost")

  /** Explicit fact schema — replaces the reference's inferSchema
    * (deterministic types, one fewer scan). Types per FIXTURES.md §1.
    */
  val salesSchema: StructType = StructType(Seq(
    StructField("customer_id", IntegerType),
    StructField("store_id", IntegerType),
    StructField("product_name", StringType),
    StructField("sales_date", StringType), // kept string: month key is substring(1,7)
    StructField("sales_person_id", IntegerType),
    StructField("price", DoubleType),
    StructField("quantity", IntegerType),
    StructField("total_cost", DoubleType)))

  /** Canonical 9-column output order (8 mandatory + additional_column). */
  val canonicalColumns: Seq[String] = mandatoryColumns :+ "additional_column"

  /** Missing mandatory columns for a candidate header; empty = valid.
    * (reference main.py:115-121 — set difference on names.) */
  def missingColumns(header: Seq[String]): Seq[String] =
    mandatoryColumns.filterNot(header.map(_.trim).toSet)

  /** Collapse any non-mandatory columns into `additional_column`
    * (reference main.py:192-200); project to canonical order. */
  def normalize(df: DataFrame): DataFrame = {
    val extras = df.columns.filterNot(mandatoryColumns.contains)
    val withExtra =
      if (extras.isEmpty) df.withColumn("additional_column", lit(null).cast(StringType))
      else df.withColumn("additional_column", concat_ws(", ", extras.map(col).toIndexedSeq: _*))
    withExtra.select(canonicalColumns.map(col): _*)
  }

  /** First line of a file through the Hadoop FileSystem API — works for
    * local paths and any scheme URI (file://, hdfs://, s3a://) alike, the
    * reference's aws_read.py:7-22 read path subsumed. */
  private def firstLine(p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    // the ACTIVE session's Hadoop conf, so spark.hadoop.* settings (s3a
    // credentials, endpoints) apply to the header probe exactly as they
    // do to spark.read on the same URI
    val fs = path.getFileSystem(graft.io.LandingZone.sessionHadoopConf())
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .nextOption().getOrElse("")
    finally in.close()
  }

  /** Header-only validation triage: (accepted paths, rejected path -> missing).
    * Reads one line per file driver-side — no Spark job per file
    * (the reference runs a full spark.read per header, main.py:113).
    */
  def triage(paths: Seq[String]): (Seq[String], Map[String, Seq[String]]) = {
    val checked = paths.map { p =>
      p -> missingColumns(firstLine(p).split(",").toSeq)
    }
    val (ok, bad) = checked.partition(_._2.isEmpty)
    (ok.map(_._1), bad.toMap)
  }

  /** Read all accepted CSVs into ONE canonical 9-column DataFrame.
    * Files are grouped by header shape so each group is a single
    * multi-path distributed read with an explicit schema.
    */
  def readSales(spark: SparkSession, accepted: Seq[String]): DataFrame = {
    require(accepted.nonEmpty, "no accepted sales files")
    val byHeader: Map[Seq[String], Seq[String]] = accepted.groupBy { p =>
      firstLine(p).split(",").map(_.trim).toSeq
    }
    byHeader.map { case (header, paths) =>
      val schema = StructType(header.map { c =>
        salesSchema.find(_.name == c).getOrElse(StructField(c, StringType))
      })
      normalize(spark.read.option("header", "true").schema(schema).csv(paths: _*))
    }.reduce(_ unionByName _)
  }
}
