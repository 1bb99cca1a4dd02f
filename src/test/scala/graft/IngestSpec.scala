package graft

import graft.ingest.SalesIngest
import java.nio.file.Files

/** CSV landing-zone semantics (reference main.py:112-204): mandatory-column
  * rejection, extra-column collapse, canonical union. */
class IngestSpec extends SparkSpec {

  private def writeCsv(dir: java.nio.file.Path, name: String, lines: Seq[String]): String = {
    val p = dir.resolve(name)
    Files.write(p, String.join("\n", lines: _*).getBytes)
    p.toString
  }

  test("triage rejects files missing mandatory columns, accepts drifted extras") {
    val dir = Files.createTempDirectory("ingest")
    val good = writeCsv(dir, "good.csv", Seq(
      "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost",
      "1,121,quaker oats,2024-01-01,1,212.0,2,424.0"))
    val drift = writeCsv(dir, "drift.csv", Seq(
      "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost,payment_mode",
      "2,122,sugar,2024-01-02,4,50.0,1,50.0,UPI"))
    val bad = writeCsv(dir, "bad.csv", Seq(
      "customer_id,product_name,sales_date,sales_person_id,price,quantity,total_cost",
      "3,tea,2024-01-03,2,10.0,1,10.0"))
    val (accepted, rejected) = SalesIngest.triage(Seq(good, drift, bad))
    assert(accepted.toSet === Set(good, drift))
    assert(rejected(bad) === Seq("store_id"))
  }

  test("readSales collapses extras into additional_column and unions to canonical schema") {
    val dir = Files.createTempDirectory("ingest2")
    val good = writeCsv(dir, "good.csv", Seq(
      "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost",
      "1,121,quaker oats,2024-01-01,1,212.0,2,424.0"))
    val drift = writeCsv(dir, "drift.csv", Seq(
      "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost,payment_mode,channel",
      "2,122,sugar,2024-01-02,4,50.0,1,50.0,UPI,online"))
    val df = SalesIngest.readSales(spark, Seq(good, drift))
    assert(df.columns.toSeq === SalesIngest.canonicalColumns)
    val rows = df.collect().map(r => r.getAs[Int]("customer_id") ->
      Option(r.getAs[String]("additional_column"))).toMap
    assert(rows(1) === None) // no extras -> null placeholder
    assert(rows(2) === Some("UPI, online")) // concat_ws ", " collapse
  }

  test("missingColumns is order-insensitive and trims") {
    assert(SalesIngest.missingColumns(
      Seq("total_cost", " price", "quantity", "customer_id", "store_id",
        "product_name", "sales_date", "sales_person_id")) === Nil)
  }
}
