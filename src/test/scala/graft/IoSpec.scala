package graft

import graft.io.{Ledger, Sinks}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sinks + ledger lifecycle. */
class IoSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned lays out hive partitions and prunes on read") {
    val out = Files.createTempDirectory("sink").toString + "/mart"
    val df = Seq((121, "2024-01", 10.0), (121, "2024-02", 20.0), (122, "2024-01", 30.0))
      .toDF("store_id", "sales_month", "total")
    Sinks.writePartitioned(df, out, Seq("sales_month", "store_id"))
    assert(new java.io.File(s"$out/sales_month=2024-01/store_id=121").exists())
    val pruned = spark.read.parquet(out).filter(col("sales_month") === "2024-01")
    assert(pruned.count() === 2)
    // partition pruning visible in the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 2)
  }

  test("ledger lifecycle: A on record, recovery check, I on done") {
    val path = Files.createTempDirectory("ledger").toString + "/audit"
    val files = Seq("/data/sales_1.csv", "/data/sales_2.csv")
    Ledger.recordActive(spark, path, files)
    // both in-flight: a rerun over the same files reports them failed
    assert(Ledger.failedInFlight(spark, path, files).toSet === Set("sales_1.csv", "sales_2.csv"))
    Ledger.markDone(spark, path, files)
    assert(Ledger.failedInFlight(spark, path, files) === Seq.empty)
    val statuses = Ledger.read(spark, path).collect().map(_.status).toSet
    assert(statuses === Set(Ledger.Done))
  }

  test("partial completion: only unfinished files flagged on recovery") {
    val path = Files.createTempDirectory("ledger2").toString + "/audit"
    Ledger.recordActive(spark, path, Seq("/d/a.csv", "/d/b.csv"))
    Ledger.markDone(spark, path, Seq("/d/a.csv"))
    assert(Ledger.failedInFlight(spark, path, Seq("/d/a.csv", "/d/b.csv")) === Seq("b.csv"))
  }

  test("ledger read falls back to the _old copy after a mid-swap crash") {
    val path = Files.createTempDirectory("ledger3").toString + "/audit"
    Ledger.recordActive(spark, path, Seq("/d/a.csv"))
    // simulate a crash between markDone's two moves: ledger moved aside,
    // replacement never promoted
    java.nio.file.Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(path + "_old"))
    assert(Ledger.read(spark, path).collect().map(_.file_name).toSeq === Seq("a.csv"))
    assert(Ledger.failedInFlight(spark, path, Seq("/d/a.csv")) === Seq("a.csv"))
  }

  test("credential util round-trips; wrong passphrase fails loudly") {
    val salt = "pillar-of-salt".getBytes("UTF-8")
    val ct = graft.io.Credentials.encrypt("jdbc-secret-pw", "passphrase", salt)
    assert(ct !== "jdbc-secret-pw")
    assert(graft.io.Credentials.decrypt(ct, "passphrase", salt) === "jdbc-secret-pw")
    // random IV: two encryptions of the same plaintext differ
    assert(ct !== graft.io.Credentials.encrypt("jdbc-secret-pw", "passphrase", salt))
    intercept[Exception] {
      graft.io.Credentials.decrypt(ct, "wrong", salt)
    }
  }
}
