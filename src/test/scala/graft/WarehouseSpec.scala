package graft

import graft.queries.WarehouseQueries
import org.apache.spark.sql.functions._

/** Semantics of the warehouse-maintenance family: SCD2 version/validity
  * invariants, MERGE action partitioning, audit-gate coverage. */
class WarehouseSpec extends SparkSpec {

  test("q47 SCD2: exactly one current version per key, changed keys have two") {
    val out = WarehouseQueries.q47Scd2History(spark, sfDir).cache()
    val perKey = out.groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_versions"),
        count(when(col("is_current"), 1)).as("n_current"),
        max(col("version")).as("max_v"))
    assert(perKey.filter(col("n_current") =!= 1).isEmpty,
      "every key must have exactly one current version")
    assert(perKey.filter(col("c_custkey") % 7 === 0)
      .filter(col("n_versions") =!= 2 || col("max_v") =!= 2).isEmpty)
    assert(perKey.filter(col("c_custkey") % 7 =!= 0)
      .filter(col("n_versions") =!= 1).isEmpty)
    // closed rows end exactly where their successor begins
    val v1 = out.filter(col("version") === 1 && !col("is_current"))
      .select(col("c_custkey"), col("valid_to"))
    val v2 = out.filter(col("version") === 2)
      .select(col("c_custkey"), col("valid_from"))
    assert(v1.join(v2, "c_custkey")
      .filter(col("valid_to") =!= col("valid_from")).isEmpty)
    out.unpersist()
  }

  test("q48 MERGE: actions partition the keyspace and update adds the spend") {
    val out = WarehouseQueries.q48MergeUpsert(spark, sfDir).cache()
    assert(out.groupBy(col("custkey")).count().filter(col("count") > 1).isEmpty,
      "merge output must be unique per key")
    assert(out.filter(col("action") === "insert")
      .filter(col("mktsegment") =!= "NEW").isEmpty)
    // an updated key's balance = original + its (shifted-key) spend
    val orig = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("custkey"), col("c_acctbal").as("bal0"))
    val spend = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") % 31 =!= 0)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    val updated = out.filter(col("action") === "update")
      .join(orig, "custkey").join(spend, "custkey")
      .withColumn("expected",
        (col("bal0").cast("decimal(18,2)") + col("spend")).cast("double"))
    assert(updated.filter(col("acctbal") =!= col("expected")).isEmpty)
    out.unpersist()
  }

  test("q49 audit: every constraint holds on the fixture") {
    val out = WarehouseQueries.q49QualityAudit(spark, sfDir).cache()
    assert(out.count() === 7)
    assert(out.filter(!col("pass")).isEmpty,
      "fixture data must satisfy all audit constraints")
    out.unpersist()
  }
}
