package graft

import org.apache.spark.sql.types.{ArrayType, MapType}

/** Contract checks over the WHOLE catalog — every SparkEntry entry, not
  * one operator. Schema-only (plans are built, nothing executes), so the
  * sweep stays fast as the catalog grows. */
class CatalogSpec extends SparkSpec {

  test("every oracle key has a matching query entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no catalog query outputs an array or map column") {
    // the driver's oracle compare sorts result rows by every output
    // column with pandas, which cannot sort array cells — p30/q37
    // shipped array columns and were silently broken for two rounds
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sfDir).schema.fields.filter(f =>
          f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType])
        if (bad.isEmpty) None else Some(s"$name: ${bad.map(_.name).mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"array/map-typed output columns break the driver compare:\n" +
        offenders.mkString("\n"))
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).limit(1).count() === 1L)
  }
}
