package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

/** Semantics of the q38-q41 relational family: outer-join preservation,
  * multiway top-k plan shape, bounded window frames, keyed event dedup. */
class RelationalSpec extends SparkSpec {

  test("q38 full outer preserves every customer and every order group") {
    val out = RelationalQueries.q38FullOuter(spark, sfDir).cache()
    val nCust = Tables.customer(spark, sfDir).count()
    val nOrderCust = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    // full outer row count = customers + order-groups without a customer
    assert(out.count() >= math.max(nCust, nOrderCust))
    // a customer-side row with no orders must carry zeroed aggregates
    val noOrders = out.filter(col("no_orders"))
    assert(noOrders.filter(col("n_orders") =!= 0 || col("spend") =!= 0.0).isEmpty)
    // spend agrees with an independently computed per-customer sum
    val direct = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
        .as("direct_spend"))
    val joined = out.join(direct, "custkey")
    assert(joined.filter(col("spend") =!= col("direct_spend")).isEmpty)
    out.unpersist()
  }

  test("q39 multiway top-k is ordered, bounded, and broadcast-planned") {
    val q = RelationalQueries.q39MultiwayTopK(spark, sfDir)
    val rows = q.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dim join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k, not sort:\n$plan")
  }

  test("q40 bounded frames: sliding spend covers at most 4 rows, range 31 days") {
    val out = RelationalQueries.q40SlidingWindow(spark, sfDir).cache()
    // the sliding sum can never be below the row's own price and never
    // above 4x the partition max price
    val base = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_totalprice"))
    val j = out.join(base, "o_orderkey")
    assert(j.filter(col("spend_last4") < col("o_totalprice") - 0.01).isEmpty)
    // range frame: recompute one customer's 30-day counts by self-join
    val one = out.orderBy(col("o_custkey"), col("epoch_day")).limit(1)
      .select(col("o_custkey")).collect()(0).getLong(0)
    val mine = out.filter(col("o_custkey") === one)
      .select(col("o_orderkey"), col("epoch_day"), col("n_orders_30d"))
    val days = out.filter(col("o_custkey") === one)
      .select(col("epoch_day").as("d2")).collect().map(_.getLong(0))
    mine.collect().foreach { r =>
      val d = r.getAs[Long]("epoch_day")
      val expected = days.count(d2 => d2 >= d - 30 && d2 <= d)
      assert(r.getAs[Long]("n_orders_30d") === expected,
        s"range frame mismatch at epoch_day=$d")
    }
    out.unpersist()
  }

  test("contiguous ids are dense 0..n-1 and follow the requested order") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars"))
    val out = graft.ops.Ids.contiguousIds(docs,
      orderCol = col("n_chars"), tieCol = col("doc_id"), bucketWidth = 16).cache()
    val n = docs.count()
    assert(out.count() === n)
    // dense: ids are exactly 0..n-1
    assert(out.agg(min(col("global_id")), max(col("global_id")),
      count_distinct(col("global_id"))).collect()(0).toSeq === Seq(0L, n - 1, n))
    // order: sorting by id reproduces (n_chars, doc_id) order
    val byId = out.orderBy(col("global_id"))
      .select(col("n_chars"), col("doc_id")).collect()
    val expected = byId.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(byId.toSeq === expected.toSeq)
    out.unpersist()
  }

  test("quantile-bucketed ids stay dense and ordered over a sparse key") {
    // a 32-bit content hash: the key where fixed-width range bucketing
    // degenerates to one bucket per row (the q44 offsets-table hazard)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"),
      conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long").as("k"))
    val out = graft.ops.Ids.contiguousIdsQuantile(docs,
      orderCol = col("k"), tieCol = col("doc_id"), numBuckets = 16).cache()
    val n = docs.count()
    assert(out.agg(min(col("global_id")), max(col("global_id")),
      count_distinct(col("global_id"))).collect()(0).toSeq === Seq(0L, n - 1, n))
    val byId = out.orderBy(col("global_id"))
      .select(col("k"), col("doc_id")).collect()
    assert(byId.toSeq === byId.sortBy(r => (r.getLong(0), r.getLong(1))).toSeq)
    // numbering must stay per-bucket: no global row_number window
    val plan = out.queryExecution.executedPlan.toString
    val rn = plan.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("[id_bucket")),
      s"row_number must window per bucket, not globally:\n$plan")
    out.unpersist()
  }

  test("q44 plan: row numbering is per-bucket, offsets broadcast") {
    val q = RelationalQueries.q44GlobalIds(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "bucket offsets must broadcast")
    // the per-row numbering window must be partitioned by bucket; the
    // only legitimate unpartitioned window is the offsets prefix sum
    // over #buckets rows (inside the broadcast branch)
    val rn = plan.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("[id_bucket")),
      s"row_number must window per bucket, not globally:\n$plan")
  }

  test("q50 z-order layout: written files carry disjoint z-ranges") {
    val q = RelationalQueries.q50ZOrderLayout(spark, sfDir)
    val files = q.inputFiles
    assert(files.length > 1, "layout must produce multiple files to skip over")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("zval")), max(col("zval"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, prevMax), (curMin, _)) =>
        assert(curMin >= prevMax,
          s"file z-ranges overlap: $prevMax vs $curMin — min/max skipping broken")
      case _ =>
    }
    // round-trip: de-interleaving the code recovers both key dimensions
    val sample = q.limit(200).collect()
    val orig = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("ck"),
        pmod(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
          lit(65536L)).as("ed"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    sample.foreach { r =>
      val z = r.getAs[Long]("zval")
      val (ck, ed) = (0 until 16).foldLeft((0L, 0L)) { case ((a, b), i) =>
        (a | (((z >> (2 * i)) & 1L) << i), b | (((z >> (2 * i + 1)) & 1L) << i))
      }
      assert((ck, ed) === orig(r.getAs[Long]("o_orderkey")),
        s"z-code must decode to its key pair for order ${r.get(0)}")
    }
  }

  test("q55 3-D z-order: disjoint file ranges, third-dim skipping, decode") {
    val q = RelationalQueries.q55ZOrder3(spark, sfDir)
    val files = q.inputFiles
    assert(files.length > 1, "layout must produce multiple files to skip over")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("zval")), max(col("zval"))).collect()(0)
      (f, r.getLong(0), r.getLong(1))
    }.sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array((_, _, prevMax), (_, curMin, _)) =>
        assert(curMin >= prevMax,
          s"file z-ranges overlap: $prevMax vs $curMin — min/max skipping broken")
      case _ =>
    }
    def decode3(z: Long): (Long, Long, Long) =
      (0 until 16).foldLeft((0L, 0L, 0L)) { case ((a, b, c), i) =>
        (a | (((z >> (3 * i)) & 1L) << i),
         b | (((z >> (3 * i + 1)) & 1L) << i),
         c | (((z >> (3 * i + 2)) & 1L) << i))
      }
    val orig = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("ck"),
        pmod(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
          lit(65536L)).as("ed"),
        pmod(col("o_orderkey"), lit(65536L)).as("pk"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    q.limit(200).collect().foreach { r =>
      assert(decode3(r.getAs[Long]("zval")) === orig(r.getAs[Long]("o_orderkey")),
        s"3-D z-code must decode to its key triple for order ${r.get(0)}")
    }
    // skipping on the THIRD interleaved dimension: for B = the data's top
    // varying pk bit, pk >= 2^B forces code bit 3B+2, so every file whose
    // z-range tops out below 2^(3B+2) is skippable for that predicate
    // (on this fixture no other dimension reaches bit B+1, so the
    // threshold is exact)
    val maxPk = orig.values.map(_._3).max
    val bitB = 63 - java.lang.Long.numberOfLeadingZeros(maxPk)
    assert(orig.values.exists(_._3 >= (1L << bitB)),
      "the pk >= 2^B predicate must match some rows")
    val thresholdZ = 1L << (3 * bitB + 2)
    assert(ranges.exists { case (_, _, mx) => mx < thresholdZ },
      s"at least one file must be skippable for pk >= ${1L << bitB}")
  }

  test("compaction conserves rows and hits the file-count target") {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-compact-spec").toString
    val nFiles = graft.io.Sinks.compactParquet(spark,
      s"$sfDir/documents.parquet", outDir, targetFileBytes = 16L << 10)
    val written = new java.io.File(outDir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(written === nFiles, "file count matches the size-derived target")
    assert(spark.read.parquet(outDir).count() ===
      Tables.documents(spark, sfDir).count())
  }

  test("q41 dedup conserves events and keeps the earliest per key") {
    val out = RelationalQueries.q41EventDedup(spark, sfDir).cache()
    val total = Tables.events(spark, sfDir).count()
    val kept = out.count()
    val dropped = out.agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    assert(kept + dropped === total, "every event is either kept or dropped")
    assert(out.filter(col("n_dropped") < 0).isEmpty)
    out.unpersist()
  }
}
