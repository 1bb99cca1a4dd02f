package graft

import graft.functions.TopKAggregator
import graft.ingest.SalesIngest
import graft.marts.Marts
import graft.ops.Salting
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over generated data (SURVEY.md §5):
  * algebraic equalities that must hold for ALL inputs, not just
  * fixtures. The scalatest/scalacheck bridge is not on the offline
  * classpath, so properties run over explicitly seeded samples.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Evaluate `body` over `n` deterministic samples of `gen`. */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val v = gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i"))
      withClue(s"seed=$i: ")(body(v))
    }

  private val salesGen: Gen[List[(Int, String, Double)]] = Gen.listOfN(60,
    for {
      cust <- Gen.choose(1, 5)
      month <- Gen.choose(1, 3)
      day <- Gen.choose(1, 28)
      amt <- Gen.choose(-99999L, 99999L).map(_ / 100.0) // 2-decimal amounts
    } yield (cust, f"2024-$month%02d-$day%02d", amt))

  test("property: window+distinct ≡ groupBy for the customer mart") {
    forAllSeeded(salesGen) { rows =>
      locally {
        val df = rows.toDF("cust", "d", "amt")
        val windowed = df
          .withColumn("m", Marts.monthKey(col("d")))
          .withColumn("total", sum(col("amt").cast("decimal(18,2)"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(col("cust"), col("m")))
            .cast("double"))
          .select("cust", "m", "total").distinct()
        val grouped = df.withColumn("m", Marts.monthKey(col("d")))
          .groupBy("cust", "m").agg(Marts.moneySum(col("amt")).as("total"))
        assert(windowed.exceptAll(grouped).isEmpty && grouped.exceptAll(windowed).isEmpty)
      }
    }
  }

  test("property: salted sum ≡ direct sum") {
    forAllSeeded(salesGen) { rows =>
      locally {
        val df = rows.zipWithIndex.map { case ((c, d, a), i) => (c, d, a, i.toLong) }
          .toDF("cust", "d", "amt", "rid")
        val salted = Salting.saltedSum(df, "cust", "amt", salts = 3, disambigCol = "rid")
        val direct = df.groupBy(col("cust"))
          .agg(sum(col("amt").cast("decimal(18,2)")).cast("double").as("total"))
        assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
      }
    }
  }

  test("property: top_k agrees with sort-take on any scored set") {
    val scoredGen = Gen.listOfN(40, for {
      g <- Gen.choose(1L, 3L)
      score <- Gen.choose(0, 1000).map(_ / 1000.0)
      id <- Gen.choose(1L, 500L)
    } yield (g, score, id))
    forAllSeeded(scoredGen) { rows =>
      locally {
        val distinctRows = rows.distinct
        val df = distinctRows.toDF("g", "score", "id")
        val got = df.groupBy(col("g"))
          .agg(TopKAggregator.top_k(5)(col("score"), col("id")).as("tk"))
          .collect().map(r => r.getAs[Long]("g") ->
            r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getDouble(0), t.getLong(1)))).toMap
        val want = distinctRows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(r => (r._2, r._3)).distinct
            .sortBy { case (s, i) => (-s, i) }.take(5)
        }
        want.foreach { case (g, exp) => assert(got(g) === exp, s"group $g") }
      }
    }
  }

  test("property: z-order codes decode to their key pairs and stay bounded") {
    val keyGen = Gen.listOfN(50, for {
      a <- Gen.choose(0L, 65535L)
      b <- Gen.choose(0L, 65535L)
    } yield (a, b))
    forAllSeeded(keyGen) { keys =>
      val df = keys.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "a", "b")
        .withColumn("z", graft.ops.ZOrder.zValue(col("a"), col("b")))
      df.collect().foreach { r =>
        val z = r.getAs[Long]("z")
        assert(z >= 0 && z < (1L << 32))
        val (a, b) = (0 until 16).foldLeft((0L, 0L)) { case ((x, y), i) =>
          (x | (((z >> (2 * i)) & 1L) << i), y | (((z >> (2 * i + 1)) & 1L) << i))
        }
        assert((a, b) === ((r.getAs[Long]("a"), r.getAs[Long]("b"))))
      }
    }
  }

  test("property: quantile-bucketed ids ≡ fixed-width ids ≡ global order") {
    val rowGen = Gen.listOfN(80, for {
      key <- Gen.choose(Long.MinValue / 4, Long.MaxValue / 4) // sparse 62-bit
    } yield key)
    forAllSeeded(rowGen, n = 3) { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("rid", "k")
      val expected = df.orderBy(col("k"), col("rid")).collect()
        .map(_.getAs[Long]("rid")).zipWithIndex
        .map { case (rid, i) => rid -> i.toLong }.toMap
      val got = graft.ops.Ids
        .contiguousIdsQuantile(df, col("k"), col("rid"), numBuckets = 8)
        .collect().map(r => r.getAs[Long]("rid") -> r.getAs[Long]("global_id"))
        .toMap
      assert(got === expected,
        "quantile bucketing must reproduce the exact global order")
    }
  }

  test("property: rrfFuseTopK is list-order- and partitioning-invariant") {
    // the decimal-contribution rationale (Similarity.scala): at 3+ lists
    // a double sum's partial-aggregation order could perturb low bits,
    // making rrf_score (and thus the top-k cut) depend on which list or
    // partition arrives first. Contributions are exact decimals, so any
    // list order and any physical partitioning must give BIT-IDENTICAL
    // fused output.
    val listGen = Gen.listOfN(3, Gen.listOfN(30, for {
      q <- Gen.choose(1L, 4L)
      c <- Gen.choose(1L, 40L)
      s <- Gen.choose(0, 10000).map(_ / 10000.0)
    } yield (q, c, s)))
    forAllSeeded(listGen, n = 3) { lists =>
      val dfs = lists.map(_.distinct.toDF("q_id", "c_id", "cos_sim"))
      def fused(ls: Seq[org.apache.spark.sql.DataFrame]): Set[(Long, Long, Double, Long)] =
        graft.ops.Similarity.rrfFuseTopK(ls, k = 5).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
          .toSet
      val canonical = fused(dfs)
      assert(fused(dfs.reverse) === canonical, "list order must not matter")
      assert(fused(dfs.map(_.repartition(7))) === canonical,
        "physical partitioning must not matter")
    }
  }

  test("property: groupCappedTopK ≡ window form under heavy ties") {
    // scores drawn from 4 distinct values over 3 groups: most rows TIE,
    // which is exactly where an aggregate top-k and a window row_number
    // can drift apart if the tie-break disagrees
    val rowsGen = Gen.listOfN(40, for {
      g <- Gen.choose(1L, 3L)
      s <- Gen.choose(0, 3).map(_ / 4.0)
    } yield (g, s))
    def windowForm(df: org.apache.spark.sql.DataFrame, cap: Int) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("s").desc, col("id").asc)
      df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= cap)
        .select(col("g").as("group_key"), col("rank"), col("id"),
          col("s").as("score"))
    }
    forAllSeeded(rowsGen, n = 4) { rows =>
      // distinct ids so the (score desc, id asc) order is total
      val df = rows.zipWithIndex.map { case ((g, s), i) => (g, i.toLong, s) }
        .toDF("g", "id", "s")
      val agg = graft.ops.Selection.groupCappedTopK(df, col("g"), col("s"),
        col("id"), cap = 3)
      val win = windowForm(df, 3)
      assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
        "aggregate top-k must equal the window form")
      // the all-ties corner: every row the same score, order is id alone
      val flat = df.withColumn("s", lit(0.5))
      val aggF = graft.ops.Selection.groupCappedTopK(flat, col("g"), col("s"),
        col("id"), cap = 3)
      val winF = windowForm(flat, 3)
      assert(aggF.exceptAll(winF).isEmpty && winF.exceptAll(aggF).isEmpty,
        "all-ties: aggregate top-k must equal the window form")
    }
  }

  test("property: budgetSelect cum_weight invariant under repartitioning and resolution") {
    val rowsGen = Gen.listOfN(50, for {
      ord <- Gen.choose(0, 1000).map(_ / 1000.0)
      w <- Gen.choose(1L, 50L)
    } yield (ord, w))
    forAllSeeded(rowsGen, n = 3) { rows =>
      val data = rows.zipWithIndex.map { case ((o, w), i) => (i.toLong, o, w) }
      val budget = rows.map(_._2).sum / 2
      // driver-side reference: exact running sum in (ord, id) order
      val expected = data.sortBy { case (id, o, _) => (o, id) }
        .scanLeft((0L, 0L, 0.0)) { case ((_, cum, _), (id, o, w)) => (id, cum + w, o) }
        .drop(1).map { case (id, cum, _) => id -> cum }.toMap
      for (res <- Seq(1, 2, 1024); parts <- Seq(1, 7)) {
        val df = data.toDF("id", "o", "w").repartition(parts)
        val got = graft.ops.Selection.budgetSelect(df, col("o"), col("w"),
            col("id"), budget = budget, resolution = res)
          .collect()
          .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum_weight"),
            r.getAs[Boolean]("is_selected")))
        withClue(s"resolution=$res parts=$parts: ") {
          got.foreach { case (id, cum, sel) =>
            assert(cum === expected(id),
              s"cum_weight for id=$id must match the exact global running sum")
            assert(sel === (cum <= budget))
          }
        }
      }
    }
  }

  test("property: upsert merge is batch-split- and order-invariant") {
    // q61's exactly-once claim reduces to this algebra: the per-key
    // argmax is commutative, associative, and idempotent, so ANY way of
    // chopping the event stream into batches — and any replay — must
    // converge to the same table. Random keyed rows with deliberate key
    // collisions, random 3-way splits, merged in shuffled order.
    val rowsGen = for {
      rows <- Gen.listOfN(60, for {
        id <- Gen.choose(1L, 1000L)
        u <- Gen.choose(1L, 6L)
        t <- Gen.oneOf("click", "view")
        v <- Gen.choose(0, 1000).map(_ / 10.0)
      } yield (id, u, t, v))
      splits <- Gen.listOfN(rows.length, Gen.choose(0, 2))
    } yield (rows.distinctBy(_._1), splits)
    forAllSeeded(rowsGen, n = 3) { case (rows, splits) =>
      def df(rs: Seq[(Long, Long, String, Double)]) =
        rs.toDF("event_id", "user_id", "event_type", "value")
          .withColumn("ts", org.apache.spark.sql.functions
            .timestamp_micros(col("event_id") * 1000000L))
      def run(batches: Seq[Seq[(Long, Long, String, Double)]]): Set[(Long, String, Long, Double)] = {
        val target = java.nio.file.Files
          .createTempDirectory("graft_upsert_prop").toString
        batches.filter(_.nonEmpty).foreach(b =>
          graft.streaming.UpsertSink.mergeLatestBatch(df(b), target, nBuckets = 4))
        val got = spark.read.parquet(target)
          .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(target))
        got
      }
      val grouped = rows.zip(splits).groupMap(_._2)(_._1)
      val batches = (0 to 2).map(i => grouped.getOrElse(i, Nil))
      val oneShot = run(Seq(rows))
      assert(run(batches) === oneShot, "3-way split must equal one-shot")
      assert(run(batches.reverse ++ Seq(batches.head)) === oneShot,
        "reversed order plus a replayed batch must equal one-shot")
    }
  }

  test("property: line dedup round-trips untouched docs; incremental ≡ global on any split") {
    // docs built from a tiny line vocabulary so cross-doc repeats (and
    // therefore removals) are common, plus one guaranteed-unique line
    // per doc so no doc collapses to empty in the round-trip half
    val vocab = Vector("alpha beta", "gamma delta", "epsilon zeta",
      "eta theta", "iota kappa")
    val corpusGen: Gen[List[(Long, String)]] = Gen.listOfN(12,
      for {
        nShared <- Gen.choose(0, 3)
        picks <- Gen.listOfN(nShared, Gen.choose(0, vocab.size - 1))
      } yield picks.map(vocab)).map(_.zipWithIndex.map { case (shared, i) =>
        (i.toLong, (shared :+ s"unique line number $i").mkString("\n"))
      })
    forAllSeeded(corpusGen) { rows =>
      locally {
        val docs = rows.toDF("doc_id", "text")
        val global = graft.ops.TextAnalysis.lineDedup(docs, byLines = true)
        // a doc whose every line is globally unique must round-trip
        // to its exact original text with nothing removed
        val untouched = global.filter(col("n_removed") === 0L)
          .join(docs, "doc_id")
          .filter(col("text_clean") =!= col("text"))
        assert(untouched.isEmpty,
          "zero-removal docs must reassemble to their original text")
        // incremental against the persisted index ≡ global restricted
        // to the delta, for an arbitrary corpus/delta split
        val tbl = "linedf_prop_idx"
        graft.io.Bucketing.dropTable(spark, tbl)
        graft.ops.TextAnalysis.buildLineDfIndex(
          docs.filter(col("doc_id") % 3 =!= 0L), tbl, byLines = true,
          buckets = 2)
        val inc = graft.ops.TextAnalysis.lineDedupIncremental(spark,
          docs.filter(col("doc_id") % 3 === 0L), tbl, byLines = true)
        val want = global.join(
          docs.filter(col("doc_id") % 3 === 0L).select("doc_id"), "doc_id")
        assert(inc.exceptAll(want).isEmpty && want.exceptAll(inc).isEmpty,
          "incremental verdicts must equal the global rewrite on the delta")
        graft.io.Bucketing.dropTable(spark, tbl)
      }
    }
  }

  test("property: normalize always emits the canonical 9-column schema") {
    val extraColsGen = Gen.someOf(Seq("payment_mode", "channel", "note"))
    forAllSeeded(extraColsGen) { extras =>
      val base = Seq((1, 121, "tea", "2024-01-01", 1, 10.0, 2, 20.0))
        .toDF(SalesIngest.mandatoryColumns: _*)
      val df = extras.zipWithIndex.foldLeft(base) { case (d, (c, i)) =>
        d.withColumn(c, lit(s"v$i"))
      }
      val out = SalesIngest.normalize(df)
      assert(out.columns.toSeq === SalesIngest.canonicalColumns)
      val add = out.select("additional_column").as[String].head()
      if (extras.isEmpty) assert(add === null)
      else assert(add === extras.zipWithIndex.map { case (_, i) => s"v$i" }.mkString(", "))
    }
  }

  // random small-vocab docs: heavy window duplication by construction
  private val passageGen: Gen[List[(Long, String)]] = Gen.listOfN(12,
    Gen.choose(8, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("property: passage removal preserves order and keeps every canonical occurrence") {
    forAllSeeded(passageGen) { rows =>
      val k = 8
      val docs = rows.toDF("doc_id", "text")
      val got = graft.ops.Dedup.substringRemove(docs, k = k).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val toks = rows.toMap.view.mapValues(_.split(" ", -1).toVector).toMap
      // global keep-first replay in plain Scala
      val occ = rows.flatMap { case (id, _) =>
        val w = toks(id)
        if (w.size < k) Nil
        else (0 to w.size - k).map(p => (w.slice(p, p + k).mkString(" "), id, p))
      }
      val removed = occ.groupBy(_._1).values.flatMap { os =>
        if (os.size < 2) Nil else os.sortBy(o => (o._2, o._3)).tail
      }.toSeq
      val removedByDoc = removed.groupBy(_._2).view
        .mapValues(_.map(_._3).toSet).toMap
      for ((id, w) <- toks) {
        val starts = removedByDoc.getOrElse(id, Set.empty)
        val kept = w.indices.filterNot(j =>
          starts.exists(s => s <= j && j < s + k)).map(w)
        val (nTok, nRem, cleaned) = got(id)
        assert(nTok === w.size.toLong)
        assert(cleaned === kept.mkString(" "),
          s"doc $id rewrite mismatch")
        assert(nRem === (w.size - kept.size).toLong)
        // cleaned text is an order-preserving subsequence of the tokens
        val it = w.iterator
        assert(kept.forall(t => it.contains(t)),
          s"doc $id cleaned text is not a subsequence")
      }
      // every duplicated window's canonical (first) occurrence survives
      // in the doc that holds it UNLESS an overlapping removed span from
      // ANOTHER duplicated window covered it; spot-check the global
      // minimum occurrence of each window with no overlapping removals
      val safe = occ.groupBy(_._1).values.flatMap { os =>
        val first = os.minBy(o => (o._2, o._3))
        val starts = removedByDoc.getOrElse(first._2, Set.empty)
        val covered = (first._3 until first._3 + k)
          .exists(j => starts.exists(s => s <= j && j < s + k))
        if (covered) None else Some(first)
      }
      safe.foreach { case (gram, id, _) =>
        assert(got(id)._3.contains(gram.split(" ").head),
          s"canonical occurrence of '$gram' lost from doc $id")
      }
    }
  }
}
