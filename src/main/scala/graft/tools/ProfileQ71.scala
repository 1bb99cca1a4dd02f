package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-phase profiler for q71_streaming_vector_index (dev utility,
  * optimization r22 — VERDICT r21 item 1 asked for a per-batch job
  * breakdown of the catalog's most expensive row): mirrors the catalog
  * row's exact body with nanotime fences around every phase — fixture
  * landing, geometry pinning, then PER MICRO-BATCH the repair guards,
  * the bands-table write, the vecs-table write and the cadence entry
  * (including the batch-3 double compaction), then the post-stream
  * refresh and the probe — so the optimization targets the measured
  * phase instead of a guess. The appended phases replicate
  * `Similarity.appendVectorIndexPartial`'s body through the same public
  * Bucketing calls, so phase sums track the real row (verified against
  * ProfileQuery's whole-row number).
  *
  * NOTE: the per-batch phases here stay SEQUENTIAL on purpose — this is
  * the r22 BEFORE-shape instrument whose numbers motivated overlapping
  * the bands/vecs writes in the real appendVectorIndexPartial (guide
  * §2.6); the after-measurement is the real row via ProfileQuery /
  * the filtered bench, not this mirror.
  *
  * runMain graft.tools.ProfileQ71 [sfDir] [reps]
  */
object ProfileQ71 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.io.TempPaths.newWarehouseDir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.io.TempPaths.cleanupOnExit(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))

    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time[T](k: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      acc(k) = acc.getOrElse(k, 0.0) + (System.nanoTime() - t0) / 1e9
      r
    }

    // warm like Bench so rep1 isn't JIT/codegen
    spark.read.parquet(s"$dir/embeddings.parquet").limit(1).count()

    (1 to reps).foreach { rep =>
      acc.clear()
      graft.io.TempPaths.bumpEpoch()
      val repT0 = System.nanoTime()
      val emb = graft.Tables.embeddings(spark, dir)
      val landing = graft.io.TempPaths.scratchDir(spark, "graft_pq71_in", dir)
      val nFiles = 4
      // landing: the landSlices one-job device, inlined (it is private)
      time("landing") {
        if (!graft.io.TempPaths.isComplete(landing)) {
          new java.io.File(landing).mkdirs()
          val staging = java.nio.file.Paths.get(
            graft.io.TempPaths.uniqueScratchDir(spark, "graft_pq71_stage", dir))
          java.nio.file.Files.createDirectories(staging)
          val corpus = emb.filter(col("vec_id") % 5 =!= 0)
          val tagged = (0 until nFiles).map(i =>
              corpus.filter(pmod(col("vec_id"), lit(nFiles)) === i)
                .withColumn("__slice", lit(i)))
            .reduce(_.unionByName(_))
          tagged.repartition(nFiles, col("__slice"))
            .write.mode("overwrite").partitionBy("__slice")
            .parquet(staging.toString)
          (0 until nFiles).foreach { i =>
            Option(staging.resolve(s"__slice=$i").toFile.listFiles()).toSeq
              .flatten.filter(_.getName.endsWith(".parquet")).headOption
              .foreach { part =>
                java.nio.file.Files.move(part.toPath,
                  java.nio.file.Paths.get(landing, f"docs_$i%05d.parquet"),
                  java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              }
          }
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
          val parts = Option(new java.io.File(landing).listFiles()).toSeq
            .flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          val base = System.currentTimeMillis() - parts.length * 10000L
          parts.zipWithIndex.foreach { case (f, i) =>
            require(f.setLastModified(base + i * 10000L)) }
          graft.io.TempPaths.markComplete(landing)
        }
      }
      val ckpt = graft.io.TempPaths.scratchDir(spark, "graft_pq71_ckpt", dir)
      val bandsTbl = graft.io.TempPaths.scratchTableName(spark, "graft_pq71_vbands", dir)
      val vecsTbl = graft.io.TempPaths.scratchTableName(spark, "graft_pq71_vecs", dir)
      val bits = time("bits-count")(graft.ops.Similarity.adaptiveBitsPerTable(
        spark.read.parquet(landing).count()))
      val lshTables = 8
      time("stream-total") {
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        Seq(bandsTbl, vecsTbl).foreach { t =>
          if (!spark.catalog.tableExists(t)) {
            graft.io.Bucketing.dropTable(spark, t)
            graft.io.TempPaths.cleanupOnExit(s"$wh/${t.toLowerCase}")
          }
        }
        val schema = spark.read.parquet(landing).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
        val q = stream.writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         id: Long) => {
            // appendVectorIndexPartial's body, phase-fenced
            val bsp = b.sparkSession
            val bands = b.toDF().select(col("vec_id"),
              posexplode(graft.ops.Similarity.lshBucketsMulti(
                col("embedding"), lshTables, bits)))
              .toDF("corpus_id", "t", "bucket")
              .withColumn("batch_id", lit(id))
            val vecs = b.toDF().select(col("vec_id").as("corpus_id"),
                col("embedding").as("c_emb"),
                graft.functions.VectorFunctions.vec_norm(col("embedding")).as("c_nrm"))
              .withColumn("batch_id", lit(id))
            val bandsLive = time("batch:repair")(
              graft.io.Bucketing.repairCompaction(spark, bandsTbl))
            val vecsLive = time("batch:repair")(
              graft.io.Bucketing.repairCompaction(spark, vecsTbl))
            val geom = Map(
              graft.io.Bucketing.LshTablesProperty -> lshTables.toString,
              graft.io.Bucketing.LshBitsProperty -> bits.toString)
            time("batch:bands-write") {
              if (!bandsLive) {
                graft.io.Bucketing.dropTable(spark, bandsTbl)
                graft.io.Bucketing.writePartitionedBucketedMulti(bands, bandsTbl,
                  "batch_id", Seq("t", "bucket"), 8)
                graft.io.Bucketing.stampKind(spark, bandsTbl, "vec-bands")
                graft.io.Bucketing.stampProperties(spark, bandsTbl, geom)
              } else {
                graft.io.Bucketing.appendPartialInto(bsp, bands, bandsTbl,
                  "vec-bands", id)
              }
            }
            time("batch:vecs-write") {
              if (!vecsLive) {
                graft.io.Bucketing.dropTable(spark, vecsTbl)
                graft.io.Bucketing.writePartitionedBucketed(vecs, vecsTbl,
                  "batch_id", "corpus_id", 8)
                graft.io.Bucketing.stampKind(spark, vecsTbl, "vec-payload")
                graft.io.Bucketing.stampProperties(spark, vecsTbl, geom)
              } else {
                graft.io.Bucketing.appendPartialInto(bsp, vecs, vecsTbl,
                  "vec-payload", id)
              }
            }
            time("batch:cadence") {
              Seq(bandsTbl, vecsTbl).foreach(t =>
                graft.io.Bucketing.maintainIndex(spark, t, 4))
            }
          })
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        Seq(bandsTbl, vecsTbl).foreach { t =>
          if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
        }
        graft.io.TempPaths.markComplete(ckpt)
      }
      val verdicts = time("probe-build") {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          graft.ops.Similarity.incrementalCosineVerdictsAgainstIndex(spark,
              emb.filter(col("vec_id") % 5 === 0), bandsTbl, vecsTbl,
              threshold = 0.45)
            .localCheckpoint()
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
      val n = time("probe-materialize")(verdicts.queryExecution.toRdd.count())
      val repTotal = (System.nanoTime() - repT0) / 1e9
      val metered = acc.values.sum -
        acc.getOrElse("batch:repair", 0.0) -
        acc.getOrElse("batch:bands-write", 0.0) -
        acc.getOrElse("batch:vecs-write", 0.0) -
        acc.getOrElse("batch:cadence", 0.0) // inner phases nest in stream-total
      println(f"PROFILE_Q71 rep$rep total=$repTotal%7.3f s (metered=$metered%7.3f) rows=$n bits=$bits")
      acc.foreach { case (k, v) => println(f"PROFILE_Q71   $k%-22s $v%7.3f s") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      graft.io.StateStores.unloadAllQuietly()
    }
    spark.stop()
  }
}
