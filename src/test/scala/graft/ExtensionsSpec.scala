package graft

import graft.io.LandingZone
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** SQL surface of the native expressions via SparkSessionExtensions,
  * plus landing-zone file orchestration. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers vec_dot and friends for SQL use") {
    spark.sparkContext // ensure the shared context exists first
    // getOrCreate returns any active session, which would skip extensions:
    // clear, build a sibling session on the same context, then restore
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = s2.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0).getDouble(0)
      assert(dot === 11.0)
      val sh = s2.sql(
        "SELECT simhash64(array('a','b','a')) AS h").collect()(0).getLong(0)
      val sh2 = s2.sql(
        "SELECT simhash64(array('a','a','b')) AS h").collect()(0).getLong(0)
      assert(sh === sh2) // order-insensitive (bag semantics)
      val j = s2.sql(
        "SELECT array_jaccard(array('x','y'), array('y','z')) AS j").collect()(0).getDouble(0)
      assert(math.abs(j - 1.0 / 3.0) < 1e-12)
      val agree = s2.sql(
        "SELECT sig_agreement(array(1L,2L,3L,4L), array(1L,9L,3L,8L)) AS a")
        .collect()(0).getDouble(0)
      assert(agree === 0.5)
      assert(s2.sql("SELECT minhash_sig(array('a','b','c'), 2) AS s")
        .collect()(0).getSeq[Long](0).length === 64)
      assert(s2.sql("SELECT char_ngrams('abcd', 3) AS g")
        .collect()(0).getSeq[String](0) === Seq("abc", "bcd"))
      // 60-bit replayable simhash: top nibble clear, same bag semantics
      val m1 = s2.sql("SELECT simhash_md5(array('a','b','a')) AS h")
        .collect()(0).getLong(0)
      val m2 = s2.sql("SELECT simhash_md5(array('a','a','b')) AS h")
        .collect()(0).getLong(0)
      assert(m1 === m2 && (m1 >>> 60) === 0L)
      assert(s2.sql("SELECT vec_sum(array(1.0D, 2.5D, -0.5D)) AS s")
        .collect()(0).getDouble(0) === 3.0)
      assert(s2.sql("SELECT word_ngrams(array('a','b','a','b'), 2) AS g")
        .collect()(0).getSeq[String](0) === Seq("a b", "b a", "a b"))
      assert(s2.sql("SELECT subvectors(array(1.0D, 2.0D, 3.0D, 4.0D), 2) AS sv")
        .collect()(0).getSeq[Seq[Double]](0) === Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    } finally {
      // do NOT stop s2 (it shares the SparkContext); restore the default
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("landing zone: quarantine, archive, clean") {
    val dir = Files.createTempDirectory("lz")
    val landing = dir.resolve("landing").toString
    new java.io.File(landing).mkdirs()
    Files.write(java.nio.file.Paths.get(landing, "a.csv"), "x".getBytes)
    Files.write(java.nio.file.Paths.get(landing, "b.csv"), "y".getBytes)
    Files.write(java.nio.file.Paths.get(landing, "c.txt"), "z".getBytes)
    assert(LandingZone.listCsv(landing).map(new java.io.File(_).getName).toSet
      === Set("a.csv", "b.csv"))
    LandingZone.quarantine(Seq(s"$landing/a.csv"), dir.resolve("errors").toString)
    assert(new java.io.File(dir.resolve("errors").resolve("a.csv").toString).exists())
    LandingZone.archive(Seq(s"$landing/b.csv"), dir.resolve("archive").toString)
    assert(!new java.io.File(landing, "b.csv").exists())
    LandingZone.clean(landing)
    assert(new java.io.File(landing).list().isEmpty)
  }

  test("landing zone and triage accept scheme URIs (file://)") {
    val dir = Files.createTempDirectory("lzuri")
    val landing = dir.resolve("landing")
    new java.io.File(landing.toString).mkdirs()
    Files.write(landing.resolve("ok.csv"),
      ("customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost\n" +
        "7,5,widget,2024-01-01,6,4.0,3,12.0").getBytes)
    Files.write(landing.resolve("bad.csv"), "foo,bar\n1,2".getBytes)
    val landingUri = "file://" + landing
    val listed = LandingZone.listCsv(landingUri)
    assert(listed.size === 2 && listed.forall(_.startsWith("file:")))
    val (ok, bad) = graft.ingest.SalesIngest.triage(listed)
    assert(ok.map(new java.io.File(_).getName) === Seq("ok.csv"))
    assert(bad.keys.map(new java.io.File(_).getName).toSet === Set("bad.csv"))
    val archived = LandingZone.archive(ok, "file://" + dir.resolve("archive"))
    assert(archived.size === 1 &&
      new java.io.File(dir.resolve("archive").resolve("ok.csv").toString).exists())
  }
}
