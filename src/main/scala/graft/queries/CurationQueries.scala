package graft.queries

import graft.Tables
import graft.ops.{Clustering, Packing, Sampling, TextAnalysis, Urls}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, count, lit, min, upper, when}

/** Corpus-curation catalog: repetition quality metrics, boilerplate
  * gating, sequence packing, and embedding-space clustering — the
  * training-data steps downstream of dedup/quality filtering. Every
  * entry is oracle-checked; the packing oracle replays the sequential
  * next-fit state machine as a recursive CTE, and the k-means oracle
  * replays the Knuth-scramble centroid sample + argmax assignment the
  * same way the IVF oracle (RecallQueries p25) does.
  */
object CurationQueries {

  // p34 — Gopher-style repetition metrics (word-bigram multiset)
  def repetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(spark, dir), n = 2)

  val repetitionSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
      |  FROM documents),
      |g AS (SELECT doc_id,
      |    unnest(CASE WHEN len(w) < 2 THEN [text]
      |      ELSE [w[i] || ' ' || w[i+1] for i in range(1, len(w))] END) AS gram
      |  FROM t),
      |c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_ngrams,
      |  round(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_ngram_frac,
      |  round(CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
      |    / SUM(cnt), 6) AS dup_ngram_frac
      |FROM c GROUP BY doc_id""".stripMargin

  // p35 — sequence packing (greedy next-fit per (source, id-shard))
  def seqPacking(spark: SparkSession, dir: String): DataFrame =
    Packing.packSequences(Tables.documents(spark, dir),
      capacity = 512, shards = 8)

  val seqPackingSql: String =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, source, doc_id % 8 AS bucket,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (SELECT d.*, row_number() OVER (PARTITION BY source, bucket
      |    ORDER BY doc_id) AS rn FROM d),
      |p AS (
      |  SELECT source, bucket, rn, doc_id, n_tokens,
      |    CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS tok_offset,
      |    n_tokens AS fill
      |  FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.source, o.bucket, o.rn, o.doc_id, o.n_tokens,
      |    CASE WHEN p.fill + o.n_tokens <= 512 THEN p.seq_id
      |         ELSE p.seq_id + 1 END,
      |    CASE WHEN p.fill + o.n_tokens <= 512 THEN p.fill
      |         ELSE CAST(0 AS BIGINT) END,
      |    CASE WHEN p.fill + o.n_tokens <= 512 THEN p.fill + o.n_tokens
      |         ELSE o.n_tokens END
      |  FROM o JOIN p ON o.source = p.source AND o.bucket = p.bucket
      |    AND o.rn = p.rn + 1)
      |SELECT doc_id, source, bucket, seq_id, tok_offset, n_tokens
      |FROM p""".stripMargin

  // p36 — boilerplate/quality gate with per-rule flags
  def boilerplate(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.boilerplateFlags(Tables.documents(spark, dir))

  val boilerplateSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
      |  FROM documents),
      |f AS (SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_tokens,
      |    round(CAST(len(text) - (len(w) - 1) AS DOUBLE) / len(w), 6)
      |      AS mean_word_len,
      |    round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
      |      AS type_token_ratio,
      |    len(list_intersect(w, ['a', 'the'])) > 0 AS has_stopword
      |  FROM t)
      |SELECT f.*,
      |  (n_tokens BETWEEN 20 AND 10000)
      |    AND (mean_word_len BETWEEN 2.0 AND 12.0)
      |    AND type_token_ratio >= 0.3 AND has_stopword AS keep
      |FROM f""".stripMargin

  // p37 — one k-means step over embeddings (k = 8 scrambled-sample seeds)
  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    Clustering.kmeansStep(Tables.embeddings(spark, dir), k = 8)

  val kmeansStepSql: String = {
    import RecallQueries.{cosSql => _, dotSql, normSql}
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
       |  FROM embeddings
       |  ORDER BY ((vec_id % 1048576) * 2654435761) % 4294967296, vec_id LIMIT 8),
       |sc AS (SELECT e.vec_id, e.embedding, c.cent_id,
       |    ${dotSql("e.embedding", "c.cent_emb")} /
       |      (${normSql("e.embedding")} * ${normSql("c.cent_emb")}) AS cos
       |  FROM embeddings e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, embedding, cent_id AS cell, cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, cent_id DESC) AS rn FROM sc) WHERE rn = 1),
       |w AS (SELECT cell, cos,
       |    list_sum([CAST(x AS DOUBLE) for x in embedding]) AS comp_sum
       |  FROM asg)
       |SELECT cell, COUNT(*) AS n_members,
       |  round(CAST(SUM(CAST(round(cos, 6) AS DECIMAL(28,6))) AS DOUBLE)
       |    / COUNT(*), 6) AS mean_cos,
       |  round(CAST(SUM(CAST(round(comp_sum, 6) AS DECIMAL(28,6))) AS DOUBLE)
       |    / COUNT(*), 6) AS new_centroid_comp_sum
       |FROM w GROUP BY cell""".stripMargin
  }

  // p38 — domain mixture sampling: per-source keep rates (the "30% web,
  // 60% code" knob of a training mix), content-keyed so membership is
  // stable across reruns/engines. Reported as a per-source mixture audit;
  // the sample itself is Sampling.stratifiedSample over `source`.
  private val mixRates = Map("src0" -> 10, "src1" -> 25, "src2" -> 50)

  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sampling
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val kept = Sampling
      .stratifiedSample(docs, col("source"), col("text"), mixRates)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        round(coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_docs"), 6)
          .as("kept_frac"))
  }

  val domainMixSql: String = {
    val rateCase = mixRates.toSeq.sortBy(_._1)
      .map { case (s, p) => s"WHEN '$s' THEN $p" }
      .mkString("CASE source ", " ", " ELSE 100 END")
    s"""WITH k AS (
       |  SELECT source, COUNT(*) AS n_kept FROM documents
       |  WHERE CAST(('0x' || substring(md5(text), 1, 4)) AS INTEGER) % 100
       |    < $rateCase
       |  GROUP BY source),
       |t AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
       |SELECT t.source, t.n_docs, coalesce(k.n_kept, 0) AS n_kept,
       |  round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / t.n_docs, 6)
       |    AS kept_frac
       |FROM t LEFT JOIN k ON k.source = t.source""".stripMargin
  }

  // q42 — GROUPING SETS with grouping() provenance flags: the arbitrary-
  // set sibling of rollup (q15) and cube (q23). Expand emits one copy of
  // each row per set; partial aggregation contains it before the shuffle.
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_gs")
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM v_orders_gs
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"""
        .stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"""
      .stripMargin

  /** p45 — embedding-space outlier pruning: cosine of every vector to
    * the corpus-mean embedding, below-threshold flagged (the prune-far-
    * from-centroid companion of SemDeDup's prune-near-duplicates; on the
    * zero-centered fixture −0.15 flags a real ~5% tail). The oracle
    * replays the per-dimension decimal means, the list assembly, and the
    * left-to-right cosine — the whole geometry, not just the flags. */
  def centroidOutliers(spark: SparkSession, dir: String): DataFrame =
    Clustering.centroidOutliers(Tables.embeddings(spark, dir))

  // range(1, 65) pins the fixture's embedding dim=64 contract (TESTDATA
  // .md; RecallQueries.cosSql hardcodes the same bound). The Scala side
  // adapts to the actual array length, so a fixture dim change breaks
  // ONLY the oracles — loudly, as a hash mismatch on every vector row.
  val centroidOutliersSql: String = {
    import RecallQueries.cosSql
    s"""WITH comps AS (
       |  SELECT t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS v
       |  FROM embeddings, unnest(range(1, 65)) t(i)),
       |cent AS (
       |  SELECT pos, CAST(SUM(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE) /
       |    (SELECT COUNT(*) FROM embeddings) AS m
       |  FROM comps GROUP BY pos),
       |c AS (SELECT list(m ORDER BY pos) AS cm FROM cent)
       |SELECT vec_id, centroid_cos, centroid_cos < -0.15 AS is_outlier
       |FROM (SELECT e.vec_id, ${cosSql("e.embedding", "c.cm")} AS centroid_cos
       |      FROM embeddings e CROSS JOIN c)""".stripMargin
  }

  /** p46 — BPE merge-pair statistics: top-20 adjacent character pairs
    * within tokens, with multiplicity — the ranking that picks a BPE
    * tokenizer's first merge. The oracle replays the multiset pair
    * extraction as a per-token list comprehension. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpePairStats(Tables.documents(spark, dir))

  val bpePairsSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |p AS (
      |  SELECT unnest([substring(tok, i, 2) for i in range(1, len(tok))]) AS pair
      |  FROM tok WHERE len(tok) >= 2),
      |c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      |  FROM p GROUP BY pair),
      |r AS (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, pair) AS rn
      |  FROM c)
      |SELECT pair, n_occurrences FROM r WHERE rn <= 20""".stripMargin

  /** p80 — BPE tokenizer APPLICATION: learn the top-10 merges from the
    * corpus (p46's ranking) and ENCODE every document with them — the
    * step a training pipeline actually ships. Spark applies the merge
    * table as 10 chained native `replace` passes over bracket-wrapped
    * character sequences (exact symbol-space greedy BPE —
    * `ops/TextAnalysis.bpeEncodeTokens`); the oracle learns the same
    * table in SQL and replays the encode as a RECURSIVE CTE, one merge
    * rule per recursion step, on the same bracket device. Output is
    * per-doc scalar counts + an md5 of the full encoded text, so a
    * hash match certifies every piece boundary of every token. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = TextAnalysis.bpeLearnMerges(docs, 10)
    // the oracle's recursive replay unrolls EXACTLY 10 merge steps and
    // emits zero rows if the recursion stops short — fail loudly here
    // instead of shipping a confusing whole-result mismatch when a
    // degenerate corpus slice yields fewer than 10 distinct pairs
    require(merges.size == 10,
      s"p80 oracle contract needs exactly 10 learned merges, corpus gave ${merges.size}")
    TextAnalysis.bpeEncode(docs, merges)
  }

  val bpeEncodeSql: String =
    """WITH RECURSIVE mtok AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |mp AS (
      |  SELECT unnest([substring(t, i, 2) for i in range(1, len(t))]) AS pair
      |  FROM mtok WHERE len(t) >= 2),
      |mc AS (SELECT pair, COUNT(*) AS n FROM mp GROUP BY pair),
      |merges AS (
      |  SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS rn
      |  FROM mc QUALIFY rn <= 10),
      |tok AS (
      |  SELECT doc_id, i.v AS pos, string_split(text, ' ')[i.v + 1] AS tok
      |  FROM documents,
      |    unnest(range(len(string_split(text, ' ')))) i(v)),
      |enc AS (
      |  SELECT doc_id, pos, 0 AS step,
      |    regexp_replace(tok, '(?s)(.)', chr(1) || '\1' || chr(2), 'g') AS s
      |  FROM tok
      |  UNION ALL
      |  SELECT e.doc_id, e.pos, e.step + 1,
      |    replace(e.s,
      |      chr(1) || substring(m.pair, 1, 1) || chr(2) ||
      |      chr(1) || substring(m.pair, 2, 1) || chr(2),
      |      chr(1) || m.pair || chr(2))
      |  FROM enc e JOIN merges m ON m.rn = e.step + 1),
      |fin AS (
      |  SELECT doc_id, pos,
      |    replace(replace(replace(s, chr(2) || chr(1), ' '),
      |      chr(1), ''), chr(2), '') AS enc_tok
      |  FROM enc WHERE step = 10)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(len(string_split(enc_tok, ' '))) AS BIGINT) AS n_pieces,
      |  md5(array_to_string(list(enc_tok ORDER BY pos), chr(10)))
      |    AS encoded_md5
      |FROM fin GROUP BY doc_id""".stripMargin

  /** p48 — quality-weighted sampling: keep probability = the p07 quality
    * score, membership content-keyed (md5 bucket / 10000 < score) — the
    * soft alternative to hard quality thresholds, deterministic across
    * reruns, partitionings, and engines. The oracle replays the quality
    * formula, the fine-grained bucket, and the comparison verbatim. */
  def qualitySample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_score"))
    Sampling.qualityWeightedSample(
        docs.select(col("doc_id"), col("text")).join(q, Seq("doc_id")),
        col("text"), col("quality_score"))
      .select(col("doc_id"), col("bucket"), col("quality_score"), col("is_kept"))
  }

  val qualitySampleSql: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the','a','of','and','to','is'))) AS n_stop
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, text,
      |    0.4 * (CAST(n_uniq_tokens AS DOUBLE) / n_tokens) +
      |    0.3 * (CAST(n_stop AS DOUBLE) / n_tokens) +
      |    0.3 * least((CAST(length(text) - (n_tokens - 1) AS DOUBLE) / n_tokens)
      |          / 10.0, 1.0) AS quality_score
      |  FROM t),
      |b AS (
      |  SELECT doc_id, quality_score,
      |    CAST(CAST(('0x' || substring(md5(text), 1, 4)) AS INTEGER) % 10000
      |      AS BIGINT) AS bucket
      |  FROM q)
      |SELECT doc_id, bucket, quality_score,
      |  CAST(bucket AS DOUBLE) / 10000.0 < quality_score AS is_kept
      |FROM b""".stripMargin

  /** p69 — URL canonicalization + canonical-URL dedup (`ops/Urls`).
    * The fixture ships no URLs, so messy ones are synthesized in-query
    * from (doc_id, source) with every normalization hazard the
    * canonicalizer handles: scheme case + http/https variance, WWW.
    * prefix, host case, explicit :port, trailing slash, utm_* tracking
    * params AROUND a real param, fragment. The operator then genuinely
    * PARSES the messy string back apart with native regexp/array
    * functions (no UDF — the whole pass is one narrow projection) and
    * groups by canonical URL. The oracle reconstructs the canonical
    * form from first principles (generator arithmetic, never parsing),
    * so a hash match proves the parser recovered exactly the canonical
    * identity every messy variant encodes.
    *
    * The canonical identity (source, tld, path id, query) is a function
    * of doc_id mod 180 = lcm(20 sources, 9 path ids, 4 query presence,
    * 3 query ids) with the tld riding on the source — so at ≥360 docs
    * every canonical URL collapses 2+ messy variants and the groupBy is
    * a REAL dedup (n_docs > 1), hash-checked per group, not a
    * 1:1 rename of doc_ids. */
  def urlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val idm = (n: Int) => col("doc_id") % n
    // non-canonical hazards use moduli COPRIME to the 180-cycle of the
    // canonical identity, so members of one canonical group really are
    // DIFFERENT messy strings (scheme/www/case/port/slash/fragment all
    // vary within a group) that only canonicalization can merge
    val messy = Tables.documents(spark, dir).select(col("doc_id"), concat(
      when(idm(7) < 4, lit("https")).otherwise(lit("HTTP")), lit("://"),
      when(idm(11) === 0, lit("WWW.")).otherwise(lit("")),
      when(idm(13) === 0, upper(col("source"))).otherwise(col("source")),
      lit(".example."),
      when(org.apache.spark.sql.functions.length(col("source")) === 4,
        lit("org")).otherwise(lit("net")),
      when(idm(17) === 0, lit(":8080")).otherwise(lit("")),
      lit("/articles/"), idm(9),
      when(idm(19) === 0, lit("/")).otherwise(lit("")),
      when(idm(4) === 0, concat(lit("?utm_source=feed&id="), idm(3),
          lit("&utm_medium=rss")))
        .when(idm(4) === 1, concat(lit("?id="), idm(3)))
        .otherwise(lit("")),
      when(idm(23) === 0, lit("#sec")).otherwise(lit(""))).as("url"))
    messy
      .select(col("doc_id"), Urls.canonicalize(col("url")).as("canonical_url"),
        Urls.registeredDomain(col("url")).as("registered_domain"))
      .groupBy("canonical_url", "registered_domain")
      .agg(count("*").as("n_docs"), min("doc_id").cast("long").as("rep_doc_id"))
  }

  val urlCanonicalizeSql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    'https://' || lower(source) || '.example.' ||
      |      CASE WHEN length(source) = 4 THEN 'org' ELSE 'net' END ||
      |      '/articles/' || CAST(doc_id % 9 AS VARCHAR) ||
      |      CASE WHEN doc_id % 4 IN (0, 1)
      |        THEN '?id=' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END
      |      AS canonical_url,
      |    'example.' ||
      |      CASE WHEN length(source) = 4 THEN 'org' ELSE 'net' END
      |      AS registered_domain
      |  FROM documents)
      |SELECT canonical_url, registered_domain,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
      |FROM c GROUP BY canonical_url, registered_domain""".stripMargin

  /** p77 — registered-domain extraction under the pinned public-suffix
    * snapshot (`ops/PublicSuffixes`) + per-domain accounting, the
    * follow-on to p69 the round-14 verdict prescribed: the two-label
    * stand-in merged every `.co.uk` site into one "domain", so any
    * per-domain cap or mixture keyed on it mis-bucketed. Messy URLs are
    * synthesized in-query from doc_id with one host family per rule
    * SHAPE the PSL uses — plain TLD, 2-label ccTLD (`co.uk`,
    * `com.au`), PRIVATE-section suffix (`github.io`), wildcard
    * (`*.ck`), exception (`!www.ck`), 2-label wildcard
    * (`*.kawasaki.jp`), its exception (`!city.kawasaki.jp`), and the
    * deepest plain shape (`pvt.k12.ma.us`) — wrapped in the usual
    * canonicalization hazards (scheme case, WWW., host case, port,
    * userinfo). The oracle reconstructs the registered domain from
    * generator arithmetic (never parsing, never consulting a list), so
    * a hash match proves the longest-match lookup recovered exactly
    * the registrable identity each messy host encodes. Families 5 and
    * 7 collapse ALL their hosts into one domain each (www.ck,
    * city.kawasaki.jp) — a real many-to-one merge only the exception
    * rules produce. */
  def registeredDomains(spark: SparkSession, dir: String): DataFrame = {
    val idm = (n: Int) => col("doc_id") % n
    val site = idm(20)
    val j = idm(5)
    val host = when(idm(9) === 0, concat(lit("s"), site, lit(".com")))
      .when(idm(9) === 1, concat(lit("s"), site, lit(".co.uk")))
      .when(idm(9) === 2, concat(lit("s"), site, lit(".com.au")))
      .when(idm(9) === 3, concat(lit("s"), site, lit(".github.io")))
      .when(idm(9) === 4, concat(lit("a"), site, lit(".w"), j, lit(".ck")))
      .when(idm(9) === 5, concat(lit("sub"), site, lit(".www.ck")))
      .when(idm(9) === 6,
        concat(lit("x"), site, lit(".ward"), j, lit(".kawasaki.jp")))
      .when(idm(9) === 7, concat(lit("f"), site, lit(".city.kawasaki.jp")))
      .otherwise(concat(lit("sch"), site, lit(".pvt.k12.ma.us")))
    val messy = Tables.documents(spark, dir).select(col("doc_id"), concat(
      when(idm(7) < 4, lit("https")).otherwise(lit("HTTP")), lit("://"),
      when(idm(23) === 0, lit("crawler@")).otherwise(lit("")),
      when(idm(11) === 0, lit("WWW.")).otherwise(lit("")),
      when(idm(13) === 0, upper(host)).otherwise(host),
      when(idm(17) === 0, lit(":443")).otherwise(lit("")),
      lit("/p/"), idm(9),
      when(idm(19) === 0, lit("#top")).otherwise(lit(""))).as("url"))
    messy
      .select(Urls.registeredDomain(col("url")).as("registered_domain"))
      .groupBy("registered_domain")
      .agg(count(lit(1)).as("n_docs"))
  }

  val registeredDomainsSql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 9 AS INTEGER)
      |      WHEN 0 THEN 's' || CAST(doc_id % 20 AS VARCHAR) || '.com'
      |      WHEN 1 THEN 's' || CAST(doc_id % 20 AS VARCHAR) || '.co.uk'
      |      WHEN 2 THEN 's' || CAST(doc_id % 20 AS VARCHAR) || '.com.au'
      |      WHEN 3 THEN 's' || CAST(doc_id % 20 AS VARCHAR) || '.github.io'
      |      WHEN 4 THEN 'a' || CAST(doc_id % 20 AS VARCHAR) ||
      |        '.w' || CAST(doc_id % 5 AS VARCHAR) || '.ck'
      |      WHEN 5 THEN 'www.ck'
      |      WHEN 6 THEN 'x' || CAST(doc_id % 20 AS VARCHAR) ||
      |        '.ward' || CAST(doc_id % 5 AS VARCHAR) || '.kawasaki.jp'
      |      WHEN 7 THEN 'city.kawasaki.jp'
      |      ELSE 'sch' || CAST(doc_id % 20 AS VARCHAR) || '.pvt.k12.ma.us'
      |    END AS registered_domain
      |  FROM documents)
      |SELECT registered_domain, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM c GROUP BY registered_domain""".stripMargin

  /** p93 — temperature-scaled mixture allocation (τ = 0.5 via
    * IEEE-exact sqrt): per-source token budgets ∝ √share with
    * largest-remainder integer rounding so allocations sum to the
    * budget EXACTLY — see [[graft.ops.Sampling.temperatureAllocation]].
    * Oracle replays share → sqrt → 1e-6 re-quantization → truncating
    * division → remainder ranking in SQL. */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureAllocation(Tables.documents(spark, dir),
      col("source"),
      org.apache.spark.sql.functions.size(TextAnalysis.tokens(col("text"))))

  val temperatureMixtureSql: String =
    """WITH t AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT SUM(n_tokens) AS tt FROM t),
      |w AS (
      |  SELECT source, n_tokens,
      |    CAST(round(sqrt(n_tokens / CAST(tt AS DOUBLE)) * 1000000.0, 0)
      |      AS BIGINT) AS w6
      |  FROM t CROSS JOIN tot),
      |ws AS (SELECT SUM(w6) AS sw FROM w),
      |a AS (
      |  SELECT source, n_tokens, w6,
      |    (100000 * w6) // sw AS alloc, (100000 * w6) % sw AS rem
      |  FROM w CROSS JOIN ws),
      |lo AS (SELECT 100000 - SUM(alloc) AS leftover FROM a),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rn
      |      FROM a)
      |SELECT source, n_tokens, w6 AS weight6,
      |  CAST(alloc + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc_tokens
      |FROM r CROSS JOIN lo""".stripMargin

  /** p99 — tokenizer-vocabulary coverage / OOV audit: build the top-V
    * corpus vocabulary (count desc, token asc) and report per-language
    * instance coverage, OOV mass, and distinct OOV types — the audit
    * that catches a tokenizer silently degrading an under-represented
    * language into byte-fallback soup. Bounded TopK fold for the vocab
    * (no global sort), broadcast back for a single narrow coverage
    * pass — see [[graft.ops.TextAnalysis.vocabCoverage]]. The oracle
    * rebuilds the vocabulary and the whole audit in SQL. */
  def vocabCoverageAudit(spark: SparkSession, dir: String): DataFrame =
    // V = 16 on the fixture: the synthetic corpus draws from only 31
    // token types, so any V >= 31 makes the audit vacuously 100% —
    // 16 exercises the OOV path (coverage ~0.54, 15 OOV types per
    // language at sf0.01). Production vocabs pass the real V.
    TextAnalysis.vocabCoverage(Tables.documents(spark, dir), vocabSize = 16)

  val vocabCoverageSql: String =
    """WITH inst AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, COUNT(*) AS cnt FROM inst GROUP BY tok),
      |v AS (
      |  SELECT tok FROM (
      |    SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rn
      |    FROM c) WHERE rn <= 16),
      |j AS (
      |  SELECT i.lang, i.tok, v.tok IS NOT NULL AS iv
      |  FROM inst i LEFT JOIN v ON i.tok = v.tok),
      |a AS (
      |  SELECT lang, COUNT(*) AS n_instances,
      |    SUM(CASE WHEN iv THEN 1 ELSE 0 END) AS n_covered,
      |    COUNT(DISTINCT CASE WHEN NOT iv THEN tok END) AS n_distinct_oov
      |  FROM j GROUP BY lang)
      |SELECT lang, CAST(n_instances AS BIGINT) AS n_instances,
      |  CAST(n_covered AS BIGINT) AS n_covered,
      |  CAST(n_instances - n_covered AS BIGINT) AS n_oov,
      |  CAST(n_covered * 1000000 // n_instances AS BIGINT) AS cover6,
      |  CAST(n_distinct_oov AS BIGINT) AS n_distinct_oov
      |FROM a""".stripMargin

  /** p97 — the END-TO-END curation pipeline, composed: quality gate →
    * exact dedup (keep-first) → benchmark decontamination → seeded
    * exact-N budget selection → deterministic shard/position export,
    * one declarative DataFrame chain. Each stage is its family's
    * established device (p07 token gate, p01 md5 keep-first, p33
    * 8-gram suite join, p74 seeded order-and-take, p72 shard
    * shuffle) and Catalyst optimizes ACROSS the stage boundaries —
    * the composability a library user actually buys. The single
    * oracle replays the whole chain as one CTE stack, so the hash
    * match certifies not just each operator but their composition
    * (predicate ordering, join nullability, limit/exchange
    * placement). Scale shape: two gram-key shuffles (dedup hash agg,
    * contamination join), one bounded TakeOrdered selection, one
    * shard exchange — nothing quadratic, nothing driver-side. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{explode, md5, pmod, size}
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val pool = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val quality = pool.filter(size(TextAnalysis.tokens(col("text"))) >= 10)
    val keepers = quality.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = quality.join(keepers, Seq("doc_id"), "left_semi")
    val benchGrams = bench
      .select(explode(graft.ops.Dedup.shingles(col("text"), 8)).as("gram"))
      .distinct()
    val contaminated = deduped
      .select(col("doc_id"),
        explode(graft.ops.Dedup.shingles(col("text"), 8)).as("gram"))
      .join(benchGrams, Seq("gram")).select("doc_id").distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val selected = graft.ops.Selection.uniformSampleExact(clean, n = 200,
      salt = "pipe1sel")
    graft.ops.Selection.shardShuffle(selected, shards = 8,
        salt = "pipe1shard")
      .join(docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        Seq("doc_id"))
      .select(col("shard"), col("position"), col("doc_id"), col("n_tokens"))
  }

  val curationPipelineSql: String =
    """WITH pool AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS toks
      |  FROM documents WHERE doc_id % 10 <> 0),
      |q AS (SELECT * FROM pool WHERE len(toks) >= 10),
      |k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
      |d AS (SELECT q.doc_id, q.toks FROM q JOIN k USING (doc_id)),
      |bg AS (
      |  SELECT DISTINCT u.gram FROM (
      |    SELECT list_distinct([array_to_string(toks[i:i+7], ' ')
      |      for i in range(1, greatest(len(toks) - 7, 1) + 1)]) AS grams
      |    FROM (SELECT string_split(text, ' ') AS toks FROM documents
      |          WHERE doc_id % 10 = 0)) g,
      |    unnest(grams) AS u(gram)),
      |cont AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT doc_id, unnest(list_distinct(
      |      [array_to_string(toks[i:i+7], ' ')
      |       for i in range(1, greatest(len(toks) - 7, 1) + 1)])) AS gram
      |    FROM d) dg JOIN bg USING (gram)),
      |clean AS (
      |  SELECT doc_id FROM d
      |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
      |sel AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id,
      |      CAST(('0x' || substring(md5('pipe1sel:' ||
      |        CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS sample_key
      |    FROM clean)
      |  ORDER BY sample_key, doc_id LIMIT 200),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substring(md5('pipe1shard:' ||
      |      CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS shuffle_key
      |  FROM sel),
      |pos AS (
      |  SELECT doc_id, shuffle_key % 8 AS shard,
      |    ROW_NUMBER() OVER (PARTITION BY shuffle_key % 8
      |      ORDER BY shuffle_key, doc_id) AS position
      |  FROM sh)
      |SELECT p.shard, CAST(p.position AS BIGINT) AS position, p.doc_id,
      |  CAST(len(string_split(d2.text, ' ')) AS BIGINT) AS n_tokens
      |FROM pos p JOIN documents d2 USING (doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p97_curation_pipeline" -> (curationPipeline _),
    "p77_registered_domain" -> (registeredDomains _),
    "p69_url_canonicalize" -> (urlCanonicalize _),
    "p34_repetition_quality" -> (repetition _),
    "p45_centroid_outliers" -> (centroidOutliers _),
    "p46_bpe_pair_stats" -> (bpePairs _),
    "p80_bpe_encode" -> (bpeEncode _),
    "p48_quality_weighted_sample" -> (qualitySample _),
    "p35_seq_packing" -> (seqPacking _),
    "p36_boilerplate_filter" -> (boilerplate _),
    "p37_kmeans_step" -> (kmeansStep _),
    "p38_domain_mix" -> (domainMix _),
    "p93_temperature_mixture" -> (temperatureMixture _),
    "p99_vocab_coverage" -> (vocabCoverageAudit _),
    "q42_grouping_sets" -> (groupingSets _))

  val oracles: Map[String, String] = Map(
    "p97_curation_pipeline" -> curationPipelineSql,
    "p77_registered_domain" -> registeredDomainsSql,
    "p69_url_canonicalize" -> urlCanonicalizeSql,
    "p34_repetition_quality" -> repetitionSql,
    "p45_centroid_outliers" -> centroidOutliersSql,
    "p46_bpe_pair_stats" -> bpePairsSql,
    "p80_bpe_encode" -> bpeEncodeSql,
    "p48_quality_weighted_sample" -> qualitySampleSql,
    "p35_seq_packing" -> seqPackingSql,
    "p36_boilerplate_filter" -> boilerplateSql,
    "p37_kmeans_step" -> kmeansStepSql,
    "p38_domain_mix" -> domainMixSql,
    "p93_temperature_mixture" -> temperatureMixtureSql,
    "p99_vocab_coverage" -> vocabCoverageSql,
    "q42_grouping_sets" -> groupingSetsSql)
}
