package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity (SURVEY §2C): deterministic sampling (stratified
  * rebalancing and exact-N uniform), PII redaction, and TF-IDF term
  * scoring. Everything is expression-based and single-pass where the
  * semantics allow; the only joins are broadcast (scalar corpus stats) or
  * hash-partitioned on a key (term df).
  *
  * Sampling is HASH-based, never RNG-based: `rand()`-family sampling is
  * not reproducible across runs, engines, or cluster sizes (partition
  * seeding), which breaks the train/eval hygiene a data pipeline must
  * guarantee. An md5-derived bucket of the doc id gives every document a
  * stable [0,100) coordinate — the same doc is sampled on every rerun, and
  * the SAMPLE coordinate (md5 chars 5-8) is independent of the q48 SPLIT
  * coordinate (chars 1-4), so sampling doesn't skew the split.
  */
object CurationQ {

  /** Per-stratum deterministic sampling: keep a doc iff its hash bucket
    * falls under its stratum's percentage. One scan, no shuffle, no state;
    * at 100 TB the filter is codegen'd into the parquet scan. Strata
    * absent from `rates` keep `defaultPct`. */
  def stratifiedSample(docs: DataFrame, strataCol: String,
      rates: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require(rates.nonEmpty, "at least one stratum rate required")
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      s"rates must be percentages in [0,100]: $rates default=$defaultPct")
    require(rates.keys.forall(_.matches("[A-Za-z0-9_-]+")),
      s"stratum keys must be simple identifiers: ${rates.keys}")
    val b = TextQ.hashBucketExpr("instr", "doc_id", "STRING", offset = 5)
    val cases = rates.toSeq.sorted
      .map { case (k, p) => s"WHEN '$k' THEN $p" }.mkString(" ")
    docs.filter(expr(s"$b < CASE $strataCol $cases ELSE $defaultPct END"))
  }

  /** Exact-N deterministic uniform sample: order by a hash of the id and
    * take the first N — the distributed equivalent of a seeded reservoir,
    * but reproducible and rerun-stable. Spark plans this as
    * TakeOrderedAndProject (per-partition top-N + driver merge of N·P
    * rows), never a global sort. */
  def uniformSampleN(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    docs.orderBy(expr("md5(CAST(doc_id AS STRING))"), col("doc_id")).limit(n)
  }

  // PII patterns, in the order they are applied. Email runs first so its
  // digits can't be claimed by the phone pattern; the phone pattern is
  // anchored on '+' so it can never swallow a dotted IP octet. The regex
  // subset used (classes, bounded repeats) means Java regex (Spark) and
  // RE2 (DuckDB) match identically.
  private val piiPatterns = Seq(
    ("email", """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""", "<EMAIL>"),
    ("ip", """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}""", "<IP>"),
    ("phone", """\+\d{7,}""", "<PHONE>"))

  /** Redact emails, IPv4 addresses and +-prefixed phone numbers from
    * `textCol`, adding `n_email`/`n_ip`/`n_phone` match counts and the
    * `redacted` text. Counts are taken against the progressively-redacted
    * value, so one character span is only ever counted (and redacted)
    * once. Single-pass, codegen'd, no shuffle. */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    // function API with lit() patterns on purpose: a pattern routed
    // through expr()/SQL would lose its backslashes to string-literal
    // escaping (spark.sql.parser.escapedStringLiterals defaults false)
    piiPatterns.foldLeft(df.withColumn("redacted", col(textCol))) {
      case (acc, (name, pat, token)) =>
        acc
          .withColumn(s"n_$name",
            size(regexp_extract_all(col("redacted"), lit(pat), lit(0))).cast(LongType))
          .withColumn("redacted", regexp_replace(col("redacted"), pat, token))
    }

  /** Payment-card detection — the PII class regex alone cannot decide:
    * a 13–19-digit run is only a card number if its Luhn checksum holds
    * (ISO/IEC 7812), and treating every long digit run as PII would
    * shred order ids, timestamps and hashes across a web corpus.
    * Candidates are the MAXIMAL digit runs of `textCol` (regex greed
    * makes `[0-9]+` maximal in both engines, so a 20-digit run is one
    * too-long candidate, never a 19-digit sub-match), length-gated to
    * 13–19, then checksum-verified in exact integer arithmetic via the
    * `aggregate` HOF — fully codegen'd, single-pass, no shuffle, no UDF.
    *
    * Adds `card_candidates`/`card_valid` (the runs, for a downstream
    * redactor), `n_candidates`/`n_valid`, and `valid_hash` (md5 over the
    * sorted valid runs — the compact equality witness the q52 red_hash
    * convention uses). The oracle recomputes the checksum through
    * DuckDB's independent list-lambda machinery, so the hash-match
    * cross-checks the Luhn arithmetic itself, not just the plumbing. */
  def cardScan(df: DataFrame, textCol: String): DataFrame = {
    val luhnSum = """aggregate(sequence(1, length(r)), 0, (acc, i) ->
        acc + (CASE WHEN i % 2 = 0
          THEN CASE WHEN 2 * CAST(substr(r, length(r) - i + 1, 1) AS INT) > 9
            THEN 2 * CAST(substr(r, length(r) - i + 1, 1) AS INT) - 9
            ELSE 2 * CAST(substr(r, length(r) - i + 1, 1) AS INT) END
          ELSE CAST(substr(r, length(r) - i + 1, 1) AS INT) END))"""
    df.withColumn("card_candidates", expr(
        s"""filter(regexp_extract_all($textCol, '[0-9]+', 0),
             r -> length(r) >= 13 AND length(r) <= 19)"""))
      .withColumn("card_valid", expr(
        s"filter(card_candidates, r -> $luhnSum % 10 = 0)"))
      .withColumn("n_candidates", size(col("card_candidates")).cast(LongType))
      .withColumn("n_valid", size(col("card_valid")).cast(LongType))
      .withColumn("valid_hash",
        md5(concat_ws(",", array_sort(col("card_valid")))))
  }

  /** Oracle fixture of [[cardScan]]: the corpus carries no card numbers,
    * so the query plants (q52-style, identically in both engines) a
    * known-valid card on every third doc, a doc_id-varying 16-digit
    * number whose Luhn validity varies naturally, and two decoys that
    * must never match (12-digit too short, 20-digit too long). */
  private val q178 = {
    def planted(cast: String) =
      s"""text || CASE WHEN doc_id % 3 = 0 THEN ' pay 4532015112830366'
            ELSE '' END ||
          ' ref ' || CAST(4000000000000000 + (doc_id * 137) % 1000000 AS $cast) ||
          ' id 123456789012 long 12345678901234567890'"""
    GQuery(
      "q178_luhn_cards",
      (s, dir) => cardScan(
          t(s, dir, "documents").withColumn("raw", expr(planted("STRING"))),
          "raw")
        .select(col("doc_id"), col("n_candidates"), col("n_valid"),
          col("valid_hash"))
        .orderBy(col("doc_id")),
      Some("""WITH raw AS (SELECT doc_id, """ + planted("VARCHAR") + """ AS raw
          FROM documents),
        runs AS (SELECT doc_id,
            list_filter(regexp_extract_all(raw, '[0-9]+'),
              r -> length(r) >= 13 AND length(r) <= 19) AS cands
          FROM raw),
        v AS (SELECT doc_id, cands,
            list_filter(cands, r -> list_sum(list_transform(
              range(1, length(r) + 1), i ->
                CASE WHEN i % 2 = 0
                  THEN CASE WHEN 2 * CAST(substring(r, length(r) - i + 1, 1) AS INT) > 9
                    THEN 2 * CAST(substring(r, length(r) - i + 1, 1) AS INT) - 9
                    ELSE 2 * CAST(substring(r, length(r) - i + 1, 1) AS INT) END
                  ELSE CAST(substring(r, length(r) - i + 1, 1) AS INT) END))
              % 10 = 0) AS valid
          FROM runs)
        SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
          CAST(len(valid) AS BIGINT) AS n_valid,
          md5(coalesce(array_to_string(list_sort(valid), ','), '')) AS valid_hash
        FROM v ORDER BY doc_id"""))
  }

  /** TF-IDF term scores, integer-scaled so both engines rank identically:
    * `score = tf * ((1000000 * n_docs) div df)` — exact BIGINT arithmetic,
    * no cross-engine log/double drift. Two hash-partitioned aggregations
    * (tf on (doc, term), df on term), one equi-join on term, and the
    * corpus size joins in as a broadcast scalar. Returns the top
    * `perDoc` terms per document. */
  def tfidfTop(docs: DataFrame, perDoc: Int = 3): DataFrame = {
    require(perDoc >= 1, s"perDoc must be >= 1, got $perDoc")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // df is a WINDOW count over tok on the tf rows (which ARE the distinct
    // (doc, term) pairs): the corpus is exploded and aggregated exactly
    // once, and df attaches with one tok-shuffle — no second branch for
    // Catalyst to prune into a non-reusable subtree, no join
    val wdf = Window.partitionBy(col("tok"))
    val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.withColumn("df", count(lit(1)).over(wdf))
      .crossJoin(broadcast(n))
      .withColumn("score", expr("tf * ((1000000 * n_docs) div df)"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= perDoc)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"), col("rn"))
  }

  /** Cross-document boilerplate removal (the RefinedWeb/CCNet "repeated
    * lines" filter, expressed over fixed-width word chunks since the
    * corpus has no line structure): split each document into
    * `chunkWords`-word segments, drop every segment whose text occurs in
    * more than `maxDocs` distinct documents (nav bars, footers, licence
    * blocks), and rebuild the remaining text in order.
    *
    * Scale shape is strictly linear: one explode, one hash aggregation on
    * chunk text (the frequency pass), one anti join against the
    * boilerplate set (tiny by construction — only chunks repeated across
    * >maxDocs docs — so AQE broadcasts it), and one per-doc reassembly
    * aggregation. No pairwise work anywhere; at 100 TB hash the chunk to
    * a 64-bit key for the frequency pass if chunk strings dominate
    * shuffle bytes.
    *
    * Returns (doc_id, n_chunks, n_kept, cleaned) — docs whose every chunk
    * was boilerplate survive with n_kept=0 and empty text.
    */
  def boilerplateChunks(docs: DataFrame, chunkWords: Int = 8, maxDocs: Int = 2): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val cw = chunkWords
    // round-15: the chunk table feeds the frequency pass AND the
    // flag-join reassembly — a lazy checkpoint runs the tokenize+chunk
    // explode once instead of twice (it materializes inside the
    // consumer's own job; no extra action)
    val chunked = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("chunks", expr(
        s"""transform(sequence(0, CAST(ceil(size(toks) / $cw.0) AS INT) - 1),
            i -> array_join(slice(toks, i * $cw + 1, $cw), ' '))"""))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("pos", "chunk")))
      .localCheckpoint(false)
    val boiler = chunked.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > maxDocs)
      .select(col("chunk"), lit(true).as("is_boiler"))
    // flag-join (not anti-join) so ONE per-doc aggregation yields the
    // total count, the kept count and the rebuilt text together — the
    // corpus is scanned/exploded twice (frequency pass + this one), not
    // three times, and all-boilerplate docs survive without a backfill
    // join. boiler chunks are distinct, so the left join never fans out.
    chunked.join(boiler, Seq("chunk"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("is_boiler").isNull, 1)).as("n_kept"),
        // collect_list skips the nulls (boilerplate rows) and its order is
        // partition-dependent; array_sort on (pos, chunk) structs restores
        // document order deterministically
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_boiler").isNull, struct(col("pos"), col("chunk"))))),
            x => x.getField("chunk")),
          " ").as("cleaned"))
  }

  /** Oracle fixture of [[boilerplateChunks]] (8-word chunks, boilerplate =
    * shared by >2 docs); the rebuilt text ships as its sha256 so the
    * compare proves byte-identical reconstruction compactly. */
  private val q57 = GQuery(
    "q57_boilerplate_chunks",
    (s, dir) => boilerplateChunks(t(s, dir, "documents"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        sha2(col("cleaned"), 256).as("clean_hash"))
      .orderBy(col("doc_id")),
    Some("""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      c AS (SELECT doc_id,
          UNNEST(range(CAST(ceil(len(l) / 8.0) AS INT))) AS pos,
          UNNEST(list_transform(range(CAST(ceil(len(l) / 8.0) AS INT)),
                 i -> array_to_string(l[i*8+1 : i*8+8], ' '))) AS chunk
        FROM docs),
      boiler AS (SELECT chunk FROM c GROUP BY chunk
                 HAVING COUNT(DISTINCT doc_id) > 2),
      totals AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY 1),
      rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
          string_agg(chunk, ' ' ORDER BY pos) AS cleaned
        FROM c WHERE chunk NOT IN (SELECT chunk FROM boiler)
        GROUP BY 1)
    SELECT t.doc_id, t.n_chunks, COALESCE(r.n_kept, 0) AS n_kept,
           sha256(COALESCE(r.cleaned, '')) AS clean_hash
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY t.doc_id"""))

  /** Oracle fixture of [[stratifiedSample]]: rebalance the corpus by
    * downsampling dominant English (20%) and keeping half of everything
    * else — the language-rebalancing step of a pretraining mix. */
  private val q51 = {
    val b = TextQ.hashBucketExpr("strpos", "doc_id", "VARCHAR", offset = 5)
    GQuery(
      "q51_stratified_sample",
      (s, dir) => stratifiedSample(t(s, dir, "documents"), "lang",
          Map("en" -> 20, "de" -> 50, "es" -> 50, "fr" -> 50, "zh" -> 50))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, lang
        FROM documents
        WHERE $b < CASE lang WHEN 'de' THEN 50 WHEN 'en' THEN 20
                             WHEN 'es' THEN 50 WHEN 'fr' THEN 50
                             WHEN 'zh' THEN 50 ELSE 0 END
        ORDER BY doc_id"""))
  }

  /** Weighted sampling without replacement — PRIORITY SAMPLING (Duffield,
    * Lund & Thorup, JACM 2007): per stratum, each row draws priority
    * `q = w / u` with u uniform in (0, 1] and the k largest priorities
    * are the sample; the (k+1)-th priority τ is the threshold, and
    * `ŵ = max(w, τ)` is the Horvitz–Thompson-style adjusted weight whose
    * subset sums are unbiased with near-optimal variance — THE way to
    * take a weighted corpus slice (sample long docs proportionally, keep
    * estimates of total tokens exact in expectation) that a plain
    * weighted-Bernoulli pass can't match at fixed k.
    *
    * Determinism discipline: u derives from md5(id) (first 8 hex chars →
    * a 32-bit integer + 1), priorities are pure BIGINT arithmetic
    * `(w << 32) DIV u` — both engines replay the identical draw, no RNG,
    * no seed plumbing, retry-stable (the q252 scheme). Weights must be
    * in [1, 10⁹] — wider would overflow the shifted product — and fail
    * LOUDLY, never silently clamp.
    *
    * Scale shape: top-k per stratum is NOT one rank window per stratum
    * (a mega-stratum serializes onto one reducer — the q220 lesson).
    * Stage 1 ranks within (stratum, u mod B) salted groups — B spreads
    * any stratum over B reducers — keeping k+1 per group: every overall
    * top-(k+1) row is within its group's top-(k+1), so the cut is EXACT.
    * Stage 2 re-ranks the ≤ B·(k+1) survivors per stratum — bounded
    * rows, trivially sized partitions. The oracle replays the NAIVE
    * single-window rank, so the hash-match proves the salted tournament
    * result-identical. Strata with ≤ k rows return whole with NULL τ
    * (the sample IS the stratum; ŵ = w exactly). */
  def prioritySample(rows: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, k: Int, buckets: Int = 64): DataFrame = {
    require(k >= 1, s"prioritySample: k=$k")
    require(buckets >= 1, s"prioritySample: buckets=$buckets")
    val scored = rows.select(
        col(stratumCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast(LongType).as("w"))
      .withColumn("w",
        when(col("w") < 1L || col("w") > 1000000000L, expr(
          "CAST(raise_error('prioritySample: weight out of [1, 1e9]') AS BIGINT)"))
          .otherwise(col("w")))
      .withColumn("u", expr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) + 1L"))
      .withColumn("priority", expr("(w * 4294967296L) DIV u"))
    val w1 = Window.partitionBy(col("stratum"), pmod(col("u"), lit(buckets)))
      .orderBy(col("priority").desc, col("id"))
    val w2 = Window.partitionBy(col("stratum"))
      .orderBy(col("priority").desc, col("id"))
    val survivors = scored
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k + 1)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k + 1)
    val tau = survivors.filter(col("rn") === k + 1)
      .select(col("stratum"), col("priority").as("tau"))
    survivors.filter(col("rn") <= k)
      .join(tau, Seq("stratum"), "left")
      .select(col("stratum"), col("rn").cast(LongType).as("rn"),
        col("id"), col("w"),
        col("priority"), col("tau"),
        greatest(col("w"), coalesce(col("tau"), lit(0L))).as("w_hat"))
  }

  /** Oracle fixture of [[prioritySample]]: 20 docs per lang, weighted by
    * n_chars, B = 8 salt buckets; the oracle ranks with ONE window per
    * stratum (the naive form the salted tournament must equal). */
  private val q259 = GQuery(
    "q259_priority_sample",
    (s, dir) => prioritySample(t(s, dir, "documents"),
      "lang", "doc_id", "n_chars", k = 20, buckets = 8)
      .orderBy(col("stratum"), col("rn")),
    Some("""WITH sc AS (SELECT lang AS stratum, doc_id AS id,
          n_chars AS w,
          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) + 1 AS u
        FROM documents),
      pr AS (SELECT stratum, id, w, u,
          (w * 4294967296) // u AS priority
        FROM sc),
      rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY stratum
          ORDER BY priority DESC, id) AS rn FROM pr),
      tau AS (SELECT stratum, priority AS tau FROM rk WHERE rn = 21)
      SELECT r.stratum, r.rn, r.id, r.w, r.priority, t.tau,
        GREATEST(r.w, COALESCE(t.tau, 0)) AS w_hat
      FROM rk r LEFT JOIN tau t ON t.stratum = r.stratum
      WHERE r.rn <= 20
      ORDER BY r.stratum, r.rn"""))

  /** Column-profile drift card — the schema-stability gate a 100 TB
    * ingest runs on every batch BEFORE appending it: per column, row and
    * null counts, exact distinct cardinality and min/max for the
    * reference slice vs the candidate slice, plus the null-rate drift in
    * ppm. A column whose null rate jumps or whose cardinality collapses
    * is an upstream schema/extraction break that every downstream
    * operator would silently absorb — this card is where it gets loud.
    *
    * Plan: ONE corpus scan into a single aggregation row (every metric a
    * conditional agg on the `is_ref` flag), then the 1-row result
    * explodes into |cols| card rows — no per-column scans, no joins.
    * The exact per-column distinct counts make Spark plan an Expand of
    * ×(2·|cols|) before the partial aggregation — the documented cost of
    * exactness on a BOUNDED column list; a wide-table variant would swap
    * `countDistinct` for the q12b HLL sketch and keep the same shape.
    * Min/max stringify AFTER aggregating on the native type; callers
    * should avoid raw doubles here (float-to-string formatting is
    * engine-specific — the q90 rule). */
  def profileDrift(df: DataFrame, cols: Seq[String],
      refCol: String = "is_ref"): DataFrame = {
    require(cols.nonEmpty, "profileDrift: empty column list")
    val sides = Seq("ref" -> col(refCol), "cur" -> !col(refCol))
    val aggs = cols.flatMap { c =>
      sides.flatMap { case (tag, pred) =>
        Seq(
          sum(when(pred, 1L).otherwise(0L)).as(s"__n_${tag}_$c"),
          sum(when(pred && col(c).isNull, 1L).otherwise(0L))
            .as(s"__z_${tag}_$c"),
          countDistinct(when(pred, col(c))).as(s"__d_${tag}_$c"),
          min(when(pred, col(c))).cast(StringType).as(s"__lo_${tag}_$c"),
          max(when(pred, col(c))).cast(StringType).as(s"__hi_${tag}_$c"))
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_ref_$c").as("n_ref"), col(s"__n_cur_$c").as("n_cur"),
        expr(s"(1000000 * __z_ref_$c) DIV greatest(__n_ref_$c, 1L)")
          .as("null_ppm_ref"),
        expr(s"(1000000 * __z_cur_$c) DIV greatest(__n_cur_$c, 1L)")
          .as("null_ppm_cur"),
        col(s"__d_ref_$c").as("distinct_ref"),
        col(s"__d_cur_$c").as("distinct_cur"),
        col(s"__lo_ref_$c").as("min_ref"), col(s"__hi_ref_$c").as("max_ref"),
        col(s"__lo_cur_$c").as("min_cur"), col(s"__hi_cur_$c").as("max_cur"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .withColumn("null_drift_ppm",
        abs(col("null_ppm_ref") - col("null_ppm_cur")))
  }

  /** Oracle fixture of [[profileDrift]]: events split into reference
    * (even event_id) vs candidate (odd) halves over three stringly/
    * integral columns — same-distribution halves, so the card reads
    * near-zero drift and any nonzero rows are real sampling variance. */
  private val q261 = GQuery(
    "q261_profile_drift",
    (s, dir) => profileDrift(
      t(s, dir, "events").withColumn("is_ref", expr("event_id % 2 = 0")),
      Seq("event_type", "user_id", "props"))
      .orderBy(col("column")),
    Some("""WITH e AS (SELECT *, event_id % 2 = 0 AS is_ref FROM events),
      m AS (
        SELECT 'event_type' AS "column",
          SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
          SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur,
          SUM(CASE WHEN is_ref AND event_type IS NULL THEN 1 ELSE 0 END) AS z_ref,
          SUM(CASE WHEN NOT is_ref AND event_type IS NULL THEN 1 ELSE 0 END) AS z_cur,
          COUNT(DISTINCT CASE WHEN is_ref THEN event_type END) AS distinct_ref,
          COUNT(DISTINCT CASE WHEN NOT is_ref THEN event_type END) AS distinct_cur,
          CAST(MIN(CASE WHEN is_ref THEN event_type END) AS VARCHAR) AS min_ref,
          CAST(MAX(CASE WHEN is_ref THEN event_type END) AS VARCHAR) AS max_ref,
          CAST(MIN(CASE WHEN NOT is_ref THEN event_type END) AS VARCHAR) AS min_cur,
          CAST(MAX(CASE WHEN NOT is_ref THEN event_type END) AS VARCHAR) AS max_cur
        FROM e
        UNION ALL
        SELECT 'user_id',
          SUM(CASE WHEN is_ref THEN 1 ELSE 0 END),
          SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END),
          SUM(CASE WHEN is_ref AND user_id IS NULL THEN 1 ELSE 0 END),
          SUM(CASE WHEN NOT is_ref AND user_id IS NULL THEN 1 ELSE 0 END),
          COUNT(DISTINCT CASE WHEN is_ref THEN user_id END),
          COUNT(DISTINCT CASE WHEN NOT is_ref THEN user_id END),
          CAST(MIN(CASE WHEN is_ref THEN user_id END) AS VARCHAR),
          CAST(MAX(CASE WHEN is_ref THEN user_id END) AS VARCHAR),
          CAST(MIN(CASE WHEN NOT is_ref THEN user_id END) AS VARCHAR),
          CAST(MAX(CASE WHEN NOT is_ref THEN user_id END) AS VARCHAR)
        FROM e
        UNION ALL
        SELECT 'props',
          SUM(CASE WHEN is_ref THEN 1 ELSE 0 END),
          SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END),
          SUM(CASE WHEN is_ref AND props IS NULL THEN 1 ELSE 0 END),
          SUM(CASE WHEN NOT is_ref AND props IS NULL THEN 1 ELSE 0 END),
          COUNT(DISTINCT CASE WHEN is_ref THEN props END),
          COUNT(DISTINCT CASE WHEN NOT is_ref THEN props END),
          CAST(MIN(CASE WHEN is_ref THEN props END) AS VARCHAR),
          CAST(MAX(CASE WHEN is_ref THEN props END) AS VARCHAR),
          CAST(MIN(CASE WHEN NOT is_ref THEN props END) AS VARCHAR),
          CAST(MAX(CASE WHEN NOT is_ref THEN props END) AS VARCHAR)
        FROM e)
      SELECT "column", CAST(n_ref AS BIGINT) AS n_ref,
        CAST(n_cur AS BIGINT) AS n_cur,
        CAST((1000000 * z_ref) // GREATEST(n_ref, 1) AS BIGINT) AS null_ppm_ref,
        CAST((1000000 * z_cur) // GREATEST(n_cur, 1) AS BIGINT) AS null_ppm_cur,
        CAST(distinct_ref AS BIGINT) AS distinct_ref,
        CAST(distinct_cur AS BIGINT) AS distinct_cur,
        min_ref, max_ref, min_cur, max_cur,
        CAST(ABS((1000000 * z_ref) // GREATEST(n_ref, 1)
          - (1000000 * z_cur) // GREATEST(n_cur, 1)) AS BIGINT)
          AS null_drift_ppm
      FROM m ORDER BY "column""""))

  /** Waterfilling mixture allocation — the sizing computation behind a
    * training-data recipe: each domain should contribute `share_ppm` of
    * a `budget`-token mix, but a domain holds only `avail` tokens; when
    * one runs dry its shortfall redistributes over the others IN
    * PROPORTION to their shares (the waterfilling solution — raise one
    * water level λ, each domain gives min(avail, share·λ)). The answer a
    * recipe owner needs BEFORE sampling: who caps, what the achievable
    * level is, and each domain's exact allocation.
    *
    * Exact integer construction both engines replay: breakpoint levels
    * `λ_d = avail·10¹² DIV share_ppm` sort ascending; the mix total AT
    * each breakpoint is an inclusive avail prefix + λ_d·(remaining
    * share) DIV 10¹² (tie-safe: rows sharing a breakpoint share the
    * same total via a per-λ max); a domain caps iff its breakpoint
    * total still falls short of the budget. The final level solves the
    * budget on the uncapped share mass; truncation leaves at most
    * |domains| tokens unallocated (reported, never hidden). A budget at
    * or above Σ avail caps everyone and surfaces the shortfall.
    *
    * Plan: everything after the caller's avail aggregation rides the
    * |domains|-row table — two window passes over it (histogram-sized,
    * the sanctioned class) and one broadcast of the capped-mass scalar.
    * Requires Σ share_ppm = 10⁶ exactly and positive shares — LOUDLY. */
  def waterfillAllocation(domains: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0L, s"waterfillAllocation: budget=$budget")
    val checked = domains
      .withColumn("__tot", sum(col("share_ppm")).over(Window.partitionBy()))
      .withColumn("share_ppm",
        when(col("__tot") =!= 1000000L || col("share_ppm") <= 0L, expr(
          "CAST(raise_error('waterfillAllocation: share_ppm must be positive and sum to 1e6') AS BIGINT)"))
          .otherwise(col("share_ppm")))
      .drop("__tot")
      .withColumn("lam",
        expr("(CAST(avail AS DECIMAL(38,0)) * 1000000000000) DIV share_ppm"))
    val wOrd = Window.orderBy(col("lam"), col("domain"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLam = Window.partitionBy(col("lam"))
    val flagged = checked
      .withColumn("__ai", sum(col("avail")).over(wOrd))
      .withColumn("__si", sum(col("share_ppm")).over(wOrd))
      .withColumn("__a_at", max(col("__ai")).over(wLam))
      .withColumn("__s_at", max(col("__si")).over(wLam))
      .withColumn("__total_at", expr(
        """__a_at + (CAST(lam AS DECIMAL(38,0)) * (1000000 - __s_at))
           DIV 1000000000000"""))
      .withColumn("capped", col("__total_at") < budget)
    val capMass = flagged.filter(col("capped"))
      .agg(coalesce(sum(col("avail")), lit(0L)).as("__a_cap"),
        coalesce(sum(col("share_ppm")), lit(0L)).as("__s_cap"))
    flagged.crossJoin(broadcast(capMass))
      .withColumn("level",
        when(col("__s_cap") < 1000000L, expr(
          s"""(CAST($budget - __a_cap AS DECIMAL(38,0)) * 1000000000000)
             DIV (1000000 - __s_cap)"""))
          .otherwise(lit(null).cast(LongType)))
      .withColumn("allocated",
        when(col("capped"), col("avail")).otherwise(expr(
          "CAST((CAST(share_ppm AS DECIMAL(38,0)) * level) DIV 1000000000000 AS BIGINT)")))
      .withColumn("achieved_total",
        sum(col("allocated")).over(Window.partitionBy()))
      .withColumn("shortfall", greatest(lit(budget) -
        col("achieved_total"), lit(0L)))
      .select(col("domain"), col("avail"), col("share_ppm"), col("capped"),
        col("allocated"), col("achieved_total"), col("shortfall"))
  }

  /** Oracle fixture of [[waterfillAllocation]]: domains are document
    * sources, avail their exact token counts, target shares RANKED by
    * name (share ∝ rank over the triangle sum, exact-10⁶ remainder to
    * the first — both engines replay it), budget 60% of the corpus —
    * the near-uniform avails mean the HIGH-share tail genuinely caps
    * and its slack redistributes down the rank order. */
  private val q262 = GQuery(
    "q262_waterfill_mix",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .groupBy(col("source").as("domain"))
        .agg(sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("avail"))
      val n = Window.partitionBy()
      val dims = toks
        .withColumn("__n", count(lit(1)).over(n))
        .withColumn("__rk", row_number()
          .over(Window.orderBy(col("domain"))).cast(LongType))
        .withColumn("__k",
          expr("1000000 DIV ((__n * (__n + 1)) DIV 2)"))
        .withColumn("share_ppm",
          col("__rk") * col("__k") +
            when(col("__rk") === 1L,
              expr("1000000 - __k * ((__n * (__n + 1)) DIV 2)"))
              .otherwise(lit(0L)))
        .withColumn("__budget",
          expr("(60 * sum(avail) OVER ()) DIV 100"))
      val budget = dims.select(col("__budget")).head.getLong(0)
      waterfillAllocation(
        dims.select(col("domain"), col("avail"), col("share_ppm")), budget)
        .orderBy(col("domain"))
    },
    Some("""WITH toks AS (SELECT source AS domain,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
        FROM documents GROUP BY 1),
      dims AS (SELECT domain, avail,
          ROW_NUMBER() OVER (ORDER BY domain)
              * (1000000 // ((COUNT(*) OVER () * (COUNT(*) OVER () + 1)) // 2))
            + CASE WHEN ROW_NUMBER() OVER (ORDER BY domain) = 1
                THEN 1000000
                  - (1000000 // ((COUNT(*) OVER () * (COUNT(*) OVER () + 1)) // 2))
                    * ((COUNT(*) OVER () * (COUNT(*) OVER () + 1)) // 2)
                ELSE 0 END AS share_ppm,
          (60 * SUM(avail) OVER ()) // 100 AS budget
        FROM toks),
      lamd AS (SELECT *,
          (CAST(avail AS HUGEINT) * 1000000000000) // share_ppm AS lam
        FROM dims),
      pre AS (SELECT *,
          SUM(avail) OVER (ORDER BY lam, domain
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ai,
          SUM(share_ppm) OVER (ORDER BY lam, domain
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS si
        FROM lamd),
      at AS (SELECT *,
          MAX(ai) OVER (PARTITION BY lam) AS a_at,
          MAX(si) OVER (PARTITION BY lam) AS s_at
        FROM pre),
      fl AS (SELECT *,
          (a_at + (CAST(lam AS HUGEINT) * (1000000 - s_at))
            // 1000000000000) < budget AS capped
        FROM at),
      cm AS (SELECT COALESCE(SUM(CASE WHEN capped THEN avail END), 0) AS a_cap,
          COALESCE(SUM(CASE WHEN capped THEN share_ppm END), 0) AS s_cap
        FROM fl),
      lv AS (SELECT f.*, cm.a_cap, cm.s_cap,
          CASE WHEN cm.s_cap < 1000000 THEN
            (CAST(f.budget - cm.a_cap AS HUGEINT) * 1000000000000)
              // (1000000 - cm.s_cap)
          END AS level
        FROM fl f CROSS JOIN cm),
      al AS (SELECT *,
          CASE WHEN capped THEN avail
            ELSE CAST((CAST(share_ppm AS HUGEINT) * level)
              // 1000000000000 AS BIGINT) END AS allocated
        FROM lv)
      SELECT domain, avail, CAST(share_ppm AS BIGINT) AS share_ppm,
        capped, CAST(allocated AS BIGINT) AS allocated,
        CAST(SUM(allocated) OVER () AS BIGINT) AS achieved_total,
        CAST(GREATEST(budget - SUM(allocated) OVER (), 0) AS BIGINT)
          AS shortfall
      FROM al ORDER BY domain"""))

  /** Oracle fixture of [[uniformSampleN]] (N=100). */
  private val q56 = GQuery(
    "q56_uniform_sample",
    (s, dir) => uniformSampleN(t(s, dir, "documents"), 100)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang FROM (
        SELECT doc_id, lang FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT 100)
      ORDER BY doc_id"""))

  /** Oracle fixture of [[redactPii]]. The synthetic corpus carries no PII,
    * so the query PLANTS a deterministic contact line per document (built
    * from doc_id, identically in both engines) and then proves the
    * redaction strips it: counts per category plus the sha256 of the
    * redacted text (byte-identical redaction, compact output). */
  private val q52 = {
    def planted(cast: String) =
      s"""text || ' contact user' || CAST(doc_id AS $cast) ||
          '@example.com or 10.0.' || CAST(doc_id % 256 AS $cast) || '.' ||
          CAST(doc_id % 7 AS $cast) || ' tel +1555012' || CAST(doc_id % 10 AS $cast)"""
    val redactedSql = piiPatterns.foldLeft("raw") {
      case (acc, (_, pat, token)) => s"regexp_replace($acc, '$pat', '$token', 'g')"
    }
    val countsSql = piiPatterns
      .scanLeft(("", "raw")) { case ((_, prev), (name, pat, token)) =>
        (s"len(regexp_extract_all($prev, '$pat')) AS n_$name",
          s"regexp_replace($prev, '$pat', '$token', 'g')")
      }.tail.map(_._1)
    GQuery(
      "q52_pii_redaction",
      (s, dir) => redactPii(
          t(s, dir, "documents").withColumn("raw", expr(planted("STRING"))),
          "raw")
        .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
          sha2(col("redacted"), 256).as("red_hash"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, ${countsSql.mkString(", ")},
          sha256($redactedSql) AS red_hash
        FROM (SELECT doc_id, ${planted("VARCHAR")} AS raw FROM documents)
        ORDER BY doc_id"""))
  }

  /** Oracle fixture of [[tfidfTop]] (top 3 terms per doc). */
  private val q53 = GQuery(
    "q53_tfidf_topk",
    (s, dir) => tfidfTop(t(s, dir, "documents"))
      .orderBy(col("doc_id"), col("rn")),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      scored AS (SELECT doc_id, tok, tf, df,
          tf * ((1000000 * n_docs) // df) AS score
        FROM tf JOIN dfreq USING (tok), n),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY score DESC, tok) AS rn FROM scored)
    SELECT doc_id, tok, tf, df, score, rn
    FROM ranked WHERE rn <= 3
    ORDER BY doc_id, rn"""))

  private val stopWords = Seq("the", "a", "of", "and", "data", "row")

  /** The composite keep/drop decision a curation pipeline actually ships:
    * every per-document signal — length, stopword ratio (gibberish
    * proxy), intra-doc repetition (Gopher dup-ratio), PII presence —
    * folded into one `reason` bitmask (0 = keep). Reasons are bits, not
    * a first-match CASE, so operators see every failing filter at once
    * and filter-attrition reports are a single group-by on `reason`.
    *
    * Cost: the expression signals are a single scan; repetition is the
    * one aggregation (3-gram shingle stats), joined back on doc_id.
    * Bits: 1 = too short, 2 = stopword ratio below floor, 4 = repetitive,
    * 8 = contains PII.
    */
  def curationVerdict(docs: DataFrame, minTokens: Int = 20,
      minStopRatio: Double = 0.05, maxDupRatio: Double = 0.5): DataFrame = {
    val stop = stopWords.map(w => s"'$w'").mkString(", ")
    val rep = TextQ.repetitionStats(docs).select(col("doc_id"), col("dup_ratio"))
    redactPii(docs, "text")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop", expr(
        s"CAST(size(filter(split(text, ' '), x -> x IN ($stop))) AS BIGINT)"))
      .withColumn("stop_ratio",
        round(col("n_stop").cast(DoubleType) / col("n_tokens"), 6))
      .withColumn("n_pii",
        col("n_email") + col("n_ip") + col("n_phone"))
      .join(rep, Seq("doc_id"), "left")
      // docs under 3 tokens have no shingle row: not repetitive, by definition
      .withColumn("dup_ratio", coalesce(col("dup_ratio"), lit(0.0)))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, 1L).otherwise(0L)
          + when(col("stop_ratio") < minStopRatio, 2L).otherwise(0L)
          + when(col("dup_ratio") > maxDupRatio, 4L).otherwise(0L)
          + when(col("n_pii") > 0, 8L).otherwise(0L))
      .withColumn("keep", (col("reason") === 0L).cast(LongType))
  }

  /** Oracle fixture of [[curationVerdict]] — the full per-doc verdict
    * table (fixture corpus carries no PII, so bit 8 stays 0 here; the
    * spec plants PII to prove that bit). */
  private val q63 = {
    val stop = stopWords.map(w => s"'$w'").mkString(", ")
    GQuery(
      "q63_curation_verdict",
      (s, dir) => curationVerdict(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
          col("dup_ratio"), col("n_pii"), col("reason"), col("keep"))
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        sh AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
               FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)),
        rep AS (SELECT doc_id,
            ROUND(1.0 - (1.0 * COUNT(DISTINCT s)) / COUNT(*), 6) AS dup_ratio
          FROM sh GROUP BY doc_id),
        sig AS (SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            ROUND(CAST(len(list_filter(string_split(text, ' '),
                x -> x IN ($stop))) AS DOUBLE)
              / len(string_split(text, ' ')), 6) AS stop_ratio,
            CAST(len(regexp_extract_all(text,
                '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) +
              len(regexp_extract_all(text,
                '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) +
              len(regexp_extract_all(text, '\\+\\d{7,}')) AS BIGINT) AS n_pii
          FROM documents),
        v AS (SELECT sig.doc_id, n_tokens, stop_ratio,
            COALESCE(rep.dup_ratio, 0.0) AS dup_ratio, n_pii
          FROM sig LEFT JOIN rep ON sig.doc_id = rep.doc_id)
      SELECT doc_id, n_tokens, stop_ratio, dup_ratio, n_pii,
        (CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END
         + CASE WHEN stop_ratio < 0.05 THEN 2 ELSE 0 END
         + CASE WHEN dup_ratio > 0.5 THEN 4 ELSE 0 END
         + CASE WHEN n_pii > 0 THEN 8 ELSE 0 END)::BIGINT AS reason,
        (CASE WHEN n_tokens >= 20 AND stop_ratio >= 0.05
               AND dup_ratio <= 0.5 AND n_pii = 0
          THEN 1 ELSE 0 END)::BIGINT AS keep
      FROM v
      ORDER BY doc_id"""))
  }

  /** Sequence packing (concat-and-chunk): assign documents to fixed
    * token-budget training sequences. Docs are concatenated in a
    * deterministic order and chunked every `budget` tokens; a document's
    * bin is where its first token lands, and `offset` is its start
    * position within that bin — exactly the bookkeeping a pretraining
    * dataloader needs to slice packed sequences.
    *
    * Packing is per `shardCol` group (a corpus shard: source, split,
    * …): a single global running sum would serialize on one partition,
    * so the window partitions by shard and shards pack in parallel —
    * the layout real pipelines use (each worker packs its own shard).
    * One explode-free pass: token counts come from `size(split(...))`,
    * the running sum is a window aggregation.
    */
  def packSequences(docs: DataFrame, shardCol: String, budget: Int): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(end_tok - n_tokens) div $budget"))
      .withColumn("offset", expr(s"(end_tok - n_tokens) % $budget"))
  }

  /** Oracle fixture of [[packSequences]] (shard = source, 2048-token
    * sequences): per-doc bin/offset assignments, plus enough columns to
    * pin the running sum itself. */
  private val q61 = GQuery(
    "q61_sequence_packing",
    (s, dir) => packSequences(t(s, dir, "documents"), "source", budget = 2048)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("end_tok"),
        col("bin"), col("offset"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, source, n_tokens, end_tok,
        CAST((end_tok - n_tokens) // 2048 AS BIGINT) AS bin,
        CAST((end_tok - n_tokens) % 2048 AS BIGINT) AS "offset"
      FROM (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_tok
        FROM documents)
      ORDER BY doc_id"""))

  /** Oracle fixture of [[graft.etl.Layout.zorder2]]: Morton codes for a
    * 128×128 grid derived from doc_id, proving the interleave arithmetic
    * bit-for-bit cross-engine (the layout writers cluster files by this
    * value). */
  private val q60 = {
    val z = graft.etl.Layout.zorder2Sql("x", "y", bits = 7)
    GQuery(
      "q60_zorder_curve",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 128).as("x"),
          ((col("doc_id") / 128).cast(LongType) % 128).as("y"))
        .withColumn("z", graft.etl.Layout.zorder2(col("x"), col("y"), bits = 7))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, x, y, $z AS z
        FROM (SELECT doc_id, doc_id % 128 AS x, (doc_id // 128) % 128 AS y
              FROM documents)
        ORDER BY doc_id"""))
  }

  /** Oracle fixture of [[graft.functions.HilbertIndex2]]: Hilbert indices
    * for the same 128×128 grid as q60, proving the quadrant-rotation walk
    * bit-for-bit cross-engine (the oracle replays the per-level state
    * machine as a recursive CTE). Hilbert vs Morton is the layout
    * writer's locality upgrade: consecutive indices are ALWAYS adjacent
    * cells, so each range-clustered file covers one compact rectangle —
    * LayoutSpec measures the worst consecutive-cell jump (1 vs 129). */
  private val q173 = GQuery(
    "q173_hilbert_curve",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 128).as("x"),
        ((col("doc_id") / 128).cast(LongType) % 128).as("y"))
      .withColumn("h",
        graft.functions.LayoutFunctions.hilbert2(col("x"), col("y"), bits = 7))
      .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE pts AS (
        SELECT doc_id, doc_id % 128 AS x, (doc_id // 128) % 128 AS y
        FROM documents),
      walk(doc_id, x0, y0, x, y, s, d) AS (
        SELECT doc_id, x, y, x, y, 64::BIGINT, 0::BIGINT FROM pts
        UNION ALL
        SELECT doc_id, x0, y0,
          CASE WHEN (y & s) = 0
               THEN (CASE WHEN (x & s) > 0 THEN 127 - y ELSE y END)
               ELSE x END,
          CASE WHEN (y & s) = 0
               THEN (CASE WHEN (x & s) > 0 THEN 127 - x ELSE x END)
               ELSE y END,
          s // 2,
          d + s * s * (CASE WHEN (x & s) > 0 AND (y & s) > 0 THEN 2
                            WHEN (x & s) > 0 THEN 3
                            WHEN (y & s) > 0 THEN 1
                            ELSE 0 END)
        FROM walk WHERE s > 0)
    SELECT doc_id, x0 AS x, y0 AS y, d AS h
    FROM walk WHERE s = 0
    ORDER BY doc_id"""))

  /** Data-driven mixture rebalancing — the "data mixing" step that turns a
    * raw crawl into a target pretraining mix. Given target corpus shares
    * per stratum (in ppm), compute per-stratum sampling rates that hit the
    * target mix by DOWNSAMPLING only: the binding stratum (scarcest
    * relative to its target) keeps 100% and every other stratum scales
    * down proportionally, so no stratum is asked to produce docs it
    * doesn't have. All arithmetic is exact BIGINT ppm — no doubles — so
    * reruns and engines agree bit-for-bit.
    *
    * One count aggregation + three broadcast scalars; the per-stratum
    * output is dimension-table sized at any corpus scale. Strata absent
    * from `targets` get no row (rate 0 — dropped by [[rebalanceToMix]]).
    *
    * Returns (stratum, n_docs, actual_ppm, target_ppm, rate_ppm,
    * expected_kept), where expected_kept = the exact doc count a
    * rate-perfect sampler would keep.
    */
  def mixtureWeights(docs: DataFrame, strataCol: String,
      targets: Map[String, Long]): DataFrame = {
    require(targets.nonEmpty, "at least one target share required")
    require(targets.values.forall(p => p > 0 && p <= 1000000),
      s"target shares must be ppm in (0, 1e6]: $targets")
    val spark = docs.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.sortBy(_._1).toDF(strataCol, "target_ppm")
    // ONE corpus scan: total is the sum of the per-stratum counts, not a
    // second docs aggregation (the count exchange is reused across all
    // three consumers; only post-aggregation stratum-sized rows recompute)
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    // tgt-preserving left join (counts — stratum-sized post-aggregation —
    // is the broadcast build side; hinting the PRESERVED side of an outer
    // join is a silent no-op) + raise: a target stratum with ZERO corpus
    // docs makes a downsample-only mix unreachable — fail the job loudly
    // rather than silently report rates that pretend the mix was achieved
    val withTgt = tgt.join(broadcast(counts), Seq(strataCol), "left")
      .withColumn("n_docs",
        when(col("n_docs").isNull, raise_error(
          concat(lit("mixture target stratum absent from corpus: "),
            col(strataCol))).cast(LongType))
          .otherwise(col("n_docs")))
    val total = counts.agg(sum(col("n_docs")).as("total"))
    // K = docs a full-corpus-equivalent holds, set by the binding stratum
    val k = withTgt.agg(min(expr("(1000000 * n_docs) div target_ppm")).as("k_scaled"))
    withTgt.crossJoin(broadcast(total)).crossJoin(broadcast(k))
      .withColumn("actual_ppm", expr("(1000000 * n_docs) div total"))
      .withColumn("expected_kept", expr("(k_scaled * target_ppm) div 1000000"))
      .withColumn("rate_ppm",
        expr("least(1000000, (1000000 * expected_kept) div n_docs)"))
      .select(col(strataCol), col("n_docs"), col("actual_ppm"),
        col("target_ppm"), col("rate_ppm"), col("expected_kept"))
  }

  /** Apply [[mixtureWeights]]: keep a doc iff its ppm hash coordinate
    * falls under its stratum's computed rate. The rate table broadcasts
    * (it is stratum-sized), so the apply pass is one scan with a
    * broadcast join — no extra shuffle at any corpus size. The ppm
    * coordinate uses md5 chars 9-13, independent of the q48 SPLIT
    * (chars 1-4) and q51 SAMPLE (chars 5-8) coordinates. */
  def rebalanceToMix(docs: DataFrame, strataCol: String,
      targets: Map[String, Long]): DataFrame = {
    val rates = mixtureWeights(docs, strataCol, targets)
      .select(col(strataCol), col("rate_ppm"))
    val b = TextQ.ppmBucketExpr("instr", "doc_id", "STRING", offset = 9)
    docs.join(broadcast(rates), Seq(strataCol))
      .filter(expr(s"$b < rate_ppm"))
      .drop("rate_ppm")
  }

  /** Bigram language-model quality score — the perplexity-filter analogue
    * of a CCNet/KenLM pass, in exact integer arithmetic. The corpus IS the
    * model: P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) with add-one smoothing
    * over the corpus vocabulary, and a document's score is the average
    * smoothed transition probability over its bigrams, in ppm. Natural
    * in-domain text scores high; shuffled/gibberish text scores low.
    * Integer-scaled (div, not log-sum) so scores are order-independent
    * and bit-identical cross-engine — a float log-prob sum is neither.
    *
    * Scale shape: one bigram explode aggregated ONCE per doc
    * ((doc,w1,w2) tf); the model counts attach as window sums over that
    * same relation (no second corpus pass, the q53 df trick), and the
    * vocabulary joins in as a broadcast scalar. Docs with fewer than two
    * tokens have no bigrams and drop out.
    *
    * Returns (doc_id, n_bigrams, score = Σ tf·p_ppm, avg_ppm).
    */
  def lmTransitionScore(docs: DataFrame): DataFrame = {
    val tf = docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
            i -> struct(element_at(toks, i) AS w1,
                        element_at(toks, i + 1) AS w2))""")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
    val w12 = Window.partitionBy(col("w1"), col("w2"))
    val w1 = Window.partitionBy(col("w1"))
    tf.withColumn("c12", sum(col("tf")).over(w12))
      .withColumn("c1", sum(col("tf")).over(w1))
      .crossJoin(broadcast(vocab))
      .withColumn("p_ppm", expr("(1000000 * (c12 + 1)) div (c1 + vocab)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("p_ppm")).as("score"))
      .withColumn("avg_ppm", expr("score div n_bigrams"))
  }

  /** Overlapping sliding-window chunking — the retrieval/embedding
    * chunker: every `stride` tokens starts a `window`-token chunk, so
    * context at a chunk boundary also appears intact inside a neighbor.
    * Documents shorter than `window` yield their single truncated chunk.
    * One explode, no shuffle, no state: at 100 TB this is a map-only
    * stage whose output feeds the embedding UDF batch-wise.
    *
    * Returns one row per chunk: (doc_id, chunk_idx, n_toks, chunk).
    */
  def chunkOverlap(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window]: stride=$stride window=$window")
    docs.withColumn("toks", split(col("text"), " "))
      .withColumn("nc", expr(
        s"CAST(ceil(greatest(size(toks) - $window, 0) / $stride.0) AS INT) + 1"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, nc - 1),
            i -> array_join(slice(toks, i * $stride + 1, $window), ' '))"""))
        .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
        size(split(col("chunk"), " ")).cast(LongType).as("n_toks"),
        col("chunk"))
  }

  /** Cap every stratum at `n` documents — the C4/Gopher "at most N docs
    * per host" guard against a single domain dominating the corpus.
    * Deterministic, not RNG: docs rank within their stratum by the md5
    * coordinate of their id (the q56 ordering), so the same N survive on
    * every run, engine and cluster size.
    *
    * One window shuffle on the stratum key. A mega-stratum serializes
    * into one task's sort; at that scale, prefilter with a ppm hash
    * threshold from the stratum's count (keeping a small superset) and
    * rank only the survivors — same result with bounded partitions,
    * at the cost of a count pass.
    *
    * Returns the input columns plus `rn` (the doc's rank within its
    * stratum, 1-based). */
  def capPerStratum(docs: DataFrame, strataCol: String, n: Int): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(expr("md5(CAST(doc_id AS STRING))"), col("doc_id"))
    docs.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= n)
  }

  /** Oracle fixture of [[capPerStratum]] (≤60 docs per language). */
  private val q67 = GQuery(
    "q67_domain_cap",
    (s, dir) => capPerStratum(t(s, dir, "documents"), "lang", 60)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        FROM documents)
      WHERE rn <= 60
      ORDER BY doc_id"""))

  /** Per-document weighted sampling: keep a doc with probability
    * `weightPpm`/1e6, where the weight is any integer ppm expression —
    * typically a quality score, so high-quality documents survive at a
    * higher rate (the "soft" quality filter / temperature-sampling
    * analogue, vs the hard cutoff of [[curationVerdict]]). Deterministic
    * like every sampler here: the decision compares the doc's md5 ppm
    * coordinate (chars 14-18 — independent of the split/sample/rebalance
    * coordinates) against its weight, so reruns keep identical docs.
    * Single codegen'd scan, no shuffle, no state. */
  def weightedSample(docs: DataFrame,
      weightPpm: org.apache.spark.sql.Column): DataFrame = {
    val b = TextQ.ppmBucketExpr("instr", "doc_id", "STRING", offset = 14)
    docs.filter(expr(b).cast(LongType) < weightPpm.cast(LongType))
  }

  /** Oracle fixture of [[weightedSample]] with weight = min(1e6,
    * n_chars·2000): longer docs keep proportionally more probability
    * mass, capped at certainty. */
  private val q71 = {
    val b = TextQ.ppmBucketExpr("strpos", "doc_id", "VARCHAR", offset = 14)
    GQuery(
      "q71_weighted_sample",
      (s, dir) => weightedSample(t(s, dir, "documents"),
          expr("least(1000000L, n_chars * 2000L)"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, lang, n_chars
        FROM documents
        WHERE $b < least(1000000, n_chars * 2000)
        ORDER BY doc_id"""))
  }

  // q64/q64b fixture mix: an equal five-way language split
  private val mixTargets: Map[String, Long] =
    Seq("de", "en", "es", "fr", "zh").map(_ -> 200000L).toMap
  private val mixTargetsSql: String = mixTargets.toSeq.sorted
    .map { case (k, v) => s"('$k', ${v}::BIGINT)" }.mkString(", ")

  /** Oracle fixture of [[mixtureWeights]]: rebalance the lang-skewed
    * corpus to an equal five-way mix. */
  private val q64 = GQuery(
    "q64_mixture_weights",
    (s, dir) => mixtureWeights(t(s, dir, "documents"), "lang", mixTargets)
      .orderBy(col("lang")),
    Some(s"""WITH tgt(lang, target_ppm) AS (VALUES $mixTargetsSql),
      counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      j AS (SELECT * FROM counts JOIN tgt USING (lang)),
      tot AS (SELECT COUNT(*) AS total FROM documents),
      k AS (SELECT MIN((1000000 * n_docs) // target_ppm) AS k_scaled FROM j)
    SELECT lang, n_docs,
      CAST((1000000 * n_docs) // total AS BIGINT) AS actual_ppm,
      target_ppm,
      CAST(least(1000000,
        (1000000 * ((k_scaled * target_ppm) // 1000000)) // n_docs) AS BIGINT)
        AS rate_ppm,
      CAST((k_scaled * target_ppm) // 1000000 AS BIGINT) AS expected_kept
    FROM j, tot, k
    ORDER BY lang"""))

  /** Oracle fixture of [[rebalanceToMix]]: the applied per-doc filter. */
  private val q64b = {
    val b = TextQ.ppmBucketExpr("strpos", "d.doc_id", "VARCHAR", offset = 9)
    GQuery(
      "q64b_rebalanced",
      (s, dir) => rebalanceToMix(t(s, dir, "documents"), "lang", mixTargets)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some(s"""WITH tgt(lang, target_ppm) AS (VALUES $mixTargetsSql),
        counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        j AS (SELECT * FROM counts JOIN tgt USING (lang)),
        k AS (SELECT MIN((1000000 * n_docs) // target_ppm) AS k_scaled FROM j),
        rates AS (SELECT lang,
            least(1000000,
              (1000000 * ((k_scaled * target_ppm) // 1000000)) // n_docs)
              AS rate_ppm
          FROM j, k)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE $b < r.rate_ppm
      ORDER BY d.doc_id"""))
  }

  /** Oracle fixture of [[lmTransitionScore]] over the full corpus. */
  private val q65 = GQuery(
    "q65_lm_score",
    (s, dir) => lmTransitionScore(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents),
      bg AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
             FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
             WHERE len(ts) >= 2),
      tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3),
      v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM
              (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
      c AS (SELECT doc_id, tf,
          CAST(SUM(tf) OVER (PARTITION BY w1, w2) AS BIGINT) AS c12,
          CAST(SUM(tf) OVER (PARTITION BY w1) AS BIGINT) AS c1
        FROM tf),
      p AS (SELECT doc_id, tf,
          CAST((1000000 * (c12 + 1)) // (c1 + vocab) AS BIGINT) AS p_ppm
        FROM c, v)
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
      CAST(SUM(tf * p_ppm) AS BIGINT) AS score,
      CAST(SUM(tf * p_ppm) // SUM(tf) AS BIGINT) AS avg_ppm
    FROM p GROUP BY doc_id
    ORDER BY doc_id"""))

  /** Oracle fixture of [[chunkOverlap]] (window 6, stride 3); chunk text
    * ships as sha256 so the compare pins exact content compactly. */
  private val q66 = GQuery(
    "q66_chunk_overlap",
    (s, dir) => chunkOverlap(t(s, dir, "documents"), window = 6, stride = 3)
      .select(col("doc_id"), col("chunk_idx"), col("n_toks"),
        sha2(col("chunk"), 256).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l,
          CAST(ceil(greatest(len(string_split(text, ' ')) - 6, 0) / 3.0)
            AS INT) + 1 AS nc
        FROM documents),
      c AS (SELECT doc_id,
          UNNEST(range(nc)) AS chunk_idx,
          UNNEST(list_transform(range(nc),
            i -> array_to_string(l[i*3+1 : i*3+6], ' '))) AS chunk
        FROM d)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_toks,
      sha256(chunk) AS chunk_hash
    FROM c
    ORDER BY doc_id, chunk_idx"""))

  /** Corpus data card: the one-call dataset report a pipeline publishes
    * next to a training corpus — volume, source/language diversity,
    * duplication, length profile — as (metric, value) rows. ONE scan
    * computes every number (a single aggregate row unpivoted with
    * `stack`); nothing here is a second pass over the corpus. Ratios are
    * reported in exact-arithmetic-derived doubles (the ppm/round
    * discipline of the rest of the engine), so the card is bit-stable
    * across runs and engines — a changed card means the DATA changed. */
  def dataCard(docs: DataFrame): DataFrame = {
    val agg = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(sha2(col("text"), 256)).as("n_unique"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
      sum(when(col("n_chars") < 50, 1L).otherwise(0L)).as("n_short"),
      sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"),
      sum(col("n_chars").cast(DecimalType(38, 0))).as("sum_chars"))
    agg.select(expr(
      """stack(8,
         'n_docs',        CAST(n_docs AS DOUBLE),
         'n_sources',     CAST(n_sources AS DOUBLE),
         'n_langs',       CAST(n_langs AS DOUBLE),
         'n_tokens',      CAST(n_tokens AS DOUBLE),
         'en_ppm',        round(CAST(n_en AS DOUBLE) * 1000000 / n_docs, 0),
         'short_ppm',     round(CAST(n_short AS DOUBLE) * 1000000 / n_docs, 0),
         'dup_ratio',     round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 6),
         'avg_chars',     round(CAST(sum_chars AS DOUBLE) / n_docs, 6)
       ) AS (metric, value)"""))
  }

  /** Oracle fixture of [[dataCard]]. */
  private val q100 = GQuery(
    "q100_data_card",
    (s, dir) => dataCard(t(s, dir, "documents")).orderBy(col("metric")),
    Some("""WITH a AS (
        SELECT COUNT(*) AS n_docs,
          COUNT(DISTINCT source) AS n_sources,
          COUNT(DISTINCT lang) AS n_langs,
          COUNT(DISTINCT sha256(text)) AS n_unique,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
          CAST(SUM(CASE WHEN n_chars < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
          SUM(CAST(n_chars AS DECIMAL(38,0))) AS sum_chars
        FROM documents)
      SELECT metric, value FROM (
        SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM a
        UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM a
        UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM a
        UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM a
        UNION ALL SELECT 'en_ppm',
          round(CAST(n_en AS DOUBLE) * 1000000 / n_docs, 0) FROM a
        UNION ALL SELECT 'short_ppm',
          round(CAST(n_short AS DOUBLE) * 1000000 / n_docs, 0) FROM a
        UNION ALL SELECT 'dup_ratio',
          round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 6) FROM a
        UNION ALL SELECT 'avg_chars',
          round(CAST(sum_chars AS DOUBLE) / n_docs, 6) FROM a)
      ORDER BY metric"""))

  /** Split-at-boundary packing spans — the complement of
    * [[packSequences]]: that operator keeps every document whole (its bin
    * is where its first token lands, so bins overflow past the budget);
    * this one cuts the concatenated token stream at EXACT `seqLen`
    * boundaries — the GPT-style pre-training layout where a document may
    * straddle two training sequences. Emits the doc→sequence index map a
    * dataloader slicing fixed-length rows needs: one row per (group,
    * chunk, doc) span with the doc's offset inside the chunk and how many
    * of its tokens land there. Every chunk except each group's LAST sums
    * to exactly `seqLen` — pack efficiency is structural, not luck.
    *
    * Packing is order-defined per `groupCol`, but the engine does NOT
    * serialize a group onto one reducer: the per-group running token sum
    * is computed with the [[globalRankBy]] two-pass bucket construction
    * applied WITHIN each group. Docs bucket by `floor(doc_id /
    * bucketDocs)` — monotone in doc_id, so ordering by (bucket, doc_id)
    * IS the doc_id order — per-(group, bucket) token subtotals aggregate
    * to a tiny broadcast offset table, and a doc's running total is its
    * bucket's offset plus the in-bucket cumsum. Result-identical to the
    * naive one-window-per-group cumsum (q112/q151 hash-prove it against
    * that oracle); parallelism is groups × buckets, so one dominant
    * source at 100 TB spreads over |corpus| / bucketDocs reducers
    * instead of one. The chunk fan-out (`sequence` over the doc's chunk
    * range) stays map-side. Dial: the offset table is |corpus| /
    * bucketDocs rows — at 10¹⁰ docs raise `bucketDocs` (10⁶ → a 10⁴-row
    * broadcast) to keep it broadcast-sized. */
  def packedChunkSpans(docs: DataFrame, seqLen: Int,
      groupCol: String = "source", bucketDocs: Long = 8192L): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(bucketDocs >= 1, s"bucketDocs must be >= 1, got $bucketDocs")
    // floor-div via pmod: uniform bucket widths across zero for negative
    // doc_ids (internal bucket id only; Spark DIV and DuckDB // both
    // truncate — no cross-engine concern, see COVERAGE.md)
    val bkt = expr(s"(doc_id - pmod(doc_id, ${bucketDocs}L)) DIV ${bucketDocs}L")
    val base = docs.select(col(groupCol), col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("bkt", bkt)
    val offsets = base.groupBy(col(groupCol), col("bkt"))
      .agg(sum(col("n_toks")).as("bn"))
      .withColumn("boff", coalesce(
        sum(col("bn")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(groupCol), col("bkt"), col("boff"))
    val w = Window.partitionBy(col(groupCol), col("bkt")).orderBy(col("doc_id"))
    base
      .withColumn("tok_end",
        sum(col("n_toks")).over(w))
      .join(broadcast(offsets), Seq(groupCol, "bkt"))
      .withColumn("tok_end", col("boff") + col("tok_end"))
      .withColumn("tok_start", col("tok_end") - col("n_toks"))
      .withColumn("chunk_id", explode(sequence(
        expr(s"tok_start div ${seqLen}L"),
        expr(s"(tok_end - 1L) div ${seqLen}L"))))
      .withColumn("seg_start",
        greatest(col("tok_start"), col("chunk_id") * seqLen))
      .select(col(groupCol), col("chunk_id"), col("doc_id"),
        (col("seg_start") - col("chunk_id") * seqLen).as("offset_in_chunk"),
        (least(col("tok_end"), (col("chunk_id") + 1) * seqLen)
          - col("seg_start")).as("n_chunk_toks"))
  }

  /** Oracle fixture of [[packedChunkSpans]] (seqLen 64, packed per
    * source). */
  private val q112 = GQuery(
    "q112_packed_spans",
    (s, dir) => packedChunkSpans(t(s, dir, "documents"), seqLen = 64)
      .orderBy(col("source"), col("chunk_id"), col("doc_id")),
    Some("""WITH d AS (SELECT source, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        FROM documents WHERE len(string_split(text, ' ')) > 0),
      c AS (SELECT source, doc_id, n_toks,
          CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id)
            AS BIGINT) AS tok_end
        FROM d),
      s AS (SELECT source, doc_id, tok_end, tok_end - n_toks AS tok_start,
          CAST((tok_end - n_toks) // 64 AS BIGINT) AS c0,
          CAST((tok_end - 1) // 64 AS BIGINT) AS c1
        FROM c)
      SELECT source, chunk_id, doc_id,
        GREATEST(tok_start, chunk_id * 64) - chunk_id * 64 AS offset_in_chunk,
        LEAST(tok_end, (chunk_id + 1) * 64)
          - GREATEST(tok_start, chunk_id * 64) AS n_chunk_toks
      FROM s, UNNEST(generate_series(c0, c1)) AS u(chunk_id)
      ORDER BY source, chunk_id, doc_id"""))

  /** Deterministic epoch shuffle — the "new random order every epoch"
    * a training dataloader needs, as a LAYOUT operation that survives
    * 100 TB: each doc gets the sort key `md5(epoch ':' doc_id)`, its
    * shard is two independent key nibbles mod `shards`, and `pos` is its
    * rank inside the shard. Writing the result partitioned by shard and
    * sorted by pos IS the epoch's read order; a different epoch value
    * re-derives a statistically independent permutation with no RNG
    * state anywhere (replay-stable, resumable mid-epoch at any (shard,
    * pos) watermark).
    *
    * One hash exchange on shard + one in-partition sort — the plan a
    * global `orderBy(rand())` (full range-exchange, RNG per task,
    * unreproducible) gets wrong. `shards` bounds per-reducer sort size:
    * pick corpus_bytes / executor_memory at scale. */
  def epochShuffle(docs: DataFrame, epoch: Int, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 256,
      s"shards must be in [1, 256] (two key nibbles), got $shards")
    val d1 = "(instr('0123456789abcdef', substr(skey, 1, 1)) - 1)"
    val d2 = "(instr('0123456789abcdef', substr(skey, 2, 1)) - 1)"
    docs.select(col("doc_id"))
      .withColumn("skey", expr(s"md5(concat('$epoch:', CAST(doc_id AS STRING)))"))
      .withColumn("shard", expr(s"CAST(($d1 * 16 + $d2) % $shards AS BIGINT)"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id")))
        .cast(LongType))
      .select(col("shard"), col("pos"), col("doc_id"))
  }

  /** Oracle fixture of [[epochShuffle]] (epoch 1, 8 shards). */
  private val q116 = GQuery(
    "q116_epoch_shuffle",
    (s, dir) => epochShuffle(t(s, dir, "documents"), epoch = 1, shards = 8)
      .orderBy(col("shard"), col("pos")),
    Some("""WITH h AS (SELECT doc_id,
          md5('1:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents),
      s AS (SELECT doc_id, skey,
          CAST(((strpos('0123456789abcdef', substr(skey, 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(skey, 2, 1)) - 1)) % 8
            AS BIGINT) AS shard
        FROM h)
      SELECT shard,
        CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id)
          AS BIGINT) AS pos,
        doc_id
      FROM s ORDER BY shard, pos"""))

  /** Repetition-factor resampling — the "books ×2.5, web ×0.5" epoch
    * multiplier of a curated training mix, deterministic in both
    * directions: a stratum with factor f emits ⌊f⌋ copies of every doc
    * plus one more for the hash-chosen frac(f) of docs (ppm
    * granularity, [[TextQ.ppmBucketExpr]] at its own offset so the
    * decision is independent of the split/sample/mixture buckets).
    * Factors < 1 downsample (0 copies for the unchosen), unlisted
    * strata pass through at ×1. Generalizes [[rebalanceToMix]], which
    * only ever drops.
    *
    * Map-side only at any scale: a broadcast factor lookup, a copies
    * explode bounded by ⌈f⌉ per row, no shuffle. `copy` is 1-based so
    * downstream can keep `copy = 1` as the canonical instance. */
  def repeatByFactor(docs: DataFrame, strataCol: String,
      factors: Map[String, Double]): DataFrame = {
    require(factors.values.forall(f => f >= 0 && f <= 1000),
      s"factors must be in [0, 1000], got $factors")
    val spark = docs.sparkSession
    import spark.implicits._
    val ftab = factors.toSeq.map { case (k, f) =>
      val whole = math.floor(f).toLong
      (k, whole, math.round((f - whole) * 1e6))
    }.toDF(strataCol, "whole", "frac_ppm")
    val ppm = TextQ.ppmBucketExpr("instr", "doc_id", "STRING", offset = 20)
    docs.join(broadcast(ftab), Seq(strataCol), "left")
      .na.fill(1L, Seq("whole")).na.fill(0L, Seq("frac_ppm"))
      .withColumn("n_copies",
        col("whole") + when(expr(ppm) < col("frac_ppm"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .select(col("doc_id"), col(strataCol), col("copy"))
  }

  /** Oracle fixture of [[repeatByFactor]]: de ×2.5 (oversample), en ×0.5
    * (downsample), other langs pass through. */
  private val q117 = {
    val ppmSql = TextQ.ppmBucketExpr("strpos", "doc_id", "VARCHAR", offset = 20)
    GQuery(
      "q117_repeat_factor",
      (s, dir) => repeatByFactor(t(s, dir, "documents"), "lang",
          Map("de" -> 2.5, "en" -> 0.5))
        .orderBy(col("doc_id"), col("copy")),
      Some(s"""WITH f(lang, whole, frac_ppm) AS (VALUES
          ('de', 2, 500000), ('en', 0, 500000)),
        d AS (SELECT doc_id, d.lang,
            COALESCE(whole, 1) + CASE WHEN $ppmSql < COALESCE(frac_ppm, 0)
                                      THEN 1 ELSE 0 END AS n_copies
          FROM documents d LEFT JOIN f ON d.lang = f.lang)
      SELECT doc_id, lang, CAST(c AS BIGINT) AS copy
      FROM d, UNNEST(generate_series(1, n_copies)) AS u(c)
      WHERE n_copies > 0
      ORDER BY doc_id, copy"""))
  }

  /** Pareto coverage card — "how few sources carry most of the corpus":
    * sources ranked by token mass with exact cumulative ppm shares and a
    * needed-for-80% flag. A corpus where 2 of 20 sources carry 80% of
    * tokens has a diversity problem no per-source count table makes
    * obvious; this is the one-look concentration view (the q92 key-skew
    * idea at the SOURCE grain, with cumulative coverage instead of
    * per-key share). One corpus aggregation; everything after rides the
    * |sources|-row table, where the rank window is bounded by
    * construction. */
  def paretoCoverage(docs: DataFrame, strataCol: String = "source",
      targetPpm: Long = 800000L): DataFrame = {
    require(targetPpm >= 1 && targetPpm <= 1000000L,
      s"targetPpm must be a ppm, got $targetPpm")
    val mass = docs.select(col(strataCol).as("stratum"),
        size(split(col("text"), " ")).cast(LongType).as("tk"))
      .groupBy(col("stratum")).agg(sum(col("tk")).as("tokens"))
      .withColumn("one", lit(1L))
    val tot = mass.agg(sum(col("tokens")).as("total"))
    // rank + coverage prefix via the bucket-offset construction: at a
    // web-corpus grain the strata are DOMAINS (millions), so the
    // (tokens desc, stratum) order must never serialize onto one
    // reducer; rank = exclusive row-count prefix + 1, cum = exclusive
    // token prefix + own tokens. Width caveat: token-count keys are
    // heavy-tailed (many strata share the low band), so no fixed width
    // caps the densest bucket the way it does for dense-integer
    // histograms (zipf/lag/cv sites) — the default width keeps the
    // non-empty-bucket offset window small instead; a corpus where the
    // low band dominates should pre-split it with a per-key salt
    PrefixSum.exclusive(mass.crossJoin(broadcast(tot)),
        "tokens", Seq("one", "tokens"), tieCols = Seq("stratum"),
        descending = true)
      .withColumn("rank", col("one_cum") + 1L)
      .withColumn("cum", col("tokens_cum") + col("tokens"))
      .select(col("rank"), col("stratum"), col("tokens"),
        expr("(1000000 * tokens) DIV total").as("share_ppm"),
        expr("(1000000 * cum) DIV total").as("cum_ppm"),
        // needed = this source is part of the minimal top set reaching
        // the target: everything BEFORE it left coverage short
        when(expr(s"(1000000 * (cum - tokens)) DIV total") < targetPpm, 1L)
          .otherwise(0L).as("needed_for_target"))
  }

  /** Oracle fixture of [[paretoCoverage]] (target 80%). */
  private val q213 = GQuery(
    "q213_pareto_card",
    (s, dir) => paretoCoverage(t(s, dir, "documents"))
      .orderBy(col("rank")),
    Some("""WITH mass AS (SELECT source AS stratum,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1),
      tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM mass),
      r AS (SELECT stratum, tokens,
          CAST(ROW_NUMBER() OVER (ORDER BY tokens DESC, stratum) AS BIGINT)
            AS rank,
          CAST(SUM(tokens) OVER (ORDER BY tokens DESC, stratum
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM mass)
      SELECT rank, stratum, tokens,
        (1000000 * tokens) // tot.total AS share_ppm,
        (1000000 * cum) // tot.total AS cum_ppm,
        CAST(CASE WHEN (1000000 * (cum - tokens)) // tot.total < 800000
             THEN 1 ELSE 0 END AS BIGINT) AS needed_for_target
      FROM r, tot
      ORDER BY rank"""))

  /** Cell-level repetition resampling — [[repeatByFactor]] generalized
    * from a per-stratum factor Map to a per-(a, b) CELL weight TABLE, the
    * consumer side of [[rakeWeights]]: a raked weight of `weight_ppm`
    * means every doc in that cell emits ⌊w/10⁶⌋ copies plus one more for
    * the hash-chosen w%10⁶ ppm of docs, so the emitted corpus hits the
    * raked joint mixture exactly in expectation (ppm granularity, cell-
    * deterministic). Cells absent from the weight table pass through ×1.
    * The hash rides its own offset (21) so the copy decision is
    * independent of the split/sample/mixture/per-stratum-repeat buckets.
    *
    * Scale shape: identical to [[repeatByFactor]] — one broadcast join
    * against the cell-count-sized weight table, a ⌈w⌉-bounded explode,
    * no shuffle. */
  def repeatByCellWeights(docs: DataFrame, aCol: String, bCol: String,
      weights: DataFrame): DataFrame = {
    val w = broadcast(weights.select(col("a"), col("b"),
      col("weight_ppm")))
    val ppm = TextQ.ppmBucketExpr("instr", "doc_id", "STRING", offset = 21)
    docs.join(w, docs(aCol) === w("a") && docs(bCol) === w("b"), "left")
      .withColumn("wp", coalesce(col("weight_ppm"), lit(1000000L)))
      .withColumn("n_copies",
        expr("wp DIV 1000000") +
          when(expr(ppm) < expr("wp % 1000000"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .select(col("doc_id"), docs(aCol).as(aCol), docs(bCol).as(bCol),
        col("copy"))
  }

  /** Oracle fixture of [[repeatByCellWeights]]: the q189 rake chain's
    * weights applied back to the documents table — the full
    * rake-then-resample composition, hash-pinned end to end. */
  private val q191 = {
    val steps = (1 to 3).map { r =>
      s"""r$r AS MATERIALIZED (SELECT a, b, o,
            GREATEST(CAST(1 AS HUGEINT), (w * ((nn.n * 1000000) // nn.n_a))
              // (SUM(o * w) OVER (PARTITION BY a))) AS w
          FROM c${r - 1}, nn),
        c$r AS MATERIALIZED (SELECT a, b, o,
            GREATEST(CAST(1 AS HUGEINT), (w * ((nn.n * 1000000) // nn.n_b))
              // (SUM(o * w) OVER (PARTITION BY b))) AS w
          FROM r$r, nn)"""
    }.mkString(",\n")
    val ppmSql = TextQ.ppmBucketExpr("strpos", "doc_id", "VARCHAR",
      offset = 21)
    GQuery(
      "q191_cell_repeat",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        repeatByCellWeights(docs, "source", "lang",
          rakeWeights(docs, "source", "lang"))
          .orderBy(col("doc_id"), col("copy"))
      },
      Some(s"""WITH cells AS MATERIALIZED (
          SELECT source AS a, lang AS b, COUNT(*) AS o
          FROM documents GROUP BY 1, 2),
        nn AS MATERIALIZED (SELECT CAST(SUM(o) AS HUGEINT) AS n,
            CAST(COUNT(DISTINCT a) AS HUGEINT) AS n_a,
            CAST(COUNT(DISTINCT b) AS HUGEINT) AS n_b
          FROM cells),
        c0 AS MATERIALIZED (SELECT a, b, o, CAST(1000000 AS HUGEINT) AS w
          FROM cells),
        $steps,
        d AS (SELECT doc_id, d.source, d.lang,
            (CAST(w AS BIGINT) // 1000000) +
              CASE WHEN $ppmSql < (CAST(w AS BIGINT) % 1000000)
                   THEN 1 ELSE 0 END AS n_copies
          FROM documents d LEFT JOIN c3
            ON d.source = c3.a AND d.lang = c3.b)
      SELECT doc_id, source, lang, CAST(c AS BIGINT) AS copy
      FROM d, UNNEST(generate_series(1, n_copies)) AS u(c)
      WHERE n_copies > 0
      ORDER BY doc_id, copy"""))
  }

  /** Score-ranked per-stratum cap — "keep the BEST n per domain", the
    * quality-aware sibling of [[capPerStratum]] (which keeps a hash-
    * random n): rank within each stratum by `scoreCol` descending
    * (doc_id tiebreak) and keep the top n. Pair with any quality signal
    * — [[curationVerdict]], a classifier score, n_chars. Same shape as
    * the random cap: one hash exchange on the stratum, top-n window
    * state bounded by n. */
  def capPerStratumBest(docs: DataFrame, strataCol: String, n: Int,
      scoreCol: String): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col("doc_id"))
    docs.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= n)
  }

  /** Oracle fixture of [[capPerStratumBest]] (longest 40 docs per
    * language). */
  private val q119 = GQuery(
    "q119_best_cap",
    (s, dir) => capPerStratumBest(t(s, dir, "documents"), "lang", 40,
        "n_chars")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("rn"))
      .orderBy(col("lang"), col("rn")),
    Some("""SELECT doc_id, lang, n_chars, rn FROM (
        SELECT doc_id, lang, n_chars,
          ROW_NUMBER() OVER (PARTITION BY lang
                             ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
      WHERE rn <= 40
      ORDER BY lang, rn"""))

  /** Per-source data card — [[dataCard]]'s profile split by source, one
    * wide row each: the decision INPUT for [[capPerStratum]] /
    * [[capPerStratumBest]] caps and [[repeatByFactor]] multipliers
    * ("which domain is duplicated garbage, which is short-doc spam,
    * which deserves ×2"). Same single-scan shape — one hash exchange on
    * source; the within-source distinct (dup detection) rides the same
    * key. */
  def sourceCard(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(sha2(col("text"), 256)).as("n_unique"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(when(col("n_chars") < 50, 1L).otherwise(0L)).as("n_short"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"),
        sum(col("n_chars").cast(DecimalType(38, 0))).as("sum_chars"))
      .select(col("source"), col("n_docs"), col("n_langs"), col("n_tokens"),
        expr("CAST(round(CAST(n_en AS DOUBLE) * 1000000 / n_docs, 0) AS BIGINT)")
          .as("en_ppm"),
        expr("CAST(round(CAST(n_short AS DOUBLE) * 1000000 / n_docs, 0) AS BIGINT)")
          .as("short_ppm"),
        expr("round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 6)")
          .as("dup_ratio"),
        expr("round(CAST(CAST(sum_chars AS DOUBLE) AS DOUBLE) / n_docs, 6)")
          .as("avg_chars"))

  /** Oracle fixture of [[sourceCard]]. */
  private val q123 = GQuery(
    "q123_source_card",
    (s, dir) => sourceCard(t(s, dir, "documents")).orderBy(col("source")),
    Some("""SELECT source,
        COUNT(*) AS n_docs,
        COUNT(DISTINCT lang) AS n_langs,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        CAST(ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
          * 1000000 / COUNT(*), 0) AS BIGINT) AS en_ppm,
        CAST(ROUND(CAST(SUM(CASE WHEN n_chars < 50 THEN 1 ELSE 0 END) AS DOUBLE)
          * 1000000 / COUNT(*), 0) AS BIGINT) AS short_ppm,
        ROUND(1.0 - CAST(COUNT(DISTINCT sha256(text)) AS DOUBLE) / COUNT(*), 6)
          AS dup_ratio,
        ROUND(CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS DOUBLE)
          / COUNT(*), 6) AS avg_chars
      FROM documents
      GROUP BY source
      ORDER BY source"""))

  /** Distributed global rank by a non-negative integer score —
    * curriculum ordering ("train easy→hard") without a single-partition
    * global sort: scores bucket by `bucketWidth` (one map-side
    * expression), per-bucket counts aggregate to a TINY cumulative-offset
    * table (|buckets| rows, broadcast), and the global rank is the
    * lower-bucket offset plus the in-bucket rank — per-bucket windows
    * run in parallel, so the sort work spreads over |buckets| reducers
    * instead of one. The oracle is the NAIVE global ROW_NUMBER, so the
    * hash-match proves the two-pass construction is result-identical to
    * the global sort (the q96-salting style of equivalence proof).
    * Ties: same score ⇒ same bucket, so the doc_id tiebreak agrees with
    * the global order by construction. */
  def globalRankBy(docs: DataFrame, scoreCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val scored = docs.select(col("doc_id"),
        col(scoreCol).cast(LongType).as("score"))
      .withColumn("b", expr(s"score DIV ${bucketWidth}L"))
    val offsets = scored.groupBy(col("b")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("b"), col("offset"))
    val wB = Window.partitionBy(col("b"))
      .orderBy(col("score"), col("doc_id"))
    scored
      .withColumn("rib", row_number().over(wB).cast(LongType))
      .join(broadcast(offsets), Seq("b"))
      .select(col("doc_id"), col("score"),
        (col("offset") + col("rib")).as("grank"))
  }

  /** Oracle fixture of [[globalRankBy]] (score = n_chars, width 64):
    * the plain global ROW_NUMBER. */
  private val q124 = GQuery(
    "q124_curriculum_rank",
    (s, dir) => globalRankBy(t(s, dir, "documents"), "n_chars", 64L)
      .orderBy(col("grank")),
    Some("""SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
        CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS grank
      FROM documents
      ORDER BY grank"""))

  /** Final training-sequence layout — the capstone wiring
    * [[packedChunkSpans]] (WHERE each doc's tokens land) to
    * [[graft.queries.TextQ.encodeTokens]] (WHAT id each token is): one
    * row per (group, chunk, position) with the vocabulary id at that
    * slot — exactly the fixed-length rows a pre-training dataloader
    * reads, emitted flat rather than as arrays so the output stays
    * splittable and engine-portable. Empty tokens are dropped and
    * positions re-ranked dense, so chunks carry no holes (every chunk
    * except each group's last is exactly `seqLen` ids).
    *
    * Scale shape: the dense re-rank and the per-doc token counts share
    * one hash exchange on doc_id; the per-group cumulative start runs
    * over the DOC-count-sized count table (not the token table) with the
    * same within-group bucket-offset construction as
    * [[packedChunkSpans]] — per-(group, bucket) windows plus a broadcast
    * cumulative-offset table, result-identical to the single
    * window-per-group cumsum (q127/q152 hash-prove it) — so a dominant
    * source spreads over |group docs| / bucketDocs reducers instead of
    * serializing; the token→id lookup is a broadcast of the
    * vocabSize-row vocab; the chunk/position arithmetic is map-side. */
  def assembleSequences(docs: DataFrame, vocab: DataFrame, seqLen: Int,
      groupCol: String = "source", bucketDocs: Long = 8192L): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(bucketDocs >= 1, s"bucketDocs must be >= 1, got $bucketDocs")
    val toks = docs.select(col(groupCol), col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val dense = toks.withColumn("dpos",
      (row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("pos"))) - 1).cast(LongType))
    val counts = dense.groupBy(col(groupCol), col("doc_id"))
      .agg(count(lit(1)).as("n_toks"))
      .withColumn("bkt",
        expr(s"(doc_id - pmod(doc_id, ${bucketDocs}L)) DIV ${bucketDocs}L"))
    val offsets = counts.groupBy(col(groupCol), col("bkt"))
      .agg(sum(col("n_toks")).as("bn"))
      .withColumn("boff", coalesce(
        sum(col("bn")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(groupCol), col("bkt"), col("boff"))
    val starts = counts
      .withColumn("local_start", coalesce(
        sum(col("n_toks")).over(Window.partitionBy(col(groupCol), col("bkt"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offsets), Seq(groupCol, "bkt"))
      .select(col("doc_id"), (col("boff") + col("local_start")).as("tok_start"))
    dense.join(starts, Seq("doc_id"))
      .join(broadcast(vocab.select(col("tok"), col("tok_id"))),
        Seq("tok"), "left")
      .withColumn("gpos", col("tok_start") + col("dpos"))
      .select(col(groupCol),
        expr(s"gpos DIV ${seqLen}L").as("chunk_id"),
        (col("gpos") % seqLen).as("pos_in_chunk"),
        coalesce(col("tok_id"), lit(0L)).as("tok_id"))
  }

  /** Oracle fixture of [[assembleSequences]] (q120's vocab-100, q112's
    * seqLen 64, packed per source). */
  private val q127 = GQuery(
    "q127_seq_assembly",
    // deliberately NOT globally sorted (the q248 rule): the output is
    // TOKEN grain — the largest result any fixture dumps — and a
    // dataloader consumes chunks shard-wise, never as one total order;
    // the driver's compare canon-sorts, the oracle keeps its ORDER BY
    // for readability only
    (s, dir) => {
      val docs = t(s, dir, "documents")
      assembleSequences(docs, TextQ.buildVocab(docs, vocabSize = 100),
          seqLen = 64)
    },
    Some("""WITH e AS (SELECT source, doc_id, CAST(i - 1 AS BIGINT) AS pos,
          ts[i] AS tok
        FROM (SELECT source, doc_id, string_split(text, ' ') AS ts
              FROM documents),
          UNNEST(generate_series(1, len(ts))) AS u(i)
        WHERE len(ts[i]) > 0),
      dn AS (SELECT source, doc_id, tok,
          CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1
            AS BIGINT) AS dpos
        FROM e),
      cnt AS (SELECT source, doc_id, COUNT(*) AS n_toks
        FROM dn GROUP BY source, doc_id),
      st AS (SELECT doc_id, CAST(COALESCE(SUM(n_toks) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS tok_start
        FROM cnt),
      tf AS (SELECT tok, COUNT(*) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE len(tok) > 0 GROUP BY tok),
      top AS (SELECT tok, tok_id FROM (
          SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok)
            AS BIGINT) AS tok_id
          FROM tf) WHERE tok_id <= 100)
      SELECT source, (tok_start + dpos) // 64 AS chunk_id,
        (tok_start + dpos) % 64 AS pos_in_chunk,
        COALESCE(tok_id, 0) AS tok_id
      FROM dn JOIN st USING (doc_id) LEFT JOIN top USING (tok)
      ORDER BY source, chunk_id, pos_in_chunk"""))

  /** Dominant-group packing proof — [[packedChunkSpans]] with a PLANTED
    * mega source (90% of docs, hence ≥80% of tokens, remapped to one
    * group) and a small `bucketDocs`, hash-matched against the NAIVE
    * single-window-per-group oracle: the within-group bucket-offset
    * cumsum is result-identical to the serialized window even when one
    * group dominates — the exact regime where the old one-window-per-
    * group plan collapsed to a single reducer. */
  private val q151 = GQuery(
    "q151_mega_pack",
    (s, dir) => {
      val d = t(s, dir, "documents").withColumn("src_mega",
        when(expr("doc_id % 10 < 9"), lit("mega")).otherwise(col("source")))
      packedChunkSpans(d, seqLen = 64, groupCol = "src_mega", bucketDocs = 16L)
        .orderBy(col("src_mega"), col("chunk_id"), col("doc_id"))
    },
    Some("""WITH dd AS (SELECT
          CASE WHEN doc_id % 10 < 9 THEN 'mega' ELSE source END AS src_mega,
          doc_id, text
        FROM documents),
      d AS (SELECT src_mega, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        FROM dd WHERE len(string_split(text, ' ')) > 0),
      c AS (SELECT src_mega, doc_id, n_toks,
          CAST(SUM(n_toks) OVER (PARTITION BY src_mega ORDER BY doc_id)
            AS BIGINT) AS tok_end
        FROM d),
      s AS (SELECT src_mega, doc_id, tok_end, tok_end - n_toks AS tok_start,
          CAST((tok_end - n_toks) // 64 AS BIGINT) AS c0,
          CAST((tok_end - 1) // 64 AS BIGINT) AS c1
        FROM c)
      SELECT src_mega, chunk_id, doc_id,
        GREATEST(tok_start, chunk_id * 64) - chunk_id * 64 AS offset_in_chunk,
        LEAST(tok_end, (chunk_id + 1) * 64)
          - GREATEST(tok_start, chunk_id * 64) AS n_chunk_toks
      FROM s, UNNEST(generate_series(c0, c1)) AS u(chunk_id)
      ORDER BY src_mega, chunk_id, doc_id"""))

  /** Dominant-group sequence-assembly proof — [[assembleSequences]] under
    * the same planted mega source and small `bucketDocs` as [[q151]],
    * hash-matched against the naive single-window oracle. */
  private val q152 = GQuery(
    "q152_mega_assembly",
    (s, dir) => {
      val d = t(s, dir, "documents").withColumn("src_mega",
        when(expr("doc_id % 10 < 9"), lit("mega")).otherwise(col("source")))
      assembleSequences(d, TextQ.buildVocab(d, vocabSize = 100), seqLen = 64,
          groupCol = "src_mega", bucketDocs = 16L)
      // token-grain output: no global sort (q127's rule)
    },
    Some("""WITH dd AS (SELECT
          CASE WHEN doc_id % 10 < 9 THEN 'mega' ELSE source END AS src_mega,
          doc_id, text
        FROM documents),
      e AS (SELECT src_mega, doc_id, CAST(i - 1 AS BIGINT) AS pos,
          ts[i] AS tok
        FROM (SELECT src_mega, doc_id, string_split(text, ' ') AS ts
              FROM dd),
          UNNEST(generate_series(1, len(ts))) AS u(i)
        WHERE len(ts[i]) > 0),
      dn AS (SELECT src_mega, doc_id, tok,
          CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1
            AS BIGINT) AS dpos
        FROM e),
      cnt AS (SELECT src_mega, doc_id, COUNT(*) AS n_toks
        FROM dn GROUP BY src_mega, doc_id),
      st AS (SELECT doc_id, CAST(COALESCE(SUM(n_toks) OVER (
            PARTITION BY src_mega ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS tok_start
        FROM cnt),
      tf AS (SELECT tok, COUNT(*) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE len(tok) > 0 GROUP BY tok),
      top AS (SELECT tok, tok_id FROM (
          SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok)
            AS BIGINT) AS tok_id
          FROM tf) WHERE tok_id <= 100)
      SELECT src_mega, (tok_start + dpos) // 64 AS chunk_id,
        (tok_start + dpos) % 64 AS pos_in_chunk,
        COALESCE(tok_id, 0) AS tok_id
      FROM dn JOIN st USING (doc_id) LEFT JOIN top USING (tok)
      ORDER BY src_mega, chunk_id, pos_in_chunk"""))

  /** Output shard planning — assign every document to a fixed-token-budget
    * output shard (the files a pre-training dataloader reads), in a
    * deterministic hash order that decorrelates shard contents from
    * source/crawl clustering, WITHOUT the single-partition global sort a
    * naive running total needs: docs bucket by a hash coordinate (map-side
    * expression over md5 of a 'shard:'-prefixed id, so the coordinate is
    * independent of every split/sample coordinate), per-bucket token
    * totals aggregate to a TINY broadcast cumulative-offset table, and
    * each doc's global token prefix is the lower-bucket offset plus an
    * in-bucket running sum — the [[globalRankBy]] two-pass construction
    * applied to a weighted cumsum. `shard_id = prefix DIV tokenBudget`,
    * so every shard except the last holds ≥ tokenBudget − (doc's tokens)
    * and < tokenBudget + max-doc tokens. The oracle is the NAIVE global
    * window cumsum, so the hash-match proves the distributed plan is
    * result-identical to the global sort. `startTokens` offsets the
    * global prefix — the append seam [[graft.etl.IncrementalShardPlan]]
    * uses to continue an earlier run's last partial shard. */
  def planShards(docs: DataFrame, tokenBudget: Long,
      bucketWidth: Long = 100000L, startTokens: Long = 0L): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1, got $tokenBudget")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(startTokens >= 0L, s"startTokens must be >= 0, got $startTokens")
    val hk = TextQ.ppmBucketExpr(
      "instr", "concat('shard:', doc_id)", "STRING", offset = 1)
    val scored = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_toks"))
      .withColumn("hk", expr(hk).cast(LongType))
      .withColumn("b", expr(s"hk DIV ${bucketWidth}L"))
    val offsets = scored.groupBy(col("b")).agg(sum(col("n_toks")).as("bt"))
      .withColumn("offset", coalesce(
        sum(col("bt")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("offset"))
    val wB = Window.partitionBy(col("b")).orderBy(col("hk"), col("doc_id"))
    scored.withColumn("cum", sum(col("n_toks")).over(wB))
      .join(broadcast(offsets), Seq("b"))
      .select(col("doc_id"), col("n_toks"),
        expr(s"(${startTokens}L + offset + cum - n_toks) DIV ${tokenBudget}L")
          .as("shard_id"))
  }

  /** Oracle fixture of [[planShards]] (budget 10000): the plain global
    * running sum over the same hash order. */
  private val q130 = {
    val hkSql = TextQ.ppmBucketExpr(
      "strpos", "concat('shard:', doc_id)", "VARCHAR", offset = 1)
    GQuery(
      "q130_shard_plan",
      (s, dir) => planShards(t(s, dir, "documents"), tokenBudget = 10000L)
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
          CAST($hkSql AS BIGINT) AS hk
        FROM documents),
      c AS (SELECT doc_id, n_toks,
          CAST(SUM(n_toks) OVER (ORDER BY hk, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM d)
      SELECT doc_id, n_toks, (cum - n_toks) // 10000 AS shard_id
      FROM c
      ORDER BY doc_id"""))
  }

  /** Soft quality sampling — keep each document with probability
    * proportional to its quality instead of a hard threshold: a doc
    * survives iff an independent deterministic ppm hash coordinate of its
    * id falls below `keepPpm` (any integer expression in [0, 1e6]). A
    * hard filter throws away the entire low-quality tail; the soft filter
    * retains it at a reduced, quality-proportional rate — the mix-shaping
    * move when mid-quality data still carries signal. Hash-based like
    * every sampler here: reruns, engines, and cluster sizes all keep the
    * same docs, and the 'soft:'-prefixed md5 coordinate is independent of
    * the split/sample/shard coordinates, so composing them doesn't skew
    * any of them.
    *
    * Scale shape: wholly map-side — zero shuffles, zero joins; at 100 TB
    * it is one scan that emits the survivors. */
  def softQualitySample(docs: DataFrame, keepPpm: org.apache.spark.sql.Column)
      : DataFrame =
    docs
      .withColumn("keep_ppm", keepPpm.cast(LongType))
      .withColumn("hk", expr(TextQ.ppmBucketExpr(
        "instr", "concat('soft:', doc_id)", "STRING", offset = 1))
        .cast(LongType))
      .filter(col("hk") < col("keep_ppm"))
      .select(col("doc_id"), col("keep_ppm"))

  /** Oracle fixture of [[softQualitySample]]: keep rate = the exact
    * non-stopword token fraction in ppm (mostly-stopword docs sampled
    * down proportionally) — all-integer arithmetic, engine-portable. */
  private val q131 = {
    val stops = "('the', 'a', 'of', 'and', 'data', 'row')"
    val hkSql = TextQ.ppmBucketExpr(
      "strpos", "concat('soft:', doc_id)", "VARCHAR", offset = 1)
    GQuery(
      "q131_soft_quality_sample",
      (s, dir) => softQualitySample(t(s, dir, "documents"),
        expr(s"""(1000000L * (size(split(text, ' ')) -
            size(filter(split(text, ' '), x -> x IN $stops))))
          DIV size(split(text, ' '))"""))
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (SELECT doc_id,
          (1000000 * (len(string_split(text, ' ')) -
             len(list_filter(string_split(text, ' '), x -> x IN $stops))))
            // len(string_split(text, ' ')) AS keep_ppm,
          CAST($hkSql AS BIGINT) AS hk
        FROM documents)
      SELECT doc_id, CAST(keep_ppm AS BIGINT) AS keep_ppm
      FROM d WHERE hk < keep_ppm
      ORDER BY doc_id"""))
  }

  /** Padding-waste accounting for fixed-shape training batches — the
    * measurement behind length-bucketed batching: when every batch pads
    * to its longest member, arrival-order batches waste
    * max−mean tokens per row, while length-sorted batches put like
    * lengths together and waste almost nothing. Emits, per policy
    * ('hash_order' = decorrelated arrival, 'length_sorted' = bucketed),
    * the batch count, real tokens, padded slots, and exact-ppm waste —
    * the number that justifies (or kills) a dataloader's bucketing
    * stage. Lengths clamp at `seqLen` (longer docs truncate in the
    * loader). Both policies rank with [[globalRankBy]]'s two-pass
    * construction, so neither needs a single-partition global sort.
    *
    * Scale shape: one map-side length/hash scan, two globalRankBy
    * passes (broadcast offset tables + per-bucket windows), per-batch
    * aggregation on the batch key, then a 2-row result. */
  def paddingWaste(docs: DataFrame, batchSize: Int, seqLen: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val base = docs.select(col("doc_id"),
      least(size(split(col("text"), " ")).cast(LongType),
        lit(seqLen.toLong)).as("n"))
    val hk = expr(TextQ.ppmBucketExpr(
      "instr", "concat('pad:', doc_id)", "STRING", offset = 1))
      .cast(LongType)
    def waste(policy: String, ranked: DataFrame): DataFrame =
      ranked.withColumn("batch", expr(s"(grank - 1) DIV ${batchSize}L"))
        .groupBy(col("batch"))
        .agg(max(col("n")).as("mx"), sum(col("n")).as("tok"),
          count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_batches"), sum(col("tok")).as("n_tokens"),
          sum(col("mx") * col("cnt")).as("n_slots"))
        .select(lit(policy).as("policy"), col("n_batches"), col("n_tokens"),
          col("n_slots"),
          expr("((n_slots - n_tokens) * 1000000) DIV n_slots")
            .as("waste_ppm"))
    val arrival = globalRankBy(base.withColumn("hk", hk), "hk", 50000L)
      .join(base, Seq("doc_id"))
    val bySize = globalRankBy(base, "n", 16L)
      .withColumn("n", col("score"))
    waste("hash_order", arrival).unionByName(waste("length_sorted", bySize))
  }

  /** Oracle fixture of [[paddingWaste]] (batch 16, seqLen 64): the naive
    * global ROW_NUMBER batching under both orders. */
  private val q133 = {
    val hkSql = TextQ.ppmBucketExpr(
      "strpos", "concat('pad:', doc_id)", "VARCHAR", offset = 1)
    GQuery(
      "q133_padding_waste",
      (s, dir) => paddingWaste(t(s, dir, "documents"),
        batchSize = 16, seqLen = 64).orderBy(col("policy")),
      Some(s"""WITH d AS (SELECT doc_id,
          LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 64) AS n,
          CAST($hkSql AS BIGINT) AS hk
        FROM documents),
      r1 AS (SELECT n, (ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1) // 16
          AS batch FROM d),
      r2 AS (SELECT n, (ROW_NUMBER() OVER (ORDER BY n, doc_id) - 1) // 16
          AS batch FROM d),
      b1 AS (SELECT batch, MAX(n) AS mx, CAST(SUM(n) AS BIGINT) AS tok,
          COUNT(*) AS cnt FROM r1 GROUP BY batch),
      b2 AS (SELECT batch, MAX(n) AS mx, CAST(SUM(n) AS BIGINT) AS tok,
          COUNT(*) AS cnt FROM r2 GROUP BY batch),
      w1 AS (SELECT 'hash_order' AS policy, COUNT(*) AS n_batches,
          CAST(SUM(tok) AS BIGINT) AS n_tokens,
          CAST(SUM(mx * cnt) AS BIGINT) AS n_slots FROM b1),
      w2 AS (SELECT 'length_sorted' AS policy, COUNT(*) AS n_batches,
          CAST(SUM(tok) AS BIGINT) AS n_tokens,
          CAST(SUM(mx * cnt) AS BIGINT) AS n_slots FROM b2),
      u AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2)
      SELECT policy, n_batches, n_tokens, n_slots,
        ((n_slots - n_tokens) * 1000000) // n_slots AS waste_ppm
      FROM u
      ORDER BY policy"""))
  }

  /** Source-interleaved global ordering — the batch-diversity pass a
    * dataloader runs so consecutive rows rotate across sources instead
    * of clumping (a source-sorted corpus feeds the model hours of one
    * domain at a time; gradient quality wants the mix IN the batch).
    * Docs rank within their source by a decorrelating hash, and the
    * global order is (rank-level, source): level 1 of every source
    * first, then level 2, … — round-robin until small sources exhaust,
    * continuing among the remainder. Emitted as an explicit dense rank
    * so it composes with q116's shard layout and q130's shard plan.
    *
    * No single-partition sort, and NOTHING corpus-proportional is ever
    * broadcast: the per-level table (one row per rank level — up to
    * corpus/|sources| rows, far too big to broadcast at 100 TB) gets its
    * own cumulative offsets via a second two-pass: levels bucket by
    * `levelBucket`, only the |levelBuckets|-row bucket-total table is
    * broadcast, and the level offsets come from per-bucket windows. The
    * level table then rejoins the docs by a plain hash join on the rank
    * level. The oracle is the naive global ROW_NUMBER over
    * (level, source), so the hash-match proves equivalence.
    *
    * Scale shape: one hash exchange on source (in-source rank), one on
    * level (in-level rank + the offset join), a |levelBuckets|-row
    * broadcast; per-level windows are |sources|-sized, per-source
    * windows corpus/|sources|-sized. */
  def interleaveBySource(docs: DataFrame, groupCol: String = "source",
      levelBucket: Long = 4096L): DataFrame = {
    require(levelBucket >= 1, s"levelBucket must be >= 1, got $levelBucket")
    val hk = expr(TextQ.ppmBucketExpr(
      "instr", "concat('ilv:', doc_id)", "STRING", offset = 1))
      .cast(LongType)
    val wS = Window.partitionBy(col(groupCol)).orderBy(col("hk"), col("doc_id"))
    val ranked = docs.select(col("doc_id"), col(groupCol))
      .withColumn("hk", hk)
      .withColumn("r", row_number().over(wS).cast(LongType))
    val levels = ranked.groupBy(col("r")).agg(count(lit(1)).as("n"))
      .withColumn("lb", expr(s"r DIV ${levelBucket}L"))
    val bucketOffsets = levels.groupBy(col("lb")).agg(sum(col("n")).as("bn"))
      .withColumn("boffset", coalesce(
        sum(col("bn")).over(Window.orderBy(col("lb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lb"), col("boffset"))
    val offsets = levels
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("lb")).orderBy(col("r"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .join(broadcast(bucketOffsets), Seq("lb"))
      .select(col("r"), (col("boffset") + coalesce(col("cum"), lit(0L)))
        .as("offset"))
    val wR = Window.partitionBy(col("r")).orderBy(col(groupCol))
    ranked.withColumn("rib", row_number().over(wR).cast(LongType))
      .join(offsets, Seq("r"))
      .select(col("doc_id"), col(groupCol),
        (col("offset") + col("rib")).as("ilv_rank"))
  }

  /** Oracle fixture of [[interleaveBySource]]: the naive global
    * ROW_NUMBER over (in-source rank, source). */
  private val q135 = {
    val hkSql = TextQ.ppmBucketExpr(
      "strpos", "concat('ilv:', doc_id)", "VARCHAR", offset = 1)
    GQuery(
      "q135_source_interleave",
      (s, dir) => interleaveBySource(t(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (SELECT doc_id, source,
          CAST($hkSql AS BIGINT) AS hk
        FROM documents),
      r AS (SELECT doc_id, source,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS r
        FROM d)
      SELECT doc_id, source,
        CAST(ROW_NUMBER() OVER (ORDER BY r, source) AS BIGINT) AS ilv_rank
      FROM r
      ORDER BY doc_id"""))
  }

  /** Temperature-smoothed mixture targets (α = 1/2): target shares
    * ∝ √n_s instead of caller-supplied constants — the multilingual
    * smoothing (mBERT/XLM-style exponent sampling) that lifts tail
    * languages without letting the head dominate. Derives the targets
    * FROM the data, then reuses [[mixtureWeights]]' K/rate arithmetic so
    * the output contract (rate_ppm, expected_kept) is identical.
    *
    * √n must be the same integer in both engines: `FLOOR(SQRT(double))`
    * is correctly rounded but the floor can land one off once n's sqrt
    * error crosses an integer (possible past ~2²⁶), so the value is
    * re-anchored with one exact integer comparison step — `isqrt`
    * semantics at any BIGINT scale. Tiny strata floor at target_ppm = 1
    * (a 0 target would make the downsample constraint undefined).
    *
    * One corpus scan (the stratum count); everything after is
    * stratum-sized with broadcast scalars. */
  def temperatureMixWeights(docs: DataFrame, strataCol: String): DataFrame = {
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    val tt = counts
      .withColumn("t_raw",
        expr("CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)"))
      .withColumn("sqrt_n", expr(
        """CASE WHEN (t_raw + 1) * (t_raw + 1) <= n_docs THEN t_raw + 1
                WHEN t_raw * t_raw > n_docs THEN t_raw - 1
                ELSE t_raw END"""))
      .drop("t_raw")
    val sums = tt.agg(sum(col("sqrt_n")).as("st"), sum(col("n_docs")).as("total"))
    val w = tt.crossJoin(broadcast(sums))
      .withColumn("actual_ppm", expr("(1000000 * n_docs) DIV total"))
      .withColumn("target_ppm", expr("greatest(1, (1000000 * sqrt_n) DIV st)"))
    val k = w.agg(min(expr("(1000000 * n_docs) div target_ppm")).as("k_scaled"))
    w.crossJoin(broadcast(k))
      .withColumn("expected_kept", expr("(k_scaled * target_ppm) div 1000000"))
      .withColumn("rate_ppm",
        expr("least(1000000, (1000000 * expected_kept) div n_docs)"))
      .select(col(strataCol), col("n_docs"), col("sqrt_n"), col("actual_ppm"),
        col("target_ppm"), col("rate_ppm"), col("expected_kept"))
  }

  /** Apply [[temperatureMixWeights]] as a deterministic per-doc filter —
    * same ppm-bucket coordinate as [[rebalanceToMix]]. */
  def temperatureRebalance(docs: DataFrame, strataCol: String): DataFrame = {
    val rates = temperatureMixWeights(docs, strataCol)
      .select(col(strataCol), col("rate_ppm"))
    val b = TextQ.ppmBucketExpr("instr", "doc_id", "STRING", offset = 9)
    docs.join(broadcast(rates), Seq(strataCol))
      .filter(expr(s"$b < rate_ppm"))
      .drop("rate_ppm")
  }

  /** Oracle fixture of [[temperatureMixWeights]] over language strata. */
  private val q142 = GQuery(
    "q142_temperature_mix",
    (s, dir) => temperatureMixWeights(t(s, dir, "documents"), "lang")
      .orderBy(col("lang")),
    Some("""WITH counts AS (SELECT lang, COUNT(*) AS n_docs
              FROM documents GROUP BY 1),
      tr AS (SELECT lang, n_docs,
          CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS t_raw
        FROM counts),
      tt AS (SELECT lang, n_docs,
          CASE WHEN (t_raw + 1) * (t_raw + 1) <= n_docs THEN t_raw + 1
               WHEN t_raw * t_raw > n_docs THEN t_raw - 1
               ELSE t_raw END AS sqrt_n
        FROM tr),
      s AS (SELECT CAST(SUM(sqrt_n) AS BIGINT) AS st,
              CAST(SUM(n_docs) AS BIGINT) AS total FROM tt),
      w AS (SELECT lang, n_docs, sqrt_n,
          (1000000 * n_docs) // total AS actual_ppm,
          greatest(1, (1000000 * sqrt_n) // st) AS target_ppm
        FROM tt, s),
      k AS (SELECT MIN((1000000 * n_docs) // target_ppm) AS k_scaled FROM w)
      SELECT lang, n_docs, sqrt_n, actual_ppm, target_ppm,
        CAST(least(1000000,
          (1000000 * ((k_scaled * target_ppm) // 1000000)) // n_docs)
          AS BIGINT) AS rate_ppm,
        CAST((k_scaled * target_ppm) // 1000000 AS BIGINT) AS expected_kept
      FROM w, k
      ORDER BY lang"""))

  /** Data-selection importance weights by TARGET-DOMAIN affinity — the
    * linearized, exact-integer cousin of DSIR (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * given a target predicate (a trusted high-quality slice — here a
    * language, in production a curated reference corpus), score every
    * document by how its unigram mass rates under the target distribution
    * versus the whole corpus. Docs whose tokens are characteristic of the
    * target score > 1e6; boilerplate scores below. Feed the score into
    * [[weightedSample]] and the pipeline is importance RESAMPLING toward
    * the target domain.
    *
    * Exactness: token rates are Laplace-smoothed ppm integers
    * (`greatest(1, (10⁶·(c+1)) DIV (T+V))` — q65's probability
    * quantization, floored at 1 ppm so a corpus past 10⁶·(c+1) tokens
    * can't quantize a rate to zero: without the floor a doc whose tokens
    * all underflow would zero the affinity denominator and fail the
    * division under ANSI mode), a doc's affinity is
    * `(10⁶·Σ tf·rate_target) DIV Σ tf·rate_corpus` — BIGINT throughout,
    * order-independent, engine-portable. Valid bounds: overflow at
    * Σ tf·rate ≤ n_toks·10⁶ (docs up to ~10¹² tokens fit); underflow
    * handled by the 1-ppm floor (rates saturate at the floor once
    * corpus tokens exceed ~10⁶·(c+1)).
    *
    * Scale shape: one corpus explode → (doc, tok) tf aggregation (the
    * only corpus-sized shuffle — q53 TF-IDF's shape); token rates are a
    * vocabulary-sized re-aggregation with conditional sums (target is a
    * flag, not a second scan) joined back on the token key; the scalar
    * totals ride a broadcast. */
  def domainAffinity(docs: DataFrame,
      isTarget: org.apache.spark.sql.Column): DataFrame = {
    val tf = docs
      .select(col("doc_id"), isTarget.cast(LongType).as("tgt"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("tgt")).as("tgt"))
    val rates = tf.groupBy(col("tok"))
      .agg(sum(when(col("tgt") === 1L, col("tf")).otherwise(0L)).as("ct"),
        sum(col("tf")).as("cc"))
    val totals = rates.agg(
      sum(col("ct")).as("tt"), sum(col("cc")).as("tc"),
      count(lit(1)).as("v"))
    val rated = rates.crossJoin(broadcast(totals))
      .select(col("tok"),
        expr("greatest(1L, (1000000 * (ct + 1)) DIV (tt + v))").as("rt_ppm"),
        expr("greatest(1L, (1000000 * (cc + 1)) DIV (tc + v))").as("rc_ppm"))
    tf.join(rated, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("tf")).as("n_toks"),
        expr("(1000000 * SUM(tf * rt_ppm)) DIV SUM(tf * rc_ppm)")
          .as("affinity_ppm"))
  }

  /** Oracle fixture of [[domainAffinity]]: target = English documents —
    * en docs must dominate the top of the affinity ordering. */
  private val q141 = GQuery(
    "q141_domain_affinity",
    (s, dir) => domainAffinity(t(s, dir, "documents"), col("lang") === "en")
      .orderBy(col("doc_id")),
    Some("""WITH e AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
            unnest(string_split(text, ' ')) AS tok
          FROM documents),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf, MAX(tgt) AS tgt
             FROM e WHERE len(tok) > 0 GROUP BY doc_id, tok),
      rates AS (SELECT tok,
          SUM(CASE WHEN tgt = 1 THEN tf ELSE 0 END) AS ct,
          SUM(tf) AS cc
        FROM tf GROUP BY tok),
      totals AS (SELECT SUM(ct) AS tt, SUM(cc) AS tc, COUNT(*) AS v
                 FROM rates),
      rated AS (SELECT tok,
          GREATEST(1, (1000000 * (ct + 1)) // (tt + v)) AS rt_ppm,
          GREATEST(1, (1000000 * (cc + 1)) // (tc + v)) AS rc_ppm
        FROM rates, totals)
      SELECT doc_id, COUNT(*) AS n_types, CAST(SUM(tf) AS BIGINT) AS n_toks,
        CAST((1000000 * SUM(tf * rt_ppm)) // SUM(tf * rc_ppm) AS BIGINT)
          AS affinity_ppm
      FROM tf JOIN rated USING (tok)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Multi-class Naive-Bayes-family text classifier with in-sample
    * confusion eval — the learned alternative to [[TextQ]]'s q31 n-gram
    * lang-id heuristic, and the lightweight quality/domain classifier
    * shape (fastText-class) a curation pipeline trains on weak labels.
    *
    * Scoring is POSTERIOR VOTING, kept exact-integer: per (token, class)
    * a Laplace-smoothed ppm rate `greatest(1, (10⁶·(ct+1)) DIV (T_c+V))`
    * (floored at 1 ppm so huge class corpora can't quantize a token's
    * whole rate row to zero and void its posterior denominator) over the
    * FULL token×class grid (absent pairs get the smoothed-zero rate, so
    * every class competes on every token), normalized per token into a
    * posterior `(10⁶·rate_c) DIV Σ_c' rate_c'`, and a document's class
    * score is Σ tf·posterior — each token votes with its class posterior,
    * so a rare discriminative token contributes its full 10⁶-mass vote
    * while a token common to all classes splits its vote evenly and
    * cancels. (The Σ tf·log p formulation would need FP logs; posterior
    * voting is the standard argmax-preserving integer surrogate with far
    * better discrimination than raw Σ tf·rate, which head tokens
    * dominate.) Argmax by (score desc, class) — a total order — reported
    * as a (true, predicted) confusion matrix. Resubstitution eval
    * (train = eval corpus) like the q99/q115 eval cards; the
    * split-hygiene operators (q48/q81) supply held-out variants.
    *
    * Scale shape: one corpus explode → (doc, tok) tf (the corpus-sized
    * shuffle, reused by the rate build via its exchange); the posterior
    * grid is |vocabulary|·|classes| rows (classes must be few — lang-id /
    * quality tiers, not open-world) built with one window over the token
    * key; the scoring join fans each (doc, tok) row out |classes| ways
    * before the per-(doc, class) aggregation; class totals ride
    * broadcasts. */
  def nbConfusion(docs: DataFrame, labelCol: String,
      reliable: Boolean = false): DataFrame = {
    val tf = docs
      .select(col("doc_id"), col(labelCol).as("true_label"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("true_label"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // counts is vocabulary×classes-sized; materialize it ONCE (lineage
    // cut, the connectedComponents pattern) — it has four consumers
    // (vocab scalar, class totals, token list, the grid's left join),
    // and without the cut each one re-executes the corpus explode: the
    // probe measured 5 parquet scans and 5.6× wall at 10× data, vs 2
    // scans (this counts build + the scoring join) and ~2× after.
    val countsLazy = tf.groupBy(col("tok"), col("true_label").as("cls"))
      .agg(sum(col("tf")).as("ct"))
    val counts =
      if (reliable) countsLazy.checkpoint() else countsLazy.localCheckpoint()
    val v = counts.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val cls = counts.groupBy(col("cls")).agg(sum(col("ct")).as("tc"))
      .crossJoin(broadcast(v))
    val grid = counts.select(col("tok")).distinct()
      .crossJoin(broadcast(cls))
      .join(counts, Seq("tok", "cls"), "left")
      .select(col("tok"), col("cls"),
        // floored at 1 ppm like [[domainAffinity]]'s rates: past
        // ~10⁶·(ct+1) class tokens the smoothed rate quantizes to zero,
        // and an all-zero token row would zero the posterior window total
        expr("greatest(1L, (1000000 * (coalesce(ct, 0) + 1)) DIV (tc + v))")
          .as("rate_ppm"))
    val wt = Window.partitionBy(col("tok"))
    val posts = grid
      .withColumn("tot", sum(col("rate_ppm")).over(wt))
      .select(col("tok"), col("cls"),
        expr("(1000000 * rate_ppm) DIV tot").as("post_ppm"))
    val scores = tf.join(posts, Seq("tok"))
      .groupBy(col("doc_id"), col("true_label"), col("cls"))
      .agg(sum(col("tf") * col("post_ppm")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls"))
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("true_label"), col("cls").as("pred_label"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Oracle fixture of [[nbConfusion]] on language labels. NOTE: the
    * synthetic corpus's five "languages" share one identical 31-token
    * vocabulary (verified: every lang pair's vocab overlap is 31/31), so
    * lexical lang-id on THIS fixture is near-chance by construction —
    * only rate differences carry signal. The oracle pins the exact
    * arithmetic; the CurationSpec planted-vocabulary tests are what
    * demonstrate discrimination when lexical signal exists. */
  private val q143 = GQuery(
    "q143_nb_confusion",
    (s, dir) => nbConfusion(t(s, dir, "documents"), "lang")
      .orderBy(col("true_label"), col("pred_label")),
    Some("""WITH e AS (SELECT doc_id, lang AS true_label,
            unnest(string_split(text, ' ')) AS tok
          FROM documents),
      tf AS (SELECT doc_id, true_label, tok, COUNT(*) AS tf
             FROM e WHERE len(tok) > 0 GROUP BY 1, 2, 3),
      counts AS (SELECT tok, true_label AS cls, CAST(SUM(tf) AS BIGINT) AS ct
                 FROM tf GROUP BY 1, 2),
      v AS (SELECT COUNT(DISTINCT tok) AS v FROM counts),
      cls AS (SELECT cls, tc, v
              FROM (SELECT cls, CAST(SUM(ct) AS BIGINT) AS tc
                    FROM counts GROUP BY 1), v),
      toks AS (SELECT DISTINCT tok FROM counts),
      grid AS (SELECT t.tok, c.cls,
          GREATEST(1, (1000000 * (COALESCE(ct, 0) + 1)) // (c.tc + c.v))
            AS rate_ppm
        FROM toks t CROSS JOIN cls c
        LEFT JOIN counts ON counts.tok = t.tok AND counts.cls = c.cls),
      posts AS (SELECT tok, cls,
          (1000000 * rate_ppm) //
            (SUM(rate_ppm) OVER (PARTITION BY tok)) AS post_ppm
        FROM grid),
      scores AS (SELECT tf.doc_id, tf.true_label, posts.cls,
          CAST(SUM(tf.tf * post_ppm) AS BIGINT) AS score
        FROM tf JOIN posts ON tf.tok = posts.tok
        GROUP BY 1, 2, 3),
      pred AS (SELECT doc_id, true_label, cls AS pred_label
        FROM scores
        QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY score DESC, cls) = 1)
      SELECT true_label, pred_label, COUNT(*) AS n_docs
      FROM pred
      GROUP BY 1, 2
      ORDER BY true_label, pred_label"""))

  /** Per-class DEFINING tokens by smoothed odds ratio (one-vs-rest) —
    * the "fightin' words" analysis: for every class, the top-k tokens
    * whose occurrence odds inside the class most exceed their odds
    * outside it. Complements q126 (two-source rate deltas, head-biased)
    * with a proper association measure across ALL classes at once, and
    * feeds vocabulary audits of [[nbConfusion]]-style classifiers.
    *
    * Exactness across engines needs 128-bit intermediates: the smoothed
    * OR `((a+1)·(r0−b+1)) / ((b+1)·(r1−a+1))` multiplies token counts,
    * so both sides compute in wide integers — Spark DECIMAL(38,0) `div`,
    * DuckDB HUGEINT `//` — which agree digit-for-digit (verified). The
    * ppm value is saturated at 10⁹ (OR 1000×, "exclusive to the class")
    * BEFORE the division — `least(num, cap·den) DIV den` — so the
    * quotient always fits BIGINT and near-exclusive tokens can't
    * overflow; valid to ~10¹² tokens per class side. */
  def classTokens(docs: DataFrame, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ct = docs
      .select(col(labelCol).as("cls"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok"), col("cls")).agg(count(lit(1)).as("a"))
    val wt = Window.partitionBy(col("tok"))
    val tot = ct.agg(sum(col("a")).as("t_all"))
    val cls = ct.groupBy(col("cls")).agg(sum(col("a")).as("r1"))
    val or = ct
      .withColumn("at", sum(col("a")).over(wt))
      .join(broadcast(cls), Seq("cls"))
      .crossJoin(broadcast(tot))
      .withColumn("b", col("at") - col("a"))
      .withColumn("r0", col("t_all") - col("r1"))
      .withColumn("or_ppm", expr(
        """least(
             CAST(1000000 AS DECIMAL(38,0)) * (a + 1) * (r0 - b + 1),
             CAST(1000000000 AS DECIMAL(38,0)) * ((b + 1) * (r1 - a + 1)))
           div (CAST(b + 1 AS DECIMAL(38,0)) * (r1 - a + 1))""").cast(LongType))
    val wc = Window.partitionBy(col("cls"))
      .orderBy(col("or_ppm").desc, col("tok"))
    or.withColumn("rn", row_number().over(wc).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("cls"), col("rn"), col("tok"), col("a"), col("b"),
        col("or_ppm"))
  }

  /** Oracle fixture of [[classTokens]]: top-5 defining tokens per
    * language. */
  private val q150 = GQuery(
    "q150_class_tokens",
    (s, dir) => classTokens(t(s, dir, "documents"), "lang", k = 5)
      .orderBy(col("cls"), col("rn")),
    Some("""WITH e AS (SELECT lang AS cls, unnest(string_split(text, ' ')) AS tok
          FROM documents),
      ct AS (SELECT tok, cls, COUNT(*) AS a
             FROM e WHERE len(tok) > 0 GROUP BY 1, 2),
      tt AS (SELECT tok, CAST(SUM(a) AS BIGINT) AS at FROM ct GROUP BY 1),
      cl AS (SELECT cls, CAST(SUM(a) AS BIGINT) AS r1 FROM ct GROUP BY 1),
      tot AS (SELECT CAST(SUM(a) AS BIGINT) AS t_all FROM ct),
      o AS (SELECT ct.cls, ct.tok, ct.a, tt.at - ct.a AS b,
          CAST(least(
              CAST(1000000 AS HUGEINT) * (ct.a + 1) * (tot.t_all - cl.r1 - (tt.at - ct.a) + 1),
              CAST(1000000000 AS HUGEINT) * (((tt.at - ct.a) + 1) * (cl.r1 - ct.a + 1)))
            // (CAST((tt.at - ct.a) + 1 AS HUGEINT) * (cl.r1 - ct.a + 1))
            AS BIGINT) AS or_ppm
        FROM ct JOIN tt USING (tok) JOIN cl USING (cls), tot)
      SELECT cls, rn, tok, a, b, or_ppm FROM (
        SELECT cls, tok, a, b, or_ppm,
          CAST(ROW_NUMBER() OVER (PARTITION BY cls
            ORDER BY or_ppm DESC, tok) AS BIGINT) AS rn
        FROM o)
      WHERE rn <= 5
      ORDER BY cls, rn"""))

  /** Length-bucketed dynamic batching — the dataloader layout that CUTS
    * the padding waste [[q133]] measures: docs of similar token length
    * land in the same batch, so the per-batch `max_len` padding target
    * is tight. Docs bucket by `n_toks DIV bucketWidth`; within a length
    * bucket, batches are consecutive `batchSize` runs in (n_toks,
    * doc_id) order; each batch row reports its size, max length, token
    * sum, and exact padding waste ppm.
    *
    * The within-bucket rank does NOT serialize per bucket (a corpus of
    * mostly-median-length docs would put everything in one length
    * bucket): the order key is (n_toks, doc_id), and n_toks is constant
    * within a (bucket, n_toks) sub-group — so the rank is computed as
    * per-(bucket, n_toks) windows plus a broadcast cumulative-offset
    * table over the DISTINCT-LENGTH histogram (bounded by max doc
    * length, tiny), the round-6 packing construction. The oracle is the
    * NAIVE per-bucket ROW_NUMBER, so the hash-match proves equivalence. */
  def lengthBucketedBatches(docs: DataFrame, bucketWidth: Long = 64L,
      batchSize: Long = 32L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val d = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("bucket", expr(s"n_toks DIV ${bucketWidth}L"))
    val offsets = d.groupBy(col("bucket"), col("n_toks"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(
        sum(col("n")).over(Window.partitionBy(col("bucket"))
          .orderBy(col("n_toks"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("n_toks"), col("off"))
    val w = Window.partitionBy(col("bucket"), col("n_toks"))
      .orderBy(col("doc_id"))
    d.withColumn("rib", row_number().over(w).cast(LongType))
      .join(broadcast(offsets), Seq("bucket", "n_toks"))
      .withColumn("batch", expr(s"(off + rib - 1) DIV ${batchSize}L"))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_toks")).as("max_toks"),
        sum(col("n_toks")).as("sum_toks"))
      .withColumn("pad_ppm", expr(
        "(1000000 * (n_docs * max_toks - sum_toks)) DIV (n_docs * max_toks)"))
  }

  /** Oracle fixture of [[lengthBucketedBatches]] (width 16, batches of
    * 8) — the oracle ranks with the naive per-bucket window, so the
    * hash-match proves the offset construction ≡ the serialized rank. */
  private val q154 = GQuery(
    "q154_bucketed_batches",
    (s, dir) => lengthBucketedBatches(t(s, dir, "documents"),
        bucketWidth = 16L, batchSize = 8L)
      .orderBy(col("bucket"), col("batch")),
    Some("""WITH d AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        FROM documents WHERE len(string_split(text, ' ')) > 0),
      b AS (SELECT doc_id, n_toks, n_toks // 16 AS bucket FROM d),
      r AS (SELECT bucket, n_toks,
          (CAST(ROW_NUMBER() OVER (PARTITION BY bucket
             ORDER BY n_toks, doc_id) AS BIGINT) - 1) // 8 AS batch
        FROM b)
      SELECT bucket, batch, COUNT(*) AS n_docs,
        MAX(n_toks) AS max_toks, CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
        CAST((1000000 * (COUNT(*) * MAX(n_toks) - SUM(n_toks)))
          // (COUNT(*) * MAX(n_toks)) AS BIGINT) AS pad_ppm
      FROM r GROUP BY 1, 2
      ORDER BY bucket, batch"""))

  /** Classifier calibration curve (reliability diagram) — the eval card
    * that tells a curation pipeline whether a quality/domain score's
    * NUMBERS mean what they claim: ppm scores bucket into `buckets`
    * equal bands, and each band reports how often its docs are actually
    * positive next to the band's mean claimed score. A calibrated score
    * tracks the diagonal; the gap per band is the actionable output
    * (which score region to recalibrate or threshold around). Pairs
    * with [[nbConfusion]] (argmax quality) and [[q150]] (vocabulary
    * audit) as the third standard classifier card.
    *
    * Exact-integer: scores are ppm, bands are `score DIV (10⁶/buckets)`
    * clamped to the top band, observed rates and mean scores are ppm
    * via BIGINT DIV — engine-portable like every eval card here. One
    * hash aggregation on the band id; |buckets| output rows. */
  def calibrationCurve(docs: DataFrame, scorePpm: org.apache.spark.sql.Column,
      isPositive: org.apache.spark.sql.Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 1 && 1000000 % buckets == 0,
      s"buckets must divide 1e6, got $buckets")
    val width = 1000000L / buckets
    docs.select(scorePpm.cast(LongType).as("score_ppm"),
        isPositive.cast(LongType).as("pos"))
      .withColumn("band",
        least(lit(buckets - 1L), expr(s"greatest(0L, score_ppm) DIV ${width}L")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
        sum(col("score_ppm")).as("score_sum"))
      .select(col("band"), col("n_docs"), col("n_pos"),
        expr("(1000000 * n_pos) DIV n_docs").as("observed_ppm"),
        expr("score_sum DIV n_docs").as("mean_score_ppm"))
  }

  /** Oracle fixture of [[calibrationCurve]]: score = stopword-ratio ppm
    * (the gibberish signal), truth = the doc is English — "does a high
    * stopword ratio actually mean English here, and how linearly". */
  private val q155 = {
    val stop = stopWords.map(w => s"'$w'").mkString(", ")
    GQuery(
      "q155_calibration_curve",
      (s, dir) => calibrationCurve(
        t(s, dir, "documents").filter(size(split(col("text"), " ")) > 0),
        expr(s"(1000000 * CAST(size(filter(split(text, ' '), x -> x IN ($stop))) AS BIGINT))" +
          " DIV size(split(text, ' '))"),
        col("lang") === "en")
        .orderBy(col("band")),
      Some(s"""WITH d AS (SELECT
            (1000000 * CAST(len(list_filter(string_split(text, ' '),
               x -> x IN ($stop))) AS BIGINT))
              // len(string_split(text, ' ')) AS score_ppm,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents WHERE len(string_split(text, ' ')) > 0),
        b AS (SELECT LEAST(9, GREATEST(0, score_ppm) // 100000) AS band,
            score_ppm, pos
          FROM d)
        SELECT band, COUNT(*) AS n_docs, CAST(SUM(pos) AS BIGINT) AS n_pos,
          CAST((1000000 * SUM(pos)) // COUNT(*) AS BIGINT) AS observed_ppm,
          CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS mean_score_ppm
        FROM b GROUP BY band
        ORDER BY band"""))
  }

  /** Budget waterfilling — the mixture PLANNER that answers "I want mix
    * w but source s only has c_s tokens": allocate a total token
    * `budget` across strata proportionally to `weight_ppm`, capping each
    * stratum at its `capacity` and re-flowing the excess into the
    * unsaturated strata (max-min fair / water-filling). This is the
    * step BEFORE [[temperatureRebalance]]-style sampling: the sampler
    * needs feasible per-stratum targets, and naive `w·B` targets
    * overdraw any stratum that ran out.
    *
    * Exact-integer closed form: strata sort by saturation level
    * `floor(c·10⁶ / w)` (stratum tiebreak — the canonical order both
    * engines replay); a stratum is saturated iff its proportional share
    * of the budget REMAINING after all earlier (lower-level) strata
    * saturate covers its capacity — evaluated by exact cross-
    * multiplication `c · W_after ≤ R_before · w` (no division, no FP;
    * fits BIGINT for capacities ≤ ~10¹² tokens since Σw ≤ 10⁶).
    * Unsaturated strata get `(budget − Σ sat capacity) · w DIV Σ unsat
    * w` (floor); the ≤|strata|−1 remainder tokens stay unallocated —
    * reported, never silently re-spread. All windows run over the
    * |strata|-row table; nothing is corpus-sized. */
  def budgetWaterfill(strata: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val s = strata.select(col("stratum"),
        col("capacity").cast(LongType).as("capacity"),
        col("weight_ppm").cast(LongType).as("weight_ppm"))
      // loud guard: a zero/negative weight or capacity is a caller bug
      // (and the saturation-level division would be an opaque div/0)
      .withColumn("lvl", expr(
        "CASE WHEN weight_ppm <= 0 THEN raise_error(concat(" +
          "'graft.budgetWaterfill: stratum ', stratum, " +
          "' has weight_ppm <= 0')) " +
          "WHEN capacity < 0 THEN raise_error(concat(" +
          "'graft.budgetWaterfill: stratum ', stratum, " +
          "' has negative capacity')) " +
          "ELSE (capacity * 1000000) DIV weight_ppm END"))
    val ord = Window.orderBy(col("lvl"), col("stratum"))
    val all = Window.partitionBy()
    s
      .withColumn("cum_c", coalesce(sum(col("capacity")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cum_w", coalesce(sum(col("weight_ppm")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot_w", sum(col("weight_ppm")).over(all))
      .withColumn("saturated",
        col("capacity") * (col("tot_w") - col("cum_w")) <=
          (lit(budget) - col("cum_c")) * col("weight_ppm"))
      .withColumn("sat_c", sum(when(col("saturated"), col("capacity"))
        .otherwise(0L)).over(all))
      .withColumn("unsat_w", sum(when(col("saturated"), 0L)
        .otherwise(col("weight_ppm"))).over(all))
      .withColumn("allocated", when(col("saturated"), col("capacity"))
        .otherwise(expr(
          s"greatest(0L, (($budget - sat_c) * weight_ppm) DIV unsat_w)")))
      .select(col("stratum"), col("capacity"), col("weight_ppm"),
        col("saturated"), col("allocated"))
  }

  /** Oracle fixture of [[budgetWaterfill]]: capacities = per-language
    * token counts of the corpus, a deliberately skewed target mix, and
    * a budget of half the corpus — small languages saturate, the bulk
    * re-flows into the big ones. */
  private val q160 = GQuery(
    "q160_budget_waterfill",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val caps = docs.groupBy(col("lang").as("stratum"))
        .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("capacity"))
      val weights = Seq(("en", 400000L), ("de", 250000L), ("fr", 150000L),
        ("es", 120000L), ("zh", 80000L)).toDF("stratum", "weight_ppm")
      // one scalar collect (the budget) — bounded driver traffic, the
      // kmeans-centroid convention
      val total = docs.agg(
        sum(size(split(col("text"), " ")).cast(LongType))).head().getLong(0)
      budgetWaterfill(caps.join(weights, Seq("stratum")), total / 2)
        .orderBy(col("stratum"))
    },
    Some("""WITH caps AS (SELECT lang AS stratum,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS capacity
        FROM documents GROUP BY lang),
      wts(stratum, weight_ppm) AS (VALUES ('en', 400000), ('de', 250000),
        ('fr', 150000), ('es', 120000), ('zh', 80000)),
      b AS (SELECT CAST(SUM(len(string_split(text, ' '))) // 2 AS BIGINT)
              AS budget FROM documents),
      s AS (SELECT stratum, capacity, CAST(weight_ppm AS BIGINT) AS weight_ppm,
          (capacity * 1000000) // CAST(weight_ppm AS BIGINT) AS lvl
        FROM caps JOIN wts USING (stratum)),
      pre AS (SELECT s.*, b.budget,
          CAST(COALESCE(SUM(capacity) OVER (ORDER BY lvl, stratum
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum_c,
          CAST(COALESCE(SUM(weight_ppm) OVER (ORDER BY lvl, stratum
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum_w,
          CAST(SUM(weight_ppm) OVER () AS BIGINT) AS tot_w
        FROM s, b),
      sat AS (SELECT *,
          capacity * (tot_w - cum_w) <= (budget - cum_c) * weight_ppm
            AS saturated
        FROM pre),
      tot AS (SELECT *,
          CAST(SUM(CASE WHEN saturated THEN capacity ELSE 0 END) OVER ()
            AS BIGINT) AS sat_c,
          CAST(SUM(CASE WHEN saturated THEN 0 ELSE weight_ppm END) OVER ()
            AS BIGINT) AS unsat_w
        FROM sat)
      SELECT stratum, capacity, weight_ppm, saturated,
        CASE WHEN saturated THEN capacity
             ELSE GREATEST(0, ((budget - sat_c) * weight_ppm) // unsat_w)
        END AS allocated
      FROM tot
      ORDER BY stratum"""))

  /** Exact quota apportionment (Hamilton's largest-remainder method) —
    * "build a 10,000-doc eval set that mirrors the corpus strata
    * EXACTLY": each stratum gets `⌊seats·n/total⌋` seats, and the
    * leftover seats (< |strata|) go to the largest fractional
    * remainders, remainder computed exactly as `(seats·n) mod total`
    * (tie → stratum name). Guarantees Σ allocated = seats and every
    * stratum within 1 of its exact quota — what naive per-stratum
    * rounding violates (can over/undershoot the total by |strata|/2).
    * Complements [[budgetWaterfill]]: that op caps by capacity,
    * this one hits an exact total. |strata|-row windows only;
    * `seats·n` needs BIGINT — safe to seats·corpus ≤ ~9·10¹⁸. */
  def apportion(strata: DataFrame, seats: Long): DataFrame = {
    require(seats >= 0, s"seats must be >= 0, got $seats")
    val all = Window.partitionBy()
    strata.select(col("stratum"), col("n").cast(LongType).as("n"))
      .withColumn("tot", sum(col("n")).over(all))
      // loud guard: negative counts are a caller bug; an all-zero count
      // table would otherwise be an opaque div/0
      .withColumn("base", expr(
        s"CASE WHEN n < 0 THEN raise_error(concat(" +
          s"'graft.apportion: stratum ', stratum, ' has negative n')) " +
          s"WHEN tot = 0 THEN raise_error(" +
          s"'graft.apportion: all strata have n = 0 — nothing to apportion')" +
          s" ELSE (${seats}L * n) DIV tot END"))
      .withColumn("rem", expr(s"(${seats}L * n) % tot"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rem").desc, col("stratum"))).cast(LongType))
      .withColumn("extra", lit(seats) - sum(col("base")).over(all))
      .select(col("stratum"), col("n"),
        (col("base") + when(col("rn") <= col("extra"), 1L).otherwise(0L))
          .as("allocated"))
  }

  /** Oracle fixture of [[apportion]]: a 997-seat eval plan over the
    * language strata (997 is coprime to everything in sight, so the
    * remainder ranking actually decides seats). */
  private val q161 = GQuery(
    "q161_apportion",
    (s, dir) => apportion(
        t(s, dir, "documents").groupBy(col("lang").as("stratum"))
          .agg(count(lit(1)).as("n")),
        seats = 997L)
      .orderBy(col("stratum")),
    Some("""WITH s AS (SELECT lang AS stratum, COUNT(*) AS n
          FROM documents GROUP BY lang),
      p AS (SELECT stratum, n,
          CAST(SUM(n) OVER () AS BIGINT) AS tot FROM s),
      q AS (SELECT stratum, n,
          (997 * n) // tot AS base, (997 * n) % tot AS rem,
          tot FROM p),
      r AS (SELECT *,
          CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS BIGINT)
            AS rn,
          997 - CAST(SUM(base) OVER () AS BIGINT) AS extra
        FROM q)
      SELECT stratum, n,
        CAST(base + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS BIGINT)
          AS allocated
      FROM r
      ORDER BY stratum"""))

  /** Per-source quantile normalization — make a quality score COMPARABLE
    * across sources before a global threshold: each doc's score maps to
    * its exact within-source quantile rank `10⁶·(rank−1) DIV (n−1)`
    * (rank by (score, doc_id) — a total order, so ties are
    * deterministic; singleton sources read 0). "Keep qrank ≥ 700000"
    * then means "the top 30% of EVERY source", where a raw-score
    * threshold silently keeps whole easy sources and drops whole hard
    * ones (per-source score scales differ — the classifier-calibration
    * problem [[calibrationCurve]] measures, fixed structurally).
    *
    * The within-source rank uses the [[globalRankBy]] bucket-offset
    * construction PER SOURCE (score floor-div buckets, per-(source,
    * bucket) windows + broadcast offset/count table), so a dominant
    * source never serializes one reducer — same proof obligation as
    * q151/q124: the oracle is the naive per-source ROW_NUMBER, and the
    * hash-match proves equivalence. */
  def quantileNormalize(docs: DataFrame, scoreCol: String,
      groupCol: String = "source", bucketWidth: Long = 64L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val scored = docs.select(col("doc_id"), col(groupCol),
        col(scoreCol).cast(LongType).as("score"))
      // pmod floor-div: uniform bucket widths across zero for negative
      // scores (internal only; Spark DIV ≡ DuckDB // — both truncate)
      .withColumn("b",
        expr(s"(score - pmod(score, ${bucketWidth}L)) DIV ${bucketWidth}L"))
    val offsets = scored.groupBy(col(groupCol), col("b"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(
        sum(col("bn")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_grp",
        sum(col("bn")).over(Window.partitionBy(col(groupCol))))
      .select(col(groupCol), col("b"), col("off"), col("n_grp"))
    val wB = Window.partitionBy(col(groupCol), col("b"))
      .orderBy(col("score"), col("doc_id"))
    scored.withColumn("rib", row_number().over(wB).cast(LongType))
      .join(broadcast(offsets), Seq(groupCol, "b"))
      .select(col("doc_id"), col(groupCol), col("score"),
        expr("CASE WHEN n_grp <= 1 THEN 0L " +
          "ELSE (1000000 * (off + rib - 1)) DIV (n_grp - 1) END")
          .as("qrank_ppm"))
  }

  /** Oracle fixture of [[quantileNormalize]] (score = n_chars, per
    * source, bucket width 16): the naive per-source ROW_NUMBER. */
  private val q163 = GQuery(
    "q163_quantile_normalize",
    (s, dir) => quantileNormalize(t(s, dir, "documents"), "n_chars",
        bucketWidth = 16L)
      .orderBy(col("source"), col("qrank_ppm"), col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, source,
          CAST(n_chars AS BIGINT) AS score FROM documents),
      r AS (SELECT doc_id, source, score,
          CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY score, doc_id) AS BIGINT) AS rnk,
          CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_grp
        FROM d)
      SELECT doc_id, source, score,
        CASE WHEN n_grp <= 1 THEN 0
             ELSE (1000000 * (rnk - 1)) // (n_grp - 1) END AS qrank_ppm
      FROM r
      ORDER BY source, qrank_ppm, doc_id"""))

  /** Content-signature dataset diff — the WIDE-ROW companion to
    * [[WindowQ.snapshotDiff]] (q79): that operator carries the compared
    * column VALUES through the full-outer join and reports a per-column
    * changed bitmask, which is the right tool for narrow dimension
    * state; for a document corpus, carrying megabyte text values through
    * a corpus×2 shuffle just to discover most rows unchanged is the
    * wrong cost model. Here each snapshot first collapses to (key,
    * md5-signature over `hashCols`), so the join moves 32-byte hashes
    * regardless of document width, and the verdict is `added` /
    * `removed` / `changed` / `unchanged` per key — the audit a training
    * run reads before deciding whether a re-train is warranted.
    *
    * Scale shape: one hash agg per snapshot (which also detects
    * duplicate keys — a key appearing twice makes "the" row's diff
    * ill-defined, so it fails loudly with a named error rather than
    * fanning out the join) and one full-outer hash join on the key.
    * Signatures travel as 32-byte hashes, never the content itself, so
    * the shuffle is key+hash-sized at any document width. NULL columns
    * hash via a chr(0) sentinel, distinct from the empty string (a
    * column going NULL→'' is a real change and must classify as one). */
  def contentDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "hashCols must be non-empty")
    def sig(df: DataFrame, side: String): DataFrame =
      df.groupBy(col(keyCol))
        .agg(count(lit(1)).as("c"),
          min(md5(concat_ws("\u0001", hashCols.map(c =>
            coalesce(col(c).cast(StringType), lit("\u0000"))): _*))).as("h"))
        .select(col(keyCol), expr(
          s"""CASE WHEN c > 1 THEN raise_error(concat(
               'graft.contentDiff: duplicate key in $side snapshot: ',
               CAST($keyCol AS STRING)))
             ELSE h END""").as(s"${side}_hash"))
    sig(oldDf, "old").join(sig(newDf, "new"), Seq(keyCol), "full_outer")
      .select(col(keyCol), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("change"))
  }

  /** Oracle fixture of [[contentDiff]]: two synthetic snapshots of the
    * documents table — "old" drops doc_id%10=3, "new" drops doc_id%7=2
    * and revises the text of doc_id%5=0 — so all four classes occur. */
  private val q177 = GQuery(
    "q177_content_diff",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val newSnap = docs.filter(col("doc_id") % 7 =!= 2)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"),
          col("lang"), col("source"))
      contentDiff(oldSnap, newSnap, "doc_id",
          Seq("text", "lang", "source"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH os AS (SELECT doc_id,
          md5(concat_ws(chr(1), coalesce(text, chr(0)),
            coalesce(lang, chr(0)), coalesce(source, chr(0)))) AS old_hash
        FROM documents WHERE doc_id % 10 <> 3),
      ns AS (SELECT doc_id,
          md5(concat_ws(chr(1),
            coalesce(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
              ELSE text END, chr(0)),
            coalesce(lang, chr(0)), coalesce(source, chr(0)))) AS new_hash
        FROM documents WHERE doc_id % 7 <> 2)
      SELECT COALESCE(os.doc_id, ns.doc_id) AS doc_id, old_hash, new_hash,
        CASE WHEN old_hash IS NULL THEN 'added'
          WHEN new_hash IS NULL THEN 'removed'
          WHEN old_hash = new_hash THEN 'unchanged'
          ELSE 'changed' END AS change
      FROM os FULL OUTER JOIN ns ON os.doc_id = ns.doc_id
      ORDER BY doc_id"""))

  /** Post-stratification raking (Deming–Stephan iterative proportional
    * fitting) — JOINT mixture balancing: univariate targets
    * ([[mixtureWeights]], q64) fix one margin at a time, but when source
    * and language are associated (the q184 χ² signal), fixing the
    * language mix breaks the source mix and vice versa. Raking
    * alternately scales each (a, b) cell's weight to the uniform target
    * row mass then the uniform target column mass; the fixed point
    * satisfies BOTH margins, and the resulting `weight_ppm` is the
    * per-cell sampling/repeat factor a downstream
    * [[softQualitySample]] / [[repeatByFactor]] consumes.
    *
    * Exact as defined: masses are `o·w` products accumulated in
    * DECIMAL(38,0)/HUGEINT, scale steps are integer quotients
    * `w' = greatest(1, (w·T) DIV M)` — the floor-at-1 keeps a
    * crushed cell alive so no later step divides by a zero mass (the
    * q141 underflow lesson), and every step is order-independent, so
    * the oracle replays the identical unrolled iteration. Convergence
    * is the standard IPF geometric contraction; `rounds` is the
    * contract (like q139's iteration budget), not a tolerance.
    *
    * Plan: one corpus-sized (a,b) agg; each round is two windows over
    * the CELL table (|A|·|B| rows at most) — corpus-size-independent
    * after the first agg; lineage cut per round. */
  def rakeWeights(df: DataFrame, aCol: String, bCol: String,
      rounds: Int = 3, reliable: Boolean = false): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"rounds must be in [1, 20], got $rounds")
    def snap(d: DataFrame): DataFrame =
      if (reliable) d.checkpoint() else d.localCheckpoint()
    val cells0 = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val tot = cells0.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("n_a"), countDistinct(col("b")).as("n_b"))
    var cells = snap(cells0.crossJoin(broadcast(tot))
      .withColumn("w", lit(1000000L)))
    val wa = Window.partitionBy(col("a"))
    val wb = Window.partitionBy(col("b"))
    for (_ <- 1 to rounds) {
      cells = cells
        .withColumn("m", sum(expr("CAST(o AS DECIMAL(38,0)) * w")).over(wa))
        .withColumn("w", expr(
          """greatest(CAST(1 AS BIGINT), CAST((CAST(w AS DECIMAL(38,0))
             * ((CAST(n AS DECIMAL(38,0)) * 1000000) DIV n_a)) DIV m
             AS BIGINT))"""))
      cells = snap(cells
        .withColumn("m", sum(expr("CAST(o AS DECIMAL(38,0)) * w")).over(wb))
        .withColumn("w", expr(
          """greatest(CAST(1 AS BIGINT), CAST((CAST(w AS DECIMAL(38,0))
             * ((CAST(n AS DECIMAL(38,0)) * 1000000) DIV n_b)) DIV m
             AS BIGINT))"""))
        .drop("m"))
    }
    cells.select(col("a"), col("b"), col("o"), col("w").as("weight_ppm"))
  }

  /** Oracle fixture of [[rakeWeights]]: source × lang, 3 rounds,
    * unrolled AS MATERIALIZED (the q180 CTE-inlining lesson). */
  private val q189 = {
    val steps = (1 to 3).map { r =>
      s"""r$r AS MATERIALIZED (SELECT a, b, o,
            GREATEST(CAST(1 AS HUGEINT), (w * ((nn.n * 1000000) // nn.n_a))
              // (SUM(o * w) OVER (PARTITION BY a))) AS w
          FROM c${r - 1}, nn),
        c$r AS MATERIALIZED (SELECT a, b, o,
            GREATEST(CAST(1 AS HUGEINT), (w * ((nn.n * 1000000) // nn.n_b))
              // (SUM(o * w) OVER (PARTITION BY b))) AS w
          FROM r$r, nn)"""
    }.mkString(",\n")
    GQuery(
      "q189_rake_weights",
      (s, dir) => rakeWeights(t(s, dir, "documents"), "source", "lang")
        .orderBy(col("a"), col("b")),
      Some(s"""WITH cells AS MATERIALIZED (
          SELECT source AS a, lang AS b, COUNT(*) AS o
          FROM documents GROUP BY 1, 2),
        nn AS MATERIALIZED (SELECT CAST(SUM(o) AS HUGEINT) AS n,
            CAST(COUNT(DISTINCT a) AS HUGEINT) AS n_a,
            CAST(COUNT(DISTINCT b) AS HUGEINT) AS n_b
          FROM cells),
        c0 AS MATERIALIZED (SELECT a, b, o, CAST(1000000 AS HUGEINT) AS w
          FROM cells),
        $steps
        SELECT a, b, o, CAST(w AS BIGINT) AS weight_ppm FROM c3
        ORDER BY a, b"""))
  }

  /** Classifier reliability card (calibration curve + ECE) — the gate a
    * quality/language classifier must pass BEFORE its scores drive corpus
    * filtering: scores bucket into `bins` equal-width confidence bins;
    * per bin the card reports volume, mean claimed confidence, and the
    * observed positive rate; the gap between the two, volume-weighted, is
    * the expected calibration error. A filter thresholded on an
    * uncalibrated score silently shifts the corpus mixture — this card
    * quantifies by how much, in exact ppm integers (n·|acc−conf| sums are
    * exact, so a changed card means changed data, not float jitter).
    *
    * Plan: one scan → one hash aggregation to ≤ bins rows (map-side
    * combine carries bins partials per task) → a bins-row window for the
    * ECE roll-up (the q229 SUM OVER () histogram-size discipline). The
    * scan is the only data-sized stage at any corpus size. */
  def reliabilityCard(scored: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"reliabilityCard: bins=$bins")
    val width = 1000000L / bins
    scored
      .withColumn("bin", least(expr(s"score_ppm DIV ${width}L"),
        lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("score_ppm")).as("s"))
      .withColumn("conf_ppm", expr("s DIV n"))
      .withColumn("acc_ppm", expr("(1000000 * n_pos) DIV n"))
      .withColumn("gap_ppm", abs(col("acc_ppm") - col("conf_ppm")))
      .withColumn("ece_ppm", expr(
        "SUM(n * gap_ppm) OVER () DIV SUM(n) OVER ()"))
      .select(col("bin"), col("n"), col("n_pos"), col("conf_ppm"),
        col("acc_ppm"), col("gap_ppm"), col("ece_ppm"))
  }

  /** Oracle fixture of [[reliabilityCard]]: a (deliberately naive)
    * stopword-ratio "is English" confidence score — scaled ×5 into the
    * ppm range and clamped — graded against the lang label. The fixture
    * corpus draws every language from one shared vocabulary, so this
    * score is genuinely OVERCONFIDENT about English: the card's nonzero
    * ECE is the real diagnosis, not an artifact. */
  private val q255 = GQuery(
    "q255_reliability_card",
    (s, dir) => reliabilityCard(
      t(s, dir, "documents").select(
        expr("""least(1000000L, 5 * ((1000000 * CAST(size(filter(
            split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
          DIV CAST(size(split(text, ' ')) AS BIGINT)))""").as("score_ppm"),
        (col("lang") === "en").as("label")))
      .orderBy(col("bin")),
    Some("""WITH sc AS (SELECT
          LEAST(1000000, 5 * ((1000000 * CAST(len(list_filter(
              string_split(text, ' '),
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
            // CAST(len(string_split(text, ' ')) AS BIGINT))) AS score_ppm,
          lang = 'en' AS label
        FROM documents),
      b AS (SELECT LEAST(score_ppm // 100000, 9) AS bin, COUNT(*) AS n,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
          CAST(SUM(score_ppm) AS BIGINT) AS s
        FROM sc GROUP BY 1),
      g AS (SELECT bin, n, n_pos, s // n AS conf_ppm,
          (1000000 * n_pos) // n AS acc_ppm
        FROM b)
      SELECT bin, n, n_pos, conf_ppm, acc_ppm,
        ABS(acc_ppm - conf_ppm) AS gap_ppm,
        CAST((SUM(n * ABS(acc_ppm - conf_ppm)) OVER ())
          // (SUM(n) OVER ()) AS BIGINT) AS ece_ppm
      FROM g ORDER BY bin"""))

  /** k-anonymity audit — the privacy gate a training-data or CDR export
    * runs AFTER pseudonymization (q283 hides identifiers; this card asks
    * whether the remaining QUASI-identifiers still single people out):
    * group the export by the quasi-identifier columns and flag every
    * group smaller than `k` — each of its rows is re-identifiable by
    * anyone who knows those attributes, so the export must suppress or
    * generalize them before release. One row per QI combination with
    * its size and verdict, plus the global `at_risk_ppm` (share of ROWS
    * in failing groups — the suppression budget) carried on every row
    * so the gate is a one-value read.
    *
    * Plan: ONE hash aggregation at QI grain, then the ppm roll-up as an
    * unpartitioned window over the QI-GRAIN rows (bounded by distinct
    * combinations, never by the corpus — the dim-window discipline).
    */
  def kAnonymityCard(df: DataFrame, qiCols: Seq[String], k: Long)
      : DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityCard: empty quasi-identifier set")
    require(k >= 2L, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("meets_k", col("n") >= k)
      .withColumn("at_risk_ppm",
        expr(s"(1000000 * sum(CASE WHEN n < ${k}L THEN n ELSE 0L END) " +
          "OVER ()) DIV sum(n) OVER ()"))
      .select(qiCols.map(col) ++ Seq(col("n"), col("meets_k"),
        col("at_risk_ppm")): _*)
  }

  /** Oracle fixture of [[kAnonymityCard]]: the released quasi-identifier
    * triple is (event_type, day, duration decile) at k = 5 — coarse
    * enough that most cells pass, fine enough that rare cells fail, so
    * both verdicts and the suppression budget carry signal. */
  private val q290 = GQuery(
    "q290_k_anonymity",
    (s, dir) => kAnonymityCard(
      t(s, dir, "events").select(
        col("event_type"),
        datediff(expr("CAST(ts AS DATE)"), lit("2024-01-01"))
          .cast(LongType).as("day"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 1000").as("dur_band")),
      Seq("event_type", "day", "dur_band"), k = 5L)
      .orderBy(col("event_type"), col("day"), col("dur_band")),
    Some("""WITH q AS (SELECT event_type,
          CAST(ts AS DATE) - DATE '2024-01-01' AS day,
          CAST(round(value * 100) AS BIGINT) // 1000 AS dur_band
        FROM events),
      g AS (SELECT event_type, day, dur_band, COUNT(*) AS n
        FROM q GROUP BY 1, 2, 3)
      SELECT event_type, day, dur_band, n, n >= 5 AS meets_k,
        CAST((1000000 * SUM(CASE WHEN n < 5 THEN n ELSE 0 END) OVER ())
          // SUM(n) OVER () AS BIGINT) AS at_risk_ppm
      FROM g
      ORDER BY event_type, day, dur_band"""))

  /** l-diversity audit — the companion gate [[kAnonymityCard]] needs:
    * a group can be k-anonymous and still leak by HOMOGENEITY (if all
    * 50 people sharing your quasi-identifiers have the same sensitive
    * value, the attacker learns it without singling you out). Per QI
    * group: size, DISTINCT sensitive values, and the l-verdict; the
    * global `homogeneous_ppm` (share of rows in failing groups) rides
    * every row — the release gate reads k-anonymity AND l-diversity
    * together.
    *
    * Plan: ONE hash aggregation at QI grain (the distinct count is the
    * standard two-phase expand — still QI-keyed), then the ppm roll-up
    * as a window over QI-GRAIN rows only. */
  def lDiversityCard(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversityCard: empty quasi-identifier set")
    require(l >= 2L, s"l must be >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("meets_l", col("n_sensitive") >= l)
      .withColumn("homogeneous_ppm",
        expr(s"(1000000 * sum(CASE WHEN n_sensitive < ${l}L THEN n " +
          "ELSE 0L END) OVER ()) DIV sum(n) OVER ()"))
      .select(qiCols.map(col) ++ Seq(col("n"), col("n_sensitive"),
        col("meets_l"), col("homogeneous_ppm")): _*)
  }

  /** Oracle fixture of [[lDiversityCard]]: the q290 quasi-identifier
    * pair (event_type, day) with the duration decile as the SENSITIVE
    * column at l = 3 — coarser QI than q290 so groups are big enough
    * that the l-verdict (not mere size) is what fails. */
  private val q295 = GQuery(
    "q295_l_diversity",
    (s, dir) => lDiversityCard(
      t(s, dir, "events").select(
        col("event_type"),
        datediff(expr("CAST(ts AS DATE)"), lit("2024-01-01"))
          .cast(LongType).as("day"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 1000").as("dur_band")),
      Seq("event_type", "day"), "dur_band", l = 3L)
      .orderBy(col("event_type"), col("day")),
    Some("""WITH q AS (SELECT event_type,
          CAST(ts AS DATE) - DATE '2024-01-01' AS day,
          CAST(round(value * 100) AS BIGINT) // 1000 AS dur_band
        FROM events),
      g AS (SELECT event_type, day, COUNT(*) AS n,
          CAST(COUNT(DISTINCT dur_band) AS BIGINT) AS n_sensitive
        FROM q GROUP BY 1, 2)
      SELECT event_type, day, n, n_sensitive, n_sensitive >= 3 AS meets_l,
        CAST((1000000 * SUM(CASE WHEN n_sensitive < 3 THEN n ELSE 0 END)
          OVER ()) // SUM(n) OVER () AS BIGINT) AS homogeneous_ppm
      FROM g
      ORDER BY event_type, day"""))

  /** t-closeness audit — the third rung of the release-privacy ladder
    * ([[kAnonymityCard]]: groups big enough; [[lDiversityCard]]:
    * sensitive values diverse enough; THIS: the group's sensitive
    * DISTRIBUTION close enough to the global one). A group can pass
    * both earlier gates and still leak by SKEW — if 90% of the people
    * sharing your quasi-identifiers have the rare sensitive value that
    * is 2% globally, an attacker's posterior jumps 45× without ever
    * singling you out. Per QI group: exact-ppm total-variation
    * distance between the group's sensitive distribution and the
    * global distribution (the standard EMD collapses to TV for
    * categorical sensitive attributes under the discrete metric), the
    * t-verdict, and the global `exposed_ppm` (share of rows in failing
    * groups — the suppression budget, the q290/q295 convention).
    *
    * Scale shape: one (QI, sensitive) count agg is the only data-sized
    * shuffle; the comparison rides a (QI groups × |sensitive values|)
    * GRID — the card's inherent output grain (a value absent from a
    * group still contributes its lost global mass), built by crossing
    * group totals with the broadcast global distribution. */
  def tClosenessCard(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, tPpm: Long): DataFrame = {
    require(qiCols.nonEmpty, "tClosenessCard: empty quasi-identifier set")
    require(tPpm >= 0L && tPpm <= 1000000L,
      s"tPpm must be in [0, 1000000], got $tPpm")
    val qi = qiCols.map(col)
    // (QI, sensitive)-grain cut: the count table feeds group totals,
    // the global distribution, AND the grid join — uncut, each branch
    // re-runs the corpus-sized aggregation (the q298 lesson)
    val g = df.groupBy(qi :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val totals = g.groupBy(qi: _*).agg(sum(col("__c")).as("n"))
    val glob = g.groupBy(col("__s")).agg(sum(col("__c")).as("__g"))
      .crossJoin(broadcast(g.agg(sum(col("__c")).as("__N"))))
      .select(col("__s"), expr("(1000000 * __g) DIV __N").as("__q_ppm"))
    val wAll = Window.partitionBy()
    // NULL-SAFE grid join (<=>): a NULL sensitive value is a CLASS —
    // it carries global mass through `glob` (groupBy keeps the NULL
    // group), so an equi-join here would strand that mass: every
    // group's null-class count would read 0 and tv_ppm would inflate
    // corpus-wide, invisibly (the oracle grid join is IS NOT DISTINCT
    // FROM for the same reason). QI keys are null-safe too — a NULL
    // quasi-identifier is a group like any other.
    val gk = g.select(
      qiCols.map(k => col(k).as(s"__gk_$k")) ++
        Seq(col("__s").as("__gk_s"), col("__c")): _*)
    val gridCond = qiCols.map(k => col(k) <=> col(s"__gk_$k"))
      .foldLeft(col("__s") <=> col("__gk_s"))(_ && _)
    totals.crossJoin(broadcast(glob))
      .join(gk, gridCond, "left")
      .withColumn("__p_ppm",
        expr("(1000000 * coalesce(__c, 0L)) DIV n"))
      .groupBy(qi :+ col("n"): _*)
      .agg(sum(abs(col("__p_ppm") - col("__q_ppm"))).as("__tv2"))
      .withColumn("tv_ppm", expr("__tv2 DIV 2"))
      .withColumn("meets_t", col("tv_ppm") <= tPpm)
      .withColumn("exposed_ppm",
        expr(s"(1000000 * sum(CASE WHEN tv_ppm > ${tPpm}L THEN n " +
          "ELSE 0L END) OVER ()) DIV sum(n) OVER ()"))
      .select(qi ++ Seq(col("n"), col("tv_ppm"), col("meets_t"),
        col("exposed_ppm")): _*)
  }

  /** Oracle fixture of [[tClosenessCard]]: the q295 release shape —
    * QI (event_type, day), sensitive duration band — t = 0.23 sits
    * at the fixture population's ~P80, so both verdicts carry rows. */
  private val q316 = GQuery(
    "q316_t_closeness",
    (s, dir) => tClosenessCard(
      t(s, dir, "events").select(
        col("event_type"),
        datediff(expr("CAST(ts AS DATE)"), lit("2024-01-01"))
          .cast(LongType).as("day"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 1000").as("dur_band")),
      Seq("event_type", "day"), "dur_band", tPpm = 230000L)
      .orderBy(col("event_type"), col("day")),
    Some("""WITH q AS (SELECT event_type,
          CAST(ts AS DATE) - DATE '2024-01-01' AS day,
          CAST(round(value * 100) AS BIGINT) // 1000 AS dur_band
        FROM events),
      g AS (SELECT event_type, day, dur_band,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM q GROUP BY 1, 2, 3),
      tot AS (SELECT event_type, day, SUM(c) AS n FROM g GROUP BY 1, 2),
      gd AS (SELECT dur_band,
          (1000000 * SUM(c)) // (SELECT SUM(c) FROM g) AS q_ppm
        FROM g GROUP BY 1),
      grid AS (SELECT t.event_type, t.day, t.n, gl.dur_band, gl.q_ppm,
          (1000000 * COALESCE(g.c, 0)) // t.n AS p_ppm
        FROM tot t CROSS JOIN gd gl
        LEFT JOIN g ON g.event_type IS NOT DISTINCT FROM t.event_type
          AND g.day IS NOT DISTINCT FROM t.day
          AND g.dur_band IS NOT DISTINCT FROM gl.dur_band),
      tv AS (SELECT event_type, day, CAST(MAX(n) AS BIGINT) AS n,
          CAST(SUM(abs(p_ppm - q_ppm)) // 2 AS BIGINT) AS tv_ppm
        FROM grid GROUP BY 1, 2)
      SELECT event_type, day, n, tv_ppm, tv_ppm <= 230000 AS meets_t,
        CAST((1000000 * SUM(CASE WHEN tv_ppm > 230000 THEN n ELSE 0 END)
          OVER ()) // SUM(n) OVER () AS BIGINT) AS exposed_ppm
      FROM tv
      ORDER BY event_type, day"""))

  /** Gopher-rules quality gate — the published web-filtering rule set
    * (word-count bounds, mean-word-length bounds, symbol-to-word
    * ratio, bullet/ellipsis line shares, alphabetic-word share,
    * minimum stopword count) as one reason BITMASK per document, the
    * q63 discipline (bits, not first-match CASE, so attrition reports
    * are a single group-by on `reason`). q63 is the repo's own
    * signal mix; this card is the standard published recipe a
    * reviewer can cross-reference threshold by threshold — every
    * threshold an explicit knob, every ratio an exact integer ppm.
    * Bits: 1 = word count outside [minWords, maxWords]; 2 = mean word
    * length outside [minWlen, maxWlen] milli; 4 = symbol ratio
    * (`#`/`...` per word) above max; 8 = bullet-started lines above
    * max; 16 = ellipsis-ended lines above max; 32 = alphabetic-word
    * share below min; 64 = fewer than minStop stopwords. NULL text
    * reads as empty (never-drop; fails 1/2/32/64 like any empty doc).
    *
    * Plan: pure map-side — every signal is an expression over the
    * token/line arrays inside the scan projection; zero shuffles. */
  def gopherGate(docs: DataFrame, minWords: Long = 50L,
      maxWords: Long = 100000L, minWlenMilli: Long = 3000L,
      maxWlenMilli: Long = 10000L, maxSymbolPpm: Long = 100000L,
      maxBulletPpm: Long = 900000L, maxEllipsisPpm: Long = 300000L,
      minAlphaPpm: Long = 800000L, minStop: Long = 2L): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got [$minWords, $maxWords]")
    val stop = stopWords.map(w => s"'$w'").mkString(", ")
    docs
      .withColumn("__t", coalesce(col("text"), lit("")))
      .withColumn("__ws",
        expr("filter(split(__t, ' '), w -> length(w) > 0)"))
      .withColumn("__ls", expr("split(__t, '\n')"))
      .select(col("doc_id"),
        expr("CAST(size(__ws) AS BIGINT)").as("n_words"),
        expr("""aggregate(__ws, 0L, (acc, w) ->
          acc + CAST(length(w) AS BIGINT))""").as("n_wchars"),
        expr("""CAST(size(regexp_extract_all(__t, '#', 0))
          + size(regexp_extract_all(__t, '\\.\\.\\.', 0)) AS BIGINT)""")
          .as("n_sym"),
        expr("""CAST(size(filter(__ws, w -> w RLIKE '[a-zA-Z]'))
          AS BIGINT)""").as("n_alpha"),
        expr(s"CAST(size(filter(__ws, w -> w IN ($stop))) AS BIGINT)")
          .as("n_stop"),
        expr("CAST(size(__ls) AS BIGINT)").as("n_lines"),
        expr("""CAST(size(filter(__ls, l -> l LIKE '-%' OR
          l LIKE '*%')) AS BIGINT)""").as("n_bullet"),
        expr("CAST(size(filter(__ls, l -> l LIKE '%...')) AS BIGINT)")
          .as("n_ell"))
      .withColumn("mean_wlen_milli",
        when(col("n_words") > 0L, expr("(1000 * n_wchars) DIV n_words")))
      .withColumn("reason",
        when(col("n_words") < minWords || col("n_words") > maxWords, 1L)
          .otherwise(0L)
          + when(col("n_words") === 0L ||
            col("mean_wlen_milli") < minWlenMilli ||
            col("mean_wlen_milli") > maxWlenMilli, 2L).otherwise(0L)
          + when(col("n_words") > 0L &&
            expr("(1000000 * n_sym) DIV n_words") > maxSymbolPpm, 4L)
            .otherwise(0L)
          + when(expr("(1000000 * n_bullet) DIV n_lines") > maxBulletPpm,
            8L).otherwise(0L)
          + when(expr("(1000000 * n_ell) DIV n_lines") > maxEllipsisPpm,
            16L).otherwise(0L)
          + when(col("n_words") === 0L ||
            expr("(1000000 * n_alpha) DIV n_words") < minAlphaPpm, 32L)
            .otherwise(0L)
          + when(col("n_stop") < minStop, 64L).otherwise(0L))
      .withColumn("keep", (col("reason") === 0L).cast(LongType))
  }

  /** Oracle fixture of [[gopherGate]] — mixed verdicts at the default
    * knobs (≈183 of 500 sf0.001 docs fail the 50-word floor, a handful
    * the stopword floor; the fixture has no symbol/bullet mass, which
    * the spec plants by hand). */
  private val q306 = {
    val stop = stopWords.map(w => s"'$w'").mkString(", ")
    GQuery(
      "q306_gopher_gate",
      (s, dir) => gopherGate(t(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some(s"""WITH sig AS (SELECT doc_id,
            list_filter(string_split(COALESCE(text, ''), ' '),
              w -> len(w) > 0) AS ws,
            string_split(COALESCE(text, ''), chr(10)) AS ls,
            CAST(len(regexp_extract_all(COALESCE(text, ''), '#'))
              + len(regexp_extract_all(COALESCE(text, ''), '\\.\\.\\.'))
              AS BIGINT) AS n_sym
          FROM documents),
        m AS (SELECT doc_id, n_sym,
            CAST(len(ws) AS BIGINT) AS n_words,
            CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0)
              AS BIGINT) AS n_wchars,
            CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha,
            CAST(len(list_filter(ws, w -> w IN ($stop))) AS BIGINT)
              AS n_stop,
            CAST(len(ls) AS BIGINT) AS n_lines,
            CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%'))
              AS BIGINT) AS n_bullet,
            CAST(len(list_filter(ls, l -> l LIKE '%...')) AS BIGINT)
              AS n_ell
          FROM sig),
        v AS (SELECT *,
            CASE WHEN n_words > 0 THEN (1000 * n_wchars) // n_words END
              AS mean_wlen_milli
          FROM m)
        SELECT doc_id, n_words, n_wchars, n_sym, n_alpha, n_stop,
          n_lines, n_bullet, n_ell, mean_wlen_milli,
          (CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END
           + CASE WHEN n_words = 0 OR mean_wlen_milli < 3000
               OR mean_wlen_milli > 10000 THEN 2 ELSE 0 END
           + CASE WHEN n_words > 0
               AND (1000000 * n_sym) // n_words > 100000 THEN 4 ELSE 0 END
           + CASE WHEN (1000000 * n_bullet) // n_lines > 900000
               THEN 8 ELSE 0 END
           + CASE WHEN (1000000 * n_ell) // n_lines > 300000
               THEN 16 ELSE 0 END
           + CASE WHEN n_words = 0
               OR (1000000 * n_alpha) // n_words < 800000
               THEN 32 ELSE 0 END
           + CASE WHEN n_stop < 2 THEN 64 ELSE 0 END)::BIGINT AS reason,
          (CASE WHEN (CASE WHEN n_words < 50 OR n_words > 100000
               THEN 1 ELSE 0 END
             + CASE WHEN n_words = 0 OR mean_wlen_milli < 3000
                 OR mean_wlen_milli > 10000 THEN 2 ELSE 0 END
             + CASE WHEN n_words > 0
                 AND (1000000 * n_sym) // n_words > 100000
                 THEN 4 ELSE 0 END
             + CASE WHEN (1000000 * n_bullet) // n_lines > 900000
                 THEN 8 ELSE 0 END
             + CASE WHEN (1000000 * n_ell) // n_lines > 300000
                 THEN 16 ELSE 0 END
             + CASE WHEN n_words = 0
                 OR (1000000 * n_alpha) // n_words < 800000
                 THEN 32 ELSE 0 END
             + CASE WHEN n_stop < 2 THEN 64 ELSE 0 END) = 0
            THEN 1 ELSE 0 END)::BIGINT AS keep
        FROM v ORDER BY doc_id"""))
  }

  /** Average-precision (PR-AUC) card — the RANKING eval completing the
    * classifier-eval axis (q240's rank-AUC answers "does a random
    * positive outscore a random negative" — insensitive to WHERE in
    * the ranking the wins happen; AP weights precision at every
    * positive's rank, the metric that matches how a curation pipeline
    * actually consumes a scorer: take the top of the list). Ranked by
    * (score DESC, id) — the EXPLICIT unique tiebreak that makes the
    * ranking, and therefore AP, engine-portable (tied scores under an
    * unspecified order would make precision@k nondeterministic);
    * AP_ppm = Σ_{positives} ((10⁶·cumpos) DIV rank) DIV n_pos with
    * per-term truncation identical in both engines, beside
    * precision@10/@100 (denominator least(k, n) so a short list never
    * divides past its end). No positives → NULL AP, row kept.
    *
    * Scale shape: ONE global ordered window — deliberately: the card's
    * input is a ranked EVAL list (labeled eval sets are
    * sampled/bounded by construction, the q219 class), not a corpus;
    * corpus-scale score audits belong to the histogram-grain cards
    * ([[reliabilityCard]], [[calibrationCurve]]). */
  def averagePrecisionCard(scored: DataFrame): DataFrame = {
    val w = Window.orderBy(col("score_ppm").desc, col("id"))
    val cum = Window.orderBy(col("score_ppm").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("__rank", row_number().over(w))
      .withColumn("__cumpos",
        sum(when(col("label"), 1L).otherwise(0L)).over(cum))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("label"),
          expr("(1000000 * __cumpos) DIV __rank"))).as("__apsum"),
        sum(when(col("__rank") <= 10L && col("label"), 1L)
          .otherwise(0L)).as("__hits10"),
        sum(when(col("__rank") <= 100L && col("label"), 1L)
          .otherwise(0L)).as("__hits100"))
      .select(col("n"), col("n_pos"),
        expr("CASE WHEN n_pos > 0 THEN __apsum DIV n_pos END")
          .as("ap_ppm"),
        expr("(1000000 * __hits10) DIV least(10L, n)").as("p10_ppm"),
        expr("(1000000 * __hits100) DIV least(100L, n)").as("p100_ppm"))
  }

  /** Oracle fixture of [[averagePrecisionCard]]: the q255 stopword
    * "is English" scorer, now graded as a RANKER of the corpus. */
  private val q328 = GQuery(
    "q328_average_precision",
    (s, dir) => averagePrecisionCard(
      t(s, dir, "documents").select(
        col("doc_id").as("id"),
        expr("""least(1000000L, 5 * ((1000000 * CAST(size(filter(
            split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
          DIV CAST(size(split(text, ' ')) AS BIGINT)))""").as("score_ppm"),
        (col("lang") === "en").as("label"))),
    Some("""WITH sc AS (SELECT doc_id AS id,
          LEAST(1000000, 5 * ((1000000 * CAST(len(list_filter(
              string_split(text, ' '),
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
            // CAST(len(string_split(text, ' ')) AS BIGINT))) AS score_ppm,
          lang = 'en' AS label
        FROM documents),
      r AS (SELECT label,
          ROW_NUMBER() OVER (ORDER BY score_ppm DESC, id) AS rank,
          SUM(CASE WHEN label THEN 1 ELSE 0 END)
            OVER (ORDER BY score_ppm DESC, id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cumpos
        FROM sc),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos,
          CAST(SUM(CASE WHEN label
            THEN (1000000 * cumpos) // rank END) AS BIGINT) AS apsum,
          CAST(SUM(CASE WHEN rank <= 10 AND label THEN 1 ELSE 0 END)
            AS BIGINT) AS hits10,
          CAST(SUM(CASE WHEN rank <= 100 AND label THEN 1 ELSE 0 END)
            AS BIGINT) AS hits100
        FROM r)
      SELECT n, n_pos,
        CASE WHEN n_pos > 0 THEN apsum // n_pos END AS ap_ppm,
        (1000000 * hits10) // LEAST(10, n) AS p10_ppm,
        (1000000 * hits100) // LEAST(100, n) AS p100_ppm
      FROM agg"""))

  /** Brier-score decomposition — the SHARPNESS view [[reliabilityCard]]
    * deliberately stops short of: ECE says how far claimed confidence
    * sits from observed accuracy, but a scorer that always answers the
    * base rate has PERFECT calibration and zero skill. Murphy's
    * decomposition splits the binned Brier score into reliability
    * (calibration error, lower better), resolution (how far the bins'
    * observed rates spread from the base rate — the SKILL term, higher
    * better), and uncertainty (the base rate's own variance, the
    * scorer-independent floor) — so "calibrated but useless" and
    * "sharp but miscalibrated" become different numbers. All four
    * terms exact ppm: bin means are truncated integers (the q255
    * convention), squared gaps accumulate in DECIMAL(38,0) (HUGEINT in
    * the oracle — DuckDB's DECIMAL `//` routes through a double), one
    * DIV by N·10⁶ each; the raw Brier score computes row-exactly, NOT
    * via the identity (which holds only up to binning truncation).
    *
    * Plan: one scan → one ≤ bins-row hash agg (+ the raw-Brier sums in
    * the same pass via the bin grain) → bins-row roll-up. */
  def brierDecomposition(scored: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"brierDecomposition: bins=$bins")
    val width = 1000000L / bins
    scored
      .withColumn("bin", least(expr(s"score_ppm DIV ${width}L"),
        lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_k"),
        sum(when(col("label"), 1L).otherwise(0L)).as("p_k"),
        sum(col("score_ppm")).as("s_k"),
        sum(expr("""CAST((score_ppm - CASE WHEN label THEN 1000000
          ELSE 0 END) AS DECIMAL(38,0))
          * (score_ppm - CASE WHEN label THEN 1000000 ELSE 0 END)"""))
          .as("sq_k"))
      .withColumn("conf_ppm", expr("s_k DIV n_k"))
      .withColumn("acc_ppm", expr("(1000000 * p_k) DIV n_k"))
      .agg(sum(col("n_k")).as("n"), sum(col("p_k")).as("n_pos"),
        sum(col("sq_k")).as("__sq"),
        sum(expr("""CAST(n_k AS DECIMAL(38,0))
          * (conf_ppm - acc_ppm) * (conf_ppm - acc_ppm)""")).as("__rel"),
        sum(expr("CAST(n_k AS DECIMAL(38,0)) * acc_ppm")).as("__acc_n"),
        collect_list(struct(col("n_k"), col("acc_ppm"))).as("__bins"))
      .withColumn("__obar", expr("(1000000 * n_pos) DIV n"))
      .select(col("n"), col("n_pos"),
        expr("CAST(__sq DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("brier_ppm"),
        expr("CAST(__rel DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("reliability_ppm"),
        expr("""CAST(aggregate(__bins, CAST(0 AS DECIMAL(38,0)),
            (a, b) -> a + CAST(b.n_k AS DECIMAL(38,0))
              * (b.acc_ppm - __obar) * (b.acc_ppm - __obar))
          DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)""")
          .as("resolution_ppm"),
        expr("(__obar * (1000000 - __obar)) DIV 1000000")
          .as("uncertainty_ppm"))
  }

  /** Oracle fixture of [[brierDecomposition]]: the q255 scorer again —
    * its overconfidence shows up as reliability ≫ 0 with resolution
    * well short of uncertainty. */
  private val q329 = GQuery(
    "q329_brier_decomposition",
    (s, dir) => brierDecomposition(
      t(s, dir, "documents").select(
        expr("""least(1000000L, 5 * ((1000000 * CAST(size(filter(
            split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
          DIV CAST(size(split(text, ' ')) AS BIGINT)))""").as("score_ppm"),
        (col("lang") === "en").as("label"))),
    Some("""WITH sc AS (SELECT
          LEAST(1000000, 5 * ((1000000 * CAST(len(list_filter(
              string_split(text, ' '),
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
            // CAST(len(string_split(text, ' ')) AS BIGINT))) AS score_ppm,
          lang = 'en' AS label
        FROM documents),
      b AS (SELECT LEAST(score_ppm // 100000, 9) AS bin,
          CAST(COUNT(*) AS BIGINT) AS n_k,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p_k,
          CAST(SUM(score_ppm) AS BIGINT) AS s_k,
          SUM(CAST(score_ppm - CASE WHEN label THEN 1000000 ELSE 0 END
            AS HUGEINT)
            * (score_ppm - CASE WHEN label THEN 1000000 ELSE 0 END))
            AS sq_k
        FROM sc GROUP BY 1),
      m AS (SELECT bin, n_k, p_k, sq_k, s_k // n_k AS conf_ppm,
          (1000000 * p_k) // n_k AS acc_ppm
        FROM b),
      g AS (SELECT SUM(n_k) AS n, SUM(p_k) AS n_pos, SUM(sq_k) AS sq,
          SUM(CAST(n_k AS HUGEINT) * (conf_ppm - acc_ppm)
            * (conf_ppm - acc_ppm)) AS rel
        FROM m),
      ob AS (SELECT *, (1000000 * n_pos) // n AS obar FROM g),
      res AS (SELECT SUM(CAST(m.n_k AS HUGEINT)
            * (m.acc_ppm - ob.obar) * (m.acc_ppm - ob.obar)) AS ressum
        FROM m, ob)
      SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
        CAST(sq // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
          AS brier_ppm,
        CAST(rel // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
          AS reliability_ppm,
        CAST(ressum // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
          AS resolution_ppm,
        CAST((obar * (1000000 - obar)) // 1000000 AS BIGINT)
          AS uncertainty_ppm
      FROM ob, res"""))

  /** Isotonic calibration map (pool-adjacent-violators) — the FIX for
    * what [[reliabilityCard]] and [[brierDecomposition]] diagnose: a
    * monotone recalibration of the scorer, the standard production
    * answer when a quality/language classifier must gate a corpus but
    * its raw confidences are over- or under-shot (Platt scaling needs a
    * parametric fit; isotonic is the nonparametric one actually used at
    * corpus scale). Per distinct score, the calibrated positive rate of
    * its PAV block — the unique nondecreasing least-squares fit —
    * emitted in exact ppm. All pooling decisions compare block rates by
    * INTEGER cross-multiplication (p₁·n₂ vs p₂·n₁), so the fit is
    * deterministic and engine-portable with no float anywhere.
    *
    * The oracle replays the fit through the minimax identity
    * cal(i) = max_{j≤i} min_{k≥i} rate(j..k) (the closed form the PAV
    * stack computes, per the classical isotonic-regression theorem) —
    * an INDEPENDENT construction, so the hash match proves the
    * algorithm, not the implementation. Extremal windows there order by
    * a double only to pick the argmax/argmin: distinct rationals with
    * denominators ≤ ~10⁸ cannot collide in a double, and equal
    * rationals emit the same ppm either way.
    *
    * Scale shape: ONE corpus-sized aggregation to the distinct-score
    * histogram (bounded by 10⁶+1 ppm values BY CONSTRUCTION, and by
    * distinct scores in practice); the PAV stack folds that bounded
    * histogram driver-side (the q219/q234 bounded-collect class — the
    * config-plane discipline, never row-grain) and returns the
    * score→rate map as a dimension a caller broadcast-joins back. */
  def isotonicCalibration(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    val h = scored.groupBy(col("score_ppm"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("p"))
      .orderBy(col("score_ppm"))
      .select(col("score_ppm"), col("n"), col("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // PAV stack: (nBlock, pBlock, firstIdx); merge while the top block's
    // rate is BELOW its predecessor's (nondecreasing fit), rates compared
    // exactly by cross-multiplication
    val stack = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Int)]
    h.zipWithIndex.foreach { case ((_, n, p), i) =>
      var (bn, bp, bi) = (n, p, i)
      // BigInt cross-multiplication: p·n products exceed Long past
      // ~3e9-row corpora, and this fold is driver-side pennies anyway
      while (stack.nonEmpty &&
          BigInt(stack.last._2) * bn >= BigInt(bp) * stack.last._1) {
        val (pn, pp, pi) = stack.remove(stack.size - 1)
        bn += pn; bp += pp; bi = pi
      }
      stack += ((bn, bp, bi))
    }
    // block extents are [firstIdx, next block's firstIdx)
    val cal = Array.ofDim[Long](h.length)
    val ends = stack.map(_._3).drop(1) :+ h.length
    stack.zip(ends).foreach { case ((bn, bp, bi), end) =>
      val v = (1000000L * bp) / bn
      (bi until end).foreach(i => cal(i) = v)
    }
    import spark.implicits._
    h.zipWithIndex.map { case ((s, n, p), i) => (s, n, p, cal(i)) }
      .toSeq.toDF("score_ppm", "n", "n_pos", "cal_ppm")
  }

  /** Oracle fixture of [[isotonicCalibration]]: the q255 stopword
    * scorer quantized to 20000-ppm steps (≤ 51 distinct scores — the
    * minimax oracle is cubic in the histogram), recalibrated against
    * the lang label. */
  private val q334 = GQuery(
    "q334_isotonic_calibration",
    (s, dir) => isotonicCalibration(
      t(s, dir, "documents").select(
        expr("""(least(1000000L, 5 * ((1000000 * CAST(size(filter(
            split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
          DIV CAST(size(split(text, ' ')) AS BIGINT))) DIV 20000L)
          * 20000L""").as("score_ppm"),
        (col("lang") === "en").as("label")))
      .orderBy(col("score_ppm")),
    Some("""WITH sc AS (SELECT
          (LEAST(1000000, 5 * ((1000000 * CAST(len(list_filter(
              string_split(text, ' '),
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
            // CAST(len(string_split(text, ' ')) AS BIGINT))) // 20000)
            * 20000 AS score_ppm,
          lang = 'en' AS label
        FROM documents),
      h AS (SELECT score_ppm AS s, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM sc GROUP BY 1),
      o AS (SELECT s, n, p, ROW_NUMBER() OVER (ORDER BY s) AS i FROM h),
      pre AS (SELECT i, s, n, p,
          SUM(n) OVER (ORDER BY i) AS cn, SUM(p) OVER (ORDER BY i) AS cp
        FROM o),
      w AS (SELECT a.i AS j, b.i AS k,
          b.cp - a.cp + a.p AS wp, b.cn - a.cn + a.n AS wn
        FROM pre a JOIN pre b ON a.i <= b.i),
      inner_min AS (SELECT t.i, w.j, w.wp, w.wn,
          ROW_NUMBER() OVER (PARTITION BY t.i, w.j
            ORDER BY CAST(w.wp AS DOUBLE) / w.wn ASC, w.wn, w.wp) AS rn
        FROM o t JOIN w ON w.j <= t.i AND w.k >= t.i),
      mn AS (SELECT i, j, wp, wn FROM inner_min WHERE rn = 1),
      outer_max AS (SELECT i, wp, wn,
          ROW_NUMBER() OVER (PARTITION BY i
            ORDER BY CAST(wp AS DOUBLE) / wn DESC, wn, wp) AS rn
        FROM mn),
      fit AS (SELECT i, CAST((1000000 * wp) // wn AS BIGINT) AS cal_ppm
        FROM outer_max WHERE rn = 1)
      SELECT o.s AS score_ppm, o.n, o.p AS n_pos, fit.cal_ppm
      FROM o JOIN fit USING (i)
      ORDER BY score_ppm"""))

  /** Precision–recall curve (threshold-grain) — the OPERATING-POINT
    * view between [[averagePrecisionCard]] (one number over the whole
    * ranking) and [[reliabilityCard]] (probability quality): for every
    * distinct score threshold t, the exact P/R/F1 of the gate
    * "keep score ≥ t" — the table an operator actually reads to choose
    * a corpus-filter threshold. All exact ppm: TP/FP come off one
    * cumulative window over the score histogram, and F1 uses the
    * integer identity F1 = 2·TP / (n_kept + n_pos) (2PR/(P+R) cleared
    * of nested rationals), so no engine-divergent float appears at any
    * point of the curve.
    *
    * Scale shape: one corpus-sized aggregation to the distinct-score
    * histogram (≤ 10⁶+1 rows by construction); the curve is one
    * ordered window over that bounded table (the q229 histogram-window
    * discipline) — never a row-level sort. */
  def prCurve(scored: DataFrame): DataFrame = {
    val h = scored.groupBy(col("score_ppm"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos_at"))
    val w = Window.orderBy(col("score_ppm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    h.withColumn("n_kept", sum(col("n_at")).over(w))
      .withColumn("tp", sum(col("pos_at")).over(w))
      .withColumn("n_pos", sum(col("pos_at")).over(all))
      .select(col("score_ppm").as("threshold_ppm"), col("n_kept"),
        col("tp"),
        expr("(1000000 * tp) DIV n_kept").as("precision_ppm"),
        expr("CASE WHEN n_pos > 0 THEN (1000000 * tp) DIV n_pos END")
          .as("recall_ppm"),
        expr("(2000000 * tp) DIV (n_kept + n_pos)").as("f1_ppm"))
  }

  /** Oracle fixture of [[prCurve]]: the q255 stopword scorer's full
    * operating curve against the lang label. */
  private val q335 = GQuery(
    "q335_pr_curve",
    (s, dir) => prCurve(
      t(s, dir, "documents").select(
        expr("""least(1000000L, 5 * ((1000000 * CAST(size(filter(
            split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
          DIV CAST(size(split(text, ' ')) AS BIGINT)))""").as("score_ppm"),
        (col("lang") === "en").as("label")))
      .orderBy(col("threshold_ppm")),
    Some("""WITH sc AS (SELECT
          LEAST(1000000, 5 * ((1000000 * CAST(len(list_filter(
              string_split(text, ' '),
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
            // CAST(len(string_split(text, ' ')) AS BIGINT))) AS score_ppm,
          lang = 'en' AS label
        FROM documents),
      h AS (SELECT score_ppm AS s, CAST(COUNT(*) AS BIGINT) AS n_at,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS pos_at
        FROM sc GROUP BY 1),
      c AS (SELECT s, SUM(n_at) OVER (ORDER BY s DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_kept,
          SUM(pos_at) OVER (ORDER BY s DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
          SUM(pos_at) OVER () AS n_pos
        FROM h)
      SELECT s AS threshold_ppm, CAST(n_kept AS BIGINT) AS n_kept,
        CAST(tp AS BIGINT) AS tp,
        CAST((1000000 * tp) // n_kept AS BIGINT) AS precision_ppm,
        CAST(CASE WHEN n_pos > 0 THEN (1000000 * tp) // n_pos END
          AS BIGINT) AS recall_ppm,
        CAST((2000000 * tp) // (n_kept + n_pos) AS BIGINT) AS f1_ppm
      FROM c ORDER BY threshold_ppm"""))

  /** Threshold picker — [[prCurve]] folded to the three operating
    * points a gate deployment actually asks for: the F1-optimal
    * threshold, the Youden-J-optimal threshold (TPR − FPR, the
    * balanced-error point), and the COST-optimal threshold under
    * explicit per-mistake prices (cost = cFN·FN + cFP·FP — the corpus
    * curator's real objective: a missed good doc and a kept bad doc
    * are rarely symmetric), beside the no-gate baseline cost (keep
    * nothing: cFN·P) so "don't deploy this scorer" is a visible
    * answer. Every criterion is exact-integer (J in ppm with per-term
    * truncation; costs are plain integer sums) and every argmax breaks
    * ties on the HIGHEST threshold — the conservative gate (keep
    * less) — identically in both engines. Degenerate inputs (no
    * positives / no negatives) keep the row with the affected
    * criteria NULL.
    *
    * Scale shape: the [[prCurve]] histogram windows + one ≤-histogram
    * argmax fold — nothing row-grain. */
  def thresholdPick(scored: DataFrame, costFnMilli: Long = 1000L,
      costFpMilli: Long = 1000L): DataFrame = {
    require(costFnMilli >= 0L && costFpMilli >= 0L,
      "mistake costs must be >= 0")
    val h = scored.groupBy(col("score_ppm"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos_at"))
    val w = Window.orderBy(col("score_ppm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val pts = h
      .withColumn("n_kept", sum(col("n_at")).over(w))
      .withColumn("tp", sum(col("pos_at")).over(w))
      .withColumn("n_pos", sum(col("pos_at")).over(all))
      .withColumn("n_all", sum(col("n_at")).over(all))
      .withColumn("fp", col("n_kept") - col("tp"))
      .withColumn("fn", col("n_pos") - col("tp"))
      .withColumn("f1_ppm", expr("(2000000 * tp) DIV (n_kept + n_pos)"))
      .withColumn("j_ppm", expr(
        """CASE WHEN n_pos > 0 AND n_all > n_pos THEN
             (1000000 * tp) DIV n_pos
             - (1000000 * fp) DIV (n_all - n_pos) END"""))
      .withColumn("cost", expr(
        s"($costFnMilli * fn + $costFpMilli * fp) DIV 1000"))
    // one pass over the bounded point table: argmax per criterion by
    // (criterion, threshold desc) via struct ordering (NULL criteria
    // sort lowest, so max() prefers any defined point)
    pts.agg(
      max(col("n_all")).as("n"), max(col("n_pos")).as("n_pos"),
      max(struct(col("f1_ppm"), col("score_ppm"))).as("__f1"),
      max(struct(col("j_ppm"), col("score_ppm"))).as("__j"),
      min(struct(col("cost"), (col("score_ppm") * -1L).as("neg_s")))
        .as("__c"))
      .select(col("n"), col("n_pos"),
        col("__f1.score_ppm").as("best_f1_threshold_ppm"),
        col("__f1.f1_ppm").as("best_f1_ppm"),
        expr("CASE WHEN __j.j_ppm IS NOT NULL THEN __j.score_ppm END")
          .as("best_j_threshold_ppm"),
        col("__j.j_ppm").as("best_j_ppm"),
        (col("__c.neg_s") * -1L).as("best_cost_threshold_ppm"),
        col("__c.cost").as("min_cost"),
        expr(s"($costFnMilli * n_pos) DIV 1000").as("no_gate_cost"))
  }

  /** Oracle fixture of [[thresholdPick]]: the q255 scorer with a
    * missed-English doc priced 3× a kept-non-English one. */
  private val q336 = GQuery(
    "q336_threshold_pick",
    (s, dir) => thresholdPick(
      t(s, dir, "documents").select(
        expr("""least(1000000L, 5 * ((1000000 * CAST(size(filter(
            split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
          DIV CAST(size(split(text, ' ')) AS BIGINT)))""").as("score_ppm"),
        (col("lang") === "en").as("label")),
      costFnMilli = 3000L, costFpMilli = 1000L),
    Some("""WITH sc AS (SELECT
          LEAST(1000000, 5 * ((1000000 * CAST(len(list_filter(
              string_split(text, ' '),
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
            // CAST(len(string_split(text, ' ')) AS BIGINT))) AS score_ppm,
          lang = 'en' AS label
        FROM documents),
      h AS (SELECT score_ppm AS s, CAST(COUNT(*) AS BIGINT) AS n_at,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS pos_at
        FROM sc GROUP BY 1),
      c AS (SELECT s, SUM(n_at) OVER (ORDER BY s DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_kept,
          SUM(pos_at) OVER (ORDER BY s DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
          SUM(pos_at) OVER () AS n_pos, SUM(n_at) OVER () AS n_all
        FROM h),
      pts AS (SELECT s, n_kept, tp, n_pos, n_all,
          n_kept - tp AS fp, n_pos - tp AS fn,
          (2000000 * tp) // (n_kept + n_pos) AS f1_ppm,
          CASE WHEN n_pos > 0 AND n_all > n_pos THEN
            (1000000 * tp) // n_pos
            - (1000000 * (n_kept - tp)) // (n_all - n_pos) END AS j_ppm,
          (3000 * (n_pos - tp) + 1000 * (n_kept - tp)) // 1000 AS cost
        FROM c),
      pick AS (SELECT CAST(MAX(n_all) AS BIGINT) AS n,
          CAST(MAX(n_pos) AS BIGINT) AS n_pos,
          (SELECT s FROM pts ORDER BY f1_ppm DESC, s DESC LIMIT 1)
            AS best_f1_threshold_ppm,
          (SELECT f1_ppm FROM pts ORDER BY f1_ppm DESC, s DESC LIMIT 1)
            AS best_f1_ppm,
          (SELECT CASE WHEN j_ppm IS NOT NULL THEN s END FROM pts
            ORDER BY j_ppm DESC NULLS LAST, s DESC LIMIT 1)
            AS best_j_threshold_ppm,
          (SELECT j_ppm FROM pts ORDER BY j_ppm DESC NULLS LAST, s DESC
            LIMIT 1) AS best_j_ppm,
          (SELECT s FROM pts ORDER BY cost ASC, s DESC LIMIT 1)
            AS best_cost_threshold_ppm,
          (SELECT cost FROM pts ORDER BY cost ASC, s DESC LIMIT 1)
            AS min_cost,
          (3000 * MAX(n_pos)) // 1000 AS no_gate_cost
        FROM pts)
      SELECT n, n_pos, best_f1_threshold_ppm,
        CAST(best_f1_ppm AS BIGINT) AS best_f1_ppm,
        best_j_threshold_ppm, CAST(best_j_ppm AS BIGINT) AS best_j_ppm,
        best_cost_threshold_ppm, CAST(min_cost AS BIGINT) AS min_cost,
        CAST(no_gate_cost AS BIGINT) AS no_gate_cost
      FROM pick"""))

  /** Calibrated re-diagnosis — the diagnose→fix→re-diagnose loop
    * CLOSED as one composition: the q334 isotonic map, applied back to
    * the corpus through a broadcast join, re-graded by the q255
    * reliability card. The card's post-calibration ECE is the number
    * that says whether the fitted map actually earned its place in the
    * gate (on the fixture it collapses the raw scorer's 43203-ppm ECE
    * to near the binning floor — calibrated scores ARE block rates, so
    * residual gaps measure ppm truncation, not miscalibration). The
    * oracle rebuilds the WHOLE chain — minimax fit, map join,
    * reliability bins — from its verified pieces, so the composition,
    * not just the parts, sits under the hash gate.
    *
    * Scale shape: q334's histogram fit (one corpus agg + driver PAV) +
    * ONE broadcast map join + the q255 ≤bins-row aggregation. */
  private val q337 = GQuery(
    "q337_calibrated_reliability",
    (s, dir) => {
      val scored = t(s, dir, "documents").select(
        expr("""(least(1000000L, 5 * ((1000000 * CAST(size(filter(
            split(text, ' '),
            x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
          DIV CAST(size(split(text, ' ')) AS BIGINT))) DIV 20000L)
          * 20000L""").as("score_ppm"),
        (col("lang") === "en").as("label"))
      val fit = isotonicCalibration(scored)
        .select(col("score_ppm"), col("cal_ppm"))
      reliabilityCard(
        scored.join(broadcast(fit), Seq("score_ppm"))
          .select(col("cal_ppm").as("score_ppm"), col("label")))
        .orderBy(col("bin"))
    },
    Some("""WITH sc AS (SELECT
          (LEAST(1000000, 5 * ((1000000 * CAST(len(list_filter(
              string_split(text, ' '),
              x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT))
            // CAST(len(string_split(text, ' ')) AS BIGINT))) // 20000)
            * 20000 AS score_ppm,
          lang = 'en' AS label
        FROM documents),
      h AS (SELECT score_ppm AS s, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM sc GROUP BY 1),
      o AS (SELECT s, n, p, ROW_NUMBER() OVER (ORDER BY s) AS i FROM h),
      pre AS (SELECT i, s, n, p,
          SUM(n) OVER (ORDER BY i) AS cn, SUM(p) OVER (ORDER BY i) AS cp
        FROM o),
      w AS (SELECT a.i AS j, b.i AS k,
          b.cp - a.cp + a.p AS wp, b.cn - a.cn + a.n AS wn
        FROM pre a JOIN pre b ON a.i <= b.i),
      inner_min AS (SELECT t.i, w.j, w.wp, w.wn,
          ROW_NUMBER() OVER (PARTITION BY t.i, w.j
            ORDER BY CAST(w.wp AS DOUBLE) / w.wn ASC, w.wn, w.wp) AS rn
        FROM o t JOIN w ON w.j <= t.i AND w.k >= t.i),
      mn AS (SELECT i, j, wp, wn FROM inner_min WHERE rn = 1),
      outer_max AS (SELECT i, wp, wn,
          ROW_NUMBER() OVER (PARTITION BY i
            ORDER BY CAST(wp AS DOUBLE) / wn DESC, wn, wp) AS rn
        FROM mn),
      fit AS (SELECT o.s, CAST((1000000 * om.wp) // om.wn AS BIGINT)
            AS cal_ppm
        FROM o JOIN (SELECT i, wp, wn FROM outer_max WHERE rn = 1) om
          USING (i)),
      recal AS (SELECT fit.cal_ppm AS score_ppm, sc.label
        FROM sc JOIN fit ON fit.s = sc.score_ppm),
      b AS (SELECT LEAST(score_ppm // 100000, 9) AS bin, COUNT(*) AS n,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos,
          CAST(SUM(score_ppm) AS BIGINT) AS s
        FROM recal GROUP BY 1),
      g AS (SELECT bin, n, n_pos, s // n AS conf_ppm,
          (1000000 * n_pos) // n AS acc_ppm
        FROM b)
      SELECT bin, n, n_pos, conf_ppm, acc_ppm,
        ABS(acc_ppm - conf_ppm) AS gap_ppm,
        CAST((SUM(n * ABS(acc_ppm - conf_ppm)) OVER ())
          // (SUM(n) OVER ()) AS BIGINT) AS ece_ppm
      FROM g ORDER BY bin"""))

  val queries: Seq[GQuery] =
    Seq(q51, q52, q53, q56, q57, q60, q61, q63, q64, q64b, q65, q66, q67,
      q71, q100, q112, q116, q117, q119, q123, q124, q127, q130, q131,
      q133, q135, q141, q142, q143, q150, q151, q152, q154, q155, q160,
      q161, q163, q173, q177, q178, q189, q191, q213, q255, q259, q261,
      q262, q290, q295, q306, q316, q328, q329, q334, q335, q336, q337)
}
