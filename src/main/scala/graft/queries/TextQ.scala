package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** LLM-data-pipeline text operators (SURVEY §2C): exact + fuzzy dedup
  * (content hash, MinHash-LSH, SimHash, n-gram Jaccard), language ID,
  * quality scoring, token counting, and winnowing fingerprints — all over
  * the `documents` table.
  *
  * Everything is expression-based (codegen'd, no UDFs) and shuffle-lean:
  * dedup keys (hash / band key / simhash) are group-by columns, so at
  * 100 TB each operator is one hash-partitioned aggregation rather than a
  * pairwise scan; only LSH-bucketed candidates are ever joined pairwise.
  *
  * Hashes are md5 hex strings so the DuckDB oracle can reproduce them
  * byte-for-byte (both engines emit lowercase hex).
  */
object TextQ {

  /** `width`-token shingle array over a pre-materialized `toks` column
    * (space-joined, the same layout as the DuckDB `ts[i] || ' ' || ...`
    * chain). The token array MUST be a column (not `split(text)`
    * inlined): expressions inside the transform lambda re-evaluate per
    * element, which would make shingling O(tokens²) in string work per
    * document. */
  private def shingleExprN(width: Int): String = {
    val parts = (1 to width).map(k => s"element_at(toks, i + $k)").mkString(", ")
    s"transform(sequence(0, size(toks) - $width), i -> concat_ws(' ', $parts))"
  }

  /** The MinHash/Jaccard 3-token shingles. */
  private val shinglesExpr = shingleExprN(3)

  /** DuckDB twin of [[shinglesExpr]]: doc_id, sh rows. */
  private val shinglesSql =
    """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ts
                     FROM documents WHERE len(string_split(text, ' ')) >= 3),
       shingles AS (SELECT doc_id, source,
                      ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh, i
                    FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i))"""

  /** Exact dedup: canonical-row selection by content hash (sha256). Each
    * doc keeps only if it is the min doc_id of its hash group. */
  private val q25 = GQuery(
    "q25_dedup_exact",
    (s, dir) => {
      val w = Window.partitionBy(sha2(col("text"), 256))
      t(s, dir, "documents")
        .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
        .select(col("doc_id"), col("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keep
    FROM documents
    ORDER BY doc_id"""))

  private def minhashLane(i: Int, h1: String, h2: String): String =
    if (i < 4) s"substr($h1, ${i * 8 + 1}, 8)" else s"substr($h2, ${(i - 4) * 8 + 1}, 8)"

  /** MinHash signature + LSH band rows for a documents-shaped DF
    * (doc_id, text): 8 signature lanes (min-over-hash, slicing two md5
    * digests — 4x less hashing than 8 salted md5 calls, same
    * independence-in-practice) → 4 bands × 2 rows. The full signature is
    * carried on every band row so the candidate self-join yields
    * est_jaccard directly — the expensive shingle→signature subtree is
    * built once per join side (identical sides → exchange reuse) instead
    * of being recomputed by two extra signature joins afterwards. */
  def minhashBands(docs: DataFrame): DataFrame =
    minhashBandsFrom(shingleHashes3(docs))

  /** Shared 3-token shingle table (doc_id, pos, sh, h1 = md5(sh)) — the
    * common prefix of [[minhashBands]] (which adds the second salted
    * digest) and [[winnowFingerprints]] (whose fingerprint hash IS h1):
    * round-15 seam so composite cards ([[contaminationReport]]) can
    * tokenize + first-digest each side ONCE for both modalities. */
  private[queries] def shingleHashes3(docs: DataFrame): DataFrame = docs
    .withColumn("toks", split(col("text"), " "))
    .filter(size(col("toks")) >= 3)
    .select(col("doc_id"), posexplode(expr(shinglesExpr)).as(Seq("p0", "sh")))
    .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("pos"),
      col("sh"), md5(col("sh")).as("h1"))

  /** [[minhashBands]] over a PRE-BUILT [[shingleHashes3]] table. */
  private[queries] def minhashBandsFrom(sh3: DataFrame): DataFrame = {
    val sh = sh3.withColumn("h2", md5(concat(lit("x:"), col("sh"))))
    val laneAggs = (0 until 8).map(i => min(expr(minhashLane(i, "h1", "h2"))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(laneAggs.head, laneAggs.tail: _*)
      .selectExpr(
        "doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7",
        "stack(4, 0, concat(h0, h1), 1, concat(h2, h3), 2, concat(h4, h5), 3, concat(h6, h7)) AS (band, bkey)")
  }

  /** Degenerate band keys: (band, bkey) shared by more than `maxBandSize`
    * docs — the skew metric surfaced alongside [[lshCandidates]]. A
    * boilerplate phrase every doc shares can collapse signatures into one
    * band key; its reducer then does O(size²) pairwise work. */
  def bandSkew(bands: DataFrame, maxBandSize: Int): DataFrame =
    bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBandSize)

  /** Estimated Jaccard between two band-row sides aliased `x`/`y`: the
    * fraction of agreeing signature lanes. Shared by the [[lshCandidates]]
    * self-join and the incremental store cross-join
    * ([[graft.etl.IncrementalDedup]]) so the lane scheme has one home. */
  private[graft] def laneAgreement: org.apache.spark.sql.Column =
    (0 until 8)
      .map(i => (col(s"x.h$i") === col(s"y.h$i")).cast(IntegerType))
      .reduce(_ + _) / lit(8.0)

  /** Exclude band keys shared by more than `maxBandSize` rows via a
    * window count — right when the bands feed a shuffle join on
    * (band, bkey), where the window rides the join's own exchange. For a
    * big relation that would otherwise NOT shuffle (the incremental
    * store side), use an aggregate+anti-join instead (see
    * `IncrementalDedup.dedupDelta`). */
  private[graft] def bandSizeGuard(bands: DataFrame, maxBandSize: Int): DataFrame = {
    val wb = Window.partitionBy(col("band"), col("bkey"))
    bands.withColumn("_bn", count(lit(1)).over(wb))
      .filter(col("_bn") <= maxBandSize).drop("_bn")
  }

  /** LSH candidate pairs with estimated Jaccard, guarded against band
    * skew: band keys shared by more than `maxBandSize` docs are excluded
    * from pairing (report them via [[bandSkew]] and handle those docs with
    * exact dedup or a tighter band scheme). The guard is a window count on
    * the join key's own partitioning, so it adds no extra shuffle. */
  def lshCandidates(bands: DataFrame, maxBandSize: Int = 1000): DataFrame = {
    // hint("merge"): the two join sides are the same subtree; a sort-merge
    // join lets the shuffle exchange be computed once and REUSED (one pass
    // over the expensive shingle→signature pipeline), where the size
    // estimate after the guard filter would otherwise pick a broadcast
    // join that recomputes the subtree for the broadcast side. SMJ is also
    // what AQE picks at real corpus sizes.
    val guarded = bandSizeGuard(bands, maxBandSize).hint("merge")
    val est = laneAgreement
    guarded.as("x")
      .join(guarded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        est.as("est_jaccard"))
      .distinct()
  }

  /** DuckDB CTE chain ending in `cand(doc_a, doc_b, est_jaccard)` — the
    * shared oracle prefix for q26/q26b and GraphQ's q139. */
  private[queries] lazy val minhashCandSql = {
    val sigCols = (0 until 8).map(i => s"MIN(${minhashLane(i, "h1", "h2")}) AS h$i").mkString(", ")
    val bandSql = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, h${2 * b} || h${2 * b + 1} AS bkey FROM sig")
      .mkString(" UNION ALL ")
    val estSql = (0 until 8).map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END")
      .mkString("(", " + ", ") / 8.0")
    s"""$shinglesSql,
        sig AS (SELECT doc_id, $sigCols
                FROM (SELECT doc_id, md5(sh) AS h1, md5('x:' || sh) AS h2
                      FROM shingles)
                GROUP BY doc_id),
        bands AS ($bandSql),
        pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        cand AS (SELECT * FROM (
            SELECT doc_a, doc_b, $estSql AS est_jaccard
            FROM pairs
            JOIN sig a ON doc_a = a.doc_id
            JOIN sig b ON doc_b = b.doc_id)
          WHERE est_jaccard >= 0.25)"""
  }

  /** MinHash-LSH near-dup candidates (oracle fixture: threshold 0.25; the
    * 1000-doc band cap never triggers at fixture scale, so results match
    * the unguarded oracle SQL byte-for-byte). */
  private val q26 = GQuery(
    "q26_minhash_lsh",
    (s, dir) => lshCandidates(minhashBands(t(s, dir, "documents")))
      .filter(col("est_jaccard") >= 0.25)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""$minhashCandSql
      SELECT doc_a, doc_b, est_jaccard FROM cand
      ORDER BY doc_a, doc_b"""))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS local fingerprinting algorithm): slide a `window`-wide
    * frame over each document's shingle-hash sequence and keep the
    * RIGHTMOST MINIMUM hash of every frame. The guarantee that makes
    * this the right span-dedup accelerator at 100 TB: any shared
    * substring of at least `window + shingle − 1` tokens is caught by a
    * shared fingerprint (no gaps, unlike sampling), while expected
    * density is only 2/(window+1) of the shingles — the corpus-wide
    * match join runs on ~¼ of the span rows [[spanDuplication]] keys.
    *
    * Exactness: hashes are md5 hex STRINGS (lexicographic min —
    * engine-portable, the [[minhashBands]] discipline); the
    * rightmost-min tie rule is `min(struct(h, −pos))`, which the oracle
    * replays as `ROW_NUMBER() OVER (… ORDER BY h, pos DESC) = 1`. Docs
    * with fewer shingles than `window` yield one truncated frame.
    *
    * Scale shape: shingle explode is map-side; both windows (the doc
    * count and the sliding min) share ONE hash exchange on doc_id, and
    * the frame min is O(window) state per row — no self-join, nothing
    * corpus-pairwise. Returns (doc_id, pos, h, n_sh). */
  def winnowFingerprints(docs: DataFrame, window: Int = 8): DataFrame =
    winnowFingerprintsFrom(shingleHashes3(docs), window)

  /** [[winnowFingerprints]] over a PRE-BUILT [[shingleHashes3]] table —
    * its fingerprint hash is exactly the shared h1 = md5(shingle). */
  private[queries] def winnowFingerprintsFrom(sh3: DataFrame,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val sh = sh3.select(col("doc_id"), col("pos"), col("h1").as("h"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val wFrame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    sh.withColumn("n_sh", count(lit(1)).over(wDoc))
      .withColumn("pick",
        min(struct(col("h"), (-col("pos")).as("np"))).over(wFrame))
      .filter(col("pos") <= greatest(col("n_sh") - (window - 1), lit(1L)))
      .select(col("doc_id"), (-col("pick.np")).as("pos"),
        col("pick.h").as("h"), col("n_sh"))
      .distinct()
  }

  /** Winnowing candidate pairs — fingerprints joined across documents:
    * two docs sharing at least `minShared` fingerprints are a near-dup/
    * shared-passage candidate (the MOSS report join). Fingerprint
    * values shared by more than `maxFpDocs` docs are excluded first —
    * the boilerplate guard, same shape as [[lshCandidates]]'
    * band cap (aggregate + broadcast anti-join, so the fingerprint
    * table never shuffles for the guard). Join work is fingerprint-
    * collision-sized, never corpus-pairwise. */
  def winnowCandidates(docs: DataFrame, window: Int = 8,
      minShared: Long = 2L, maxFpDocs: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxFpDocs >= 1, s"maxFpDocs must be >= 1, got $maxFpDocs")
    val fp = winnowFingerprints(docs, window)
      .select(col("doc_id"), col("h")).distinct()
    val hot = fp.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxFpDocs).select(col("h"))
    val safe = fp.join(broadcast(hot), Seq("h"), "left_anti")
    safe.as("x").join(safe.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Shared oracle CTE: winnowing fingerprints `fp(doc_id, p, h, n_sh)`
    * at window `w` — the q157/q158 prefix. */
  private def winnowSql(w: Int): String =
    s"""$shinglesSql,
      sh AS (SELECT doc_id, i AS pos, md5(sh) AS h FROM shingles),
      n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      starts AS (SELECT doc_id, n_sh, s
        FROM n, UNNEST(generate_series(1, GREATEST(n_sh - ${w - 1}, 1))) AS u(s)),
      fp AS (SELECT DISTINCT doc_id, p, h, n_sh FROM (
          SELECT st.doc_id, sh.pos AS p, sh.h, st.n_sh,
            ROW_NUMBER() OVER (PARTITION BY st.doc_id, st.s
              ORDER BY sh.h, sh.pos DESC) AS rn
          FROM starts st JOIN sh ON sh.doc_id = st.doc_id
            AND sh.pos BETWEEN st.s AND st.s + ${w - 1})
        WHERE rn = 1)"""

  /** Oracle fixture of [[winnowFingerprints]] (window 8): the per-doc
    * fingerprint card — count and density vs the 2/(w+1) theoretical. */
  private val q157 = GQuery(
    "q157_winnow_fingerprints",
    (s, dir) => winnowFingerprints(t(s, dir, "documents"), window = 8)
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_fp"))
      .select(col("doc_id"), col("n_sh"), col("n_fp"),
        expr("(1000000 * n_fp) DIV n_sh").as("density_ppm"))
      .orderBy(col("doc_id")),
    Some(s"""${winnowSql(8)}
      SELECT doc_id, n_sh, COUNT(*) AS n_fp,
        CAST((1000000 * COUNT(*)) // n_sh AS BIGINT) AS density_ppm
      FROM fp
      GROUP BY doc_id, n_sh
      ORDER BY doc_id"""))

  /** Oracle fixture of [[winnowCandidates]] (window 8, ≥2 shared): the
    * fixture's fingerprint-doc cap never triggers, so the oracle omits
    * the guard (the q26 convention). */
  private val q158 = GQuery(
    "q158_winnow_candidates",
    (s, dir) => winnowCandidates(t(s, dir, "documents"), window = 8)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""${winnowSql(8)},
      f AS (SELECT DISTINCT doc_id, h FROM fp)
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM f x JOIN f y ON x.h = y.h AND x.doc_id < y.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
      ORDER BY doc_a, doc_b"""))

  /** Exact shingle-set containment on the LSH candidate pairs — the
    * "which side is the SUPERSET" signal a dedup keep-policy needs:
    * symmetric Jaccard calls a quote-plus-commentary page and the page
    * it quotes equally similar, but containment is asymmetric —
    * `cont_a_ppm ≈ 10⁶` with low `cont_b_ppm` means A is (nearly)
    * wholly inside B, so the policy keeps B (the superset) rather than
    * the longer/lower-id side. Confirm work is candidates-only (the
    * q77 edit-distance pattern): each pair intersects DISTINCT shingle
    * sets via two pair-sized joins, exact BIGINT ppm both directions.
    */
  def containmentConfirm(docs: DataFrame, minJaccard: Double = 0.25): DataFrame = {
    val cand = lshCandidates(minhashBands(docs))
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
    val sh = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("sh"))
      .distinct()
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    cand
      .join(common, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_common"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("n_common"),
        expr("(1000000 * n_common) DIV n_a").as("cont_a_ppm"),
        expr("(1000000 * n_common) DIV n_b").as("cont_b_ppm"))
  }

  /** Oracle fixture of [[containmentConfirm]] (threshold 0.25). */
  private val q159 = GQuery(
    "q159_containment",
    (s, dir) => containmentConfirm(t(s, dir, "documents"))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""$minhashCandSql,
      dsh AS (SELECT DISTINCT doc_id, sh FROM shingles),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id),
      com AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN dsh a ON a.doc_id = c.doc_a
        JOIN dsh b ON b.doc_id = c.doc_b AND b.sh = a.sh
        GROUP BY 1, 2)
      SELECT c.doc_a, c.doc_b, ca.n AS n_a, cb.n AS n_b,
        COALESCE(n_common, 0) AS n_common,
        CAST((1000000 * COALESCE(n_common, 0)) // ca.n AS BIGINT) AS cont_a_ppm,
        CAST((1000000 * COALESCE(n_common, 0)) // cb.n AS BIGINT) AS cont_b_ppm
      FROM cand c
      LEFT JOIN com USING (doc_a, doc_b)
      JOIN cnt ca ON ca.doc_id = c.doc_a
      JOIN cnt cb ON cb.doc_id = c.doc_b
      ORDER BY doc_a, doc_b"""))

  /** Source×source near-duplicate matrix — WHERE the duplication lives:
    * each LSH candidate pair (est Jaccard ≥ `minJaccard`) is charged to
    * its unordered (source, source) cell, so a crawl that mirrors
    * another crawl, or a source that mostly duplicates ITSELF, is one
    * `ORDER BY n_pairs DESC` away. This is the data-card diagnostic
    * that directs dedup effort (drop a mirror wholesale vs dedup within
    * a source) before any per-doc work runs; the diagonal cells are
    * intra-source duplication, off-diagonal are cross-source mirrors.
    *
    * Scale shape: everything downstream of [[lshCandidates]] is
    * candidate-pair-sized — two (doc_id → source) lookup joins and one
    * |sources|²-bounded aggregation. The lookup table is two columns of
    * the corpus; the join is a plain equi-join AQE sizes (no hint). */
  def crossSourceDupMatrix(docs: DataFrame, minJaccard: Double = 0.25): DataFrame = {
    val cand = lshCandidates(minhashBands(docs))
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
    val src = docs.select(col("doc_id"), col("source"))
    cand
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")),
        Seq("doc_b"))
      .select(least(col("src_a"), col("src_b")).as("src_x"),
        greatest(col("src_a"), col("src_b")).as("src_y"))
      .groupBy(col("src_x"), col("src_y"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Oracle fixture of [[crossSourceDupMatrix]] (threshold 0.25). */
  private val q156 = GQuery(
    "q156_cross_source_dup",
    (s, dir) => crossSourceDupMatrix(t(s, dir, "documents"))
      .orderBy(col("src_x"), col("src_y")),
    Some(s"""$minhashCandSql,
      s AS (SELECT doc_id, source FROM documents)
      SELECT LEAST(a.source, b.source) AS src_x,
        GREATEST(a.source, b.source) AS src_y,
        COUNT(*) AS n_pairs
      FROM cand
      JOIN s a ON doc_a = a.doc_id
      JOIN s b ON doc_b = b.doc_id
      GROUP BY 1, 2
      ORDER BY src_x, src_y"""))

  /** Near-dup CLUSTERS: connected components over q26's candidate pairs
    * (component id = min doc_id in the component — the survivor a dedup
    * pass would keep). The DuckDB twin computes the same components with
    * a recursive transitive-closure CTE. */
  private val q26b = GQuery(
    "q26b_neardup_components",
    (s, dir) => connectedComponents(
        lshCandidates(minhashBands(t(s, dir, "documents")))
          .filter(col("est_jaccard") >= 0.25))
      .orderBy(col("doc_id")),
    Some(s"""${minhashCandSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
      reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
    SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
    FROM reach
    GROUP BY u
    ORDER BY doc_id"""))

  /** The star-rewrite components over the SAME q26 candidate graph and
    * the SAME transitive-closure oracle as [[q26b]]: the hash-match is a
    * cross-engine proof that [[connectedComponentsStar]] lands exactly
    * min-label components — the O(log d) path to the identical answer. */
  private val q242 = GQuery(
    "q242_components_star",
    (s, dir) => connectedComponentsStar(
        lshCandidates(minhashBands(t(s, dir, "documents")))
          .filter(col("est_jaccard") >= 0.25))
      .orderBy(col("doc_id")),
    Some(s"""${minhashCandSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
      reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
    SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
    FROM reach
    GROUP BY u
    ORDER BY doc_id"""))

  // One term per SimHash bit, parametrized by engine syntax (instr vs
  // strpos, `div` vs `//`) so both engines evaluate the identical formula.
  // Bit j comes from hex char j/4 of the token's md5; the `1L << j` weight
  // lives in a signed 64-bit long, so bits is capped at 62 (j = 63 goes
  // negative and j >= 64 wraps — Scala shifts are mod 64).
  private def simhashTerms(strpos: String, idiv: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      val k = j / 4 + 1
      val d = 1 << (3 - (j % 4))
      val bit = s"((($strpos('0123456789abcdef', substr(md5(tok), $k, 1)) - 1) $idiv $d) % 2)"
      s"(CASE WHEN SUM(2 * $bit - 1) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** SimHash per doc from the leading hex chars of each token's md5; the
    * per-bit majority vote is a single grouped aggregation. 16 bits for
    * the compact fingerprint (q27's oracle shape); 32 for near-dup
    * pairing, where 16 bits saturates with collisions on a homogeneous
    * corpus. */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 62,
      s"simhash bits must be in [1, 62] (long-backed fingerprint), got $bits")
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(expr(s"CAST(${simhashTerms("instr", "div", bits)} AS BIGINT)").as("simhash"))
  }

  // Weighted simhash bit terms: same md5 bit extraction as
  // [[simhashTerms]], but each occurrence votes with weight `w` instead
  // of 1 — SUM(w·(2·bit−1)) > 0.
  private def simhashIdfTerms(strpos: String, idiv: String, bits: Int): String =
    (0 until bits).map { j =>
      val k = j / 4 + 1
      val d = 1 << (3 - (j % 4))
      val bit = s"((($strpos('0123456789abcdef', substr(md5(tok), $k, 1)) - 1) $idiv $d) % 2)"
      s"(CASE WHEN SUM(w * (2 * $bit - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** IDF-weighted SimHash — the anti-boilerplate fingerprint: each token
    * occurrence votes with weight `floor(log₂(n_docs / df)) + 1` (the
    * bit length of `n_docs DIV df` — exact-integer log-idf, computable
    * identically in both engines as `length(bin(x))`), so a token every
    * document carries votes with weight 1 while a rare discriminative
    * token votes with ~log₂ N. Two docs sharing only boilerplate stop
    * colliding; two docs sharing their RARE content hash together even
    * when the boilerplate differs — the failure mode of the unweighted
    * majority vote ([[simhash]]) on template-heavy crawls.
    *
    * Scale shape: the (doc, tok) explode immediately aggregates to a
    * per-(doc, tok) tf table (the q53 TF-IDF shape), each token's vote
    * carries weight `tf · idf` — occurrence-exact, but the md5-heavy
    * 16-term vote aggregation runs over the tf table, NOT per
    * occurrence (the per-occurrence formulation measured 4.3× at the
    * 10× probe purely from re-hashing every repeated token); df is a
    * vocabulary-sized re-aggregation joined back hint-free on the token
    * key. Weights ≤ 64·tf, so sums can't overflow. */
  def simhashIdf(docs: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 62,
      s"simhash bits must be in [1, 62] (long-backed fingerprint), got $bits")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfTab, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("w",
        expr("CAST(length(bin(n_docs DIV df)) AS BIGINT) * tf"))
      .groupBy(col("doc_id"))
      .agg(expr(s"CAST(${simhashIdfTerms("instr", "div", bits)} AS BIGINT)")
        .as("simhash"))
  }

  /** Oracle fixture of [[simhashIdf]] (16 bits). */
  private val q162 = GQuery(
    "q162_simhash_idf",
    (s, dir) => simhashIdf(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some(s"""WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
      e2 AS (SELECT doc_id, tok FROM e WHERE len(tok) > 0),
      dft AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM e2 GROUP BY tok),
      nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      w AS (SELECT doc_id, tok,
          CAST(len(bin(n_docs // df)) AS BIGINT) AS w
        FROM e2 JOIN dft USING (tok), nd)
      SELECT doc_id,
        CAST(${simhashIdfTerms("strpos", "//", 16)} AS BIGINT) AS simhash
      FROM w
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** SimHash near-duplicate pairs (hamming distance ≤ `maxHamming`) via
    * multi-index blocking: the 32-bit hash splits into 4 chunks of 8
    * bits; by pigeonhole, any pair within hamming ≤ 3 agrees on at least
    * one chunk, so candidates are an equi-join on (chunk index, chunk
    * value) — hash-partitioned, never all-pairs — and only candidates pay
    * the exact bit_count(xor) check. The simhash rides on every chunk row
    * so no re-join against the signature table is needed (same trick as
    * the MinHash band rows). */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 1): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-chunk blocking only covers hamming <= 3, got $maxHamming")
    val chunks = simhash(docs, bits = 32)
      .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 3)")).as("ci"))
      .withColumn("cv", expr("shiftright(simhash, ci * 8) & 255"))
      .hint("merge") // identical join sides: SMJ reuses the md5-heavy
                     // simhash exchange instead of recomputing it for a
                     // broadcast side (see lshCandidates)
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Connected components over an undirected pair graph (doc_a, doc_b) —
    * the step that turns pairwise near-dup candidates into duplicate
    * CLUSTERS (one representative survives per component).
    *
    * Min-label propagation: every member starts labeled with its own id;
    * each round a member takes the min label among itself and its
    * neighbors; converges in O(component diameter) rounds. Near-dup
    * components are shallow (dozens of docs), so a handful of rounds
    * suffices; each round is one shuffle on doc_id. For graphs with huge
    * diameters the large-star/small-star variant halves rounds, but the
    * data layout here is the same. The loop materializes a driver-side
    * scalar per round (the change count) — a deliberate convergence
    * check, not a data path.
    *
    * Non-convergence within `maxIter` THROWS rather than silently
    * returning split clusters (a dedup pass would keep several
    * "survivors" of one real cluster). `reliable = true` uses
    * fault-tolerant checkpoints (requires `sparkContext.setCheckpointDir`)
    * so a lost executor mid-loop recovers instead of aborting —
    * localCheckpoint blocks are executor-local, fine on local[n], not on
    * a long-running cluster job.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      reliable: Boolean = false): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // materialize the INPUT once — `pairs` is typically the whole LSH
    // candidate pipeline and both union legs below reference it; snapping
    // the pairs (not the doubled edge list) runs that pipeline exactly
    // once and halves the materialized footprint (the pagerankPpm
    // pattern). The symmetric view is a map over the snapshot — free to
    // rebuild per round.
    val p = snap(pairs.select(col("doc_a"), col("doc_b")))
    val edges = p.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(p.select(col("doc_b").as("u"), col("doc_a").as("v")))
    // Round shape (optimization guide §2.3/§2.4 — aggregate instead of
    // join-back): the neighbor contributions (label of v charged to u)
    // UNION the self rows (label of u charged to u) fold through ONE
    // aggregation — min(component) is the new label and the self row's
    // label rides along as `prev` for the convergence scan. This replaces
    // the old join → groupBy → join-back-to-labels round (3-4 exchanges)
    // with join → union → groupBy (2-3), and round 1 skips the join
    // entirely: under identity labels the neighbor contribution of edge
    // (u, v) IS v, so the first round is one aggregation over the edge
    // set and the old standalone `distinct()` node-list pass disappears.
    var labels: DataFrame = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val contrib =
        if (labels == null)
          edges.select(col("u"), col("v").as("component"),
              lit(false).as("self"))
            .union(edges.select(col("u"), col("u").as("component"),
              lit(true).as("self")))
        else
          edges
            .join(labels.select(col("doc_id").as("v"), col("component")),
              Seq("v"))
            .select(col("u"), col("component"), lit(false).as("self"))
            .union(labels.select(col("doc_id").as("u"), col("component"),
              lit(true).as("self")))
      val next = snap( // cut the lineage so plans don't grow per round
        contrib.groupBy(col("u"))
          .agg(min(col("component")).as("component"),
            min(when(col("self"), col("component"))).as("prev"))
          .select(col("u").as("doc_id"), col("component"), col("prev")))
      converged = next.filter(col("component") =!= col("prev")).isEmpty
      labels = next.select(col("doc_id"), col("component"))
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — a component's " +
        "diameter exceeds the budget; raise maxIter (rounds needed ≈ diameter)")
    labels
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR edge
    * rewrites (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the opt-in alternative to [[connectedComponents]] for
    * graphs with LONG CHAINS: min-label propagation needs O(diameter)
    * rounds (a 1000-link chain needs 1000 shuffles), this converges in
    * O(log d) star rounds to the same per-component min label
    * (StarComponentsSpec pins equality property-style; the planted-chain
    * probe measures the round gap). Near-dup mirror families are
    * shallow, so propagation stays the default; entity graphs, citation
    * chains, or any transitively-linked record graph want this one.
    *
    *  - large-star(u): every neighbor LARGER than u links to
    *    min(N(u) ∪ {u}) — long tails collapse toward minima in parallel;
    *  - small-star(u): u and its smaller parents all link to their
    *    min — stars flatten so the next large-star sees depth ≤ 2.
    *
    * Edges stay canonically (larger, smaller) and dedup each round, so a
    * round is two groupBy-join passes over the CURRENT edge set (which
    * only shrinks toward the star forest), never node-times-degree
    * blowup. At the fixed point every non-min node points at its
    * component min directly; isolated endpoints label themselves. Same
    * output contract as [[connectedComponents]]: (doc_id, component =
    * min doc_id of the component), same loud non-convergence throw,
    * same lineage cut per round, same `reliable` knob. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 30,
      reliable: Boolean = false): DataFrame =
    starComponentsWithRounds(pairs, maxIter, reliable)._1

  /** Test/probe seam: labels plus the star rounds actually used. */
  private[graft] def starComponentsWithRounds(pairs: DataFrame,
      maxIter: Int, reliable: Boolean = false): (DataFrame, Int) = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // materialize the INPUT once (guide §2.4 / the pagerankPpm pattern):
    // `pairs` is typically the whole LSH candidate pipeline and is
    // referenced by BOTH the node list and the edge set — snapping it
    // first runs that pipeline exactly once instead of once per derived
    // structure. The node list is consumed exactly once (the final
    // labels join), so it stays lazy over the snapshot.
    val p = snap(pairs.select(col("doc_a"), col("doc_b")))
    val nodes = p.select(col("doc_a").as("doc_id"))
      .union(p.select(col("doc_b"))).distinct()
    // canonical (larger, smaller) edge set, self-loops out
    var edges = snap(p
      .select(greatest(col("doc_a"), col("doc_b")).as("a"),
        least(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    // round-15: each round's edge count is remembered so the NEXT
    // round's fixed-point check costs one count job, not two (the old
    // `edges.count()` re-counted the already-materialized previous set)
    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR over the symmetric view: for each u, every larger
      // neighbor v links to m = min(N(u) ∪ {u})
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // no per-step dedup here: duplicate (a, b) rows cannot change the
      // small-star mins below and the round's closing distinct collapses
      // them — dropping the old `.distinct()` removes one exchange per
      // round (guide §2.4: a distinct on data whose duplicates are
      // harmless is an accidental shuffle)
      val ls = sym.join(mins, Seq("u")).filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
      // SMALL-STAR over the (larger → smaller) edges: u and all its
      // parents link to min(P(u) ∪ {u})
      val minPar = ls.groupBy(col("a")).agg(min(col("b")).as("m"))
      val ss = snap(ls.join(minPar, Seq("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(minPar.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct())
      // fixed point: the edge SET is unchanged — counts, then a leftanti
      // probe only when the counts agree (both sides are distinct
      // canonical pairs, so leftanti-empty ⟺ the old `except`-empty,
      // without except's extra aggregate)
      val ssCount = ss.count()
      converged = ssCount == edgeCount &&
        ss.join(edges, Seq("a", "b"), "leftanti").isEmpty
      edges = ss
      edgeCount = ssCount
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter star rounds " +
        "— pathological for O(log d) convergence; raise maxIter and report")
    // star forest: every child points at its component min; roots and
    // isolated endpoints label themselves
    val labels = nodes
      .join(edges.select(col("a").as("doc_id"), col("b").as("c")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("c"), col("doc_id")).as("component"))
    (labels, iter)
  }

  /** Canonical selection per duplicate cluster — the merge POLICY of a
    * dedup pass. q25/q26b keep the min doc_id; real pipelines keep the
    * BEST replica (near-dups differ: one is truncated, one is clean).
    * `quality` is (doc_id, any integer quality column named by
    * `qualityCol`) — integer so ranking has no float ties; doc_id breaks
    * exact ties deterministically. One join (cluster membership is tiny
    * relative to the corpus — AQE broadcasts it) and one window over
    * components (shallow partitions). Returns (doc_id, component, keep).
    */
  def keepBestPerCluster(components: DataFrame, quality: DataFrame,
      qualityCol: String): DataFrame = {
    val w = Window.partitionBy(col("component"))
      .orderBy(col(qualityCol).desc, col("doc_id"))
    components.join(quality, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("component"), col("keep"))
  }

  /** Oracle fixture of [[keepBestPerCluster]] over the q26b clusters with
    * n_chars as the quality signal: per near-dup cluster, the longest
    * member survives. */
  private val q69 = GQuery(
    "q69_dedup_best",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      keepBestPerCluster(
        connectedComponents(
          lshCandidates(minhashBands(docs)).filter(col("est_jaccard") >= 0.25)),
        docs.select(col("doc_id"), col("n_chars")), "n_chars")
        .orderBy(col("doc_id"))
    },
    Some(s"""${minhashCandSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
      reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
               FROM reach GROUP BY u)
    SELECT doc_id, component, rn = 1 AS keep FROM (
      SELECT c.doc_id, c.component,
        ROW_NUMBER() OVER (PARTITION BY c.component
          ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM comp c JOIN documents d USING (doc_id))
    ORDER BY doc_id"""))

  /** Edit-distance confirmation of LSH candidate pairs — the verify stage
    * of a fuzzy record-linkage / near-dup pipeline: the cheap signature
    * join proposes, bounded Levenshtein disposes. The confirm uses the
    * BANDED distance (`levenshtein(a, b, maxDist)` — O(maxDist·len) and
    * early-exits to -1 over budget, not the O(len²) full DP), so a false
    * candidate costs ~maxDist·len character ops instead of len². Work
    * scales with the CANDIDATE count, never the corpus: text joins back by
    * doc_id (hash-partitioned equi-joins), and only candidate rows ever
    * touch the quadratic-ish string kernel. Returns confirmed pairs with
    * the distance and a length-normalized similarity in exact ppm.
    */
  def editConfirmedPairs(docs: DataFrame, maxDist: Int = 64,
      minEstJaccard: Double = 0.25, maxBandSize: Int = 1000): DataFrame =
    editConfirmedFrom(docs,
      lshCandidates(minhashBands(docs), maxBandSize)
        .filter(col("est_jaccard") >= minEstJaccard), maxDist)

  /** [[editConfirmedPairs]] over a PRE-BUILT candidate pair set — the
    * [[graft.pipelines.DedupGraphPipeline]] entry point, where the LSH
    * candidates are materialized once and feed every gate. */
  def editConfirmedFrom(docs: DataFrame, cand: DataFrame,
      maxDist: Int = 64): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val txt = docs.select(col("doc_id"), col("text"))
    cand
      .join(txt.select(col("doc_id").as("doc_a"), col("text").as("ta")), Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_b"))
      .withColumn("lev", expr(s"levenshtein(ta, tb, $maxDist)").cast(LongType))
      .filter(col("lev") >= 0) // banded kernel reports over-budget as -1
      .withColumn("sim_ppm", expr(
        """CAST((CAST(1000000 AS BIGINT) * (greatest(length(ta), length(tb)) - lev))
           DIV greatest(length(ta), length(tb)) AS BIGINT)"""))
      .select(col("doc_a"), col("doc_b"), col("lev"), col("sim_ppm"))
  }

  /** Oracle fixture of [[editConfirmedPairs]] (maxDist=64): the q26
    * candidates re-checked by true edit distance — the ~0.25-Jaccard
    * false positives the bands propose (distance 139+ at fixture scale)
    * are rejected; real near-dups (distance ≤ 8) survive. */
  private val q77 = GQuery(
    "q77_edit_confirm",
    (s, dir) => editConfirmedPairs(t(s, dir, "documents"))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""$minhashCandSql,
      conf AS (SELECT doc_a, doc_b, levenshtein(a.text, b.text) AS lev,
          greatest(len(a.text), len(b.text)) AS mxlen
        FROM cand
        JOIN documents a ON doc_a = a.doc_id
        JOIN documents b ON doc_b = b.doc_id)
    SELECT doc_a, doc_b, CAST(lev AS BIGINT) AS lev,
      CAST((1000000 * (mxlen - lev)) // mxlen AS BIGINT) AS sim_ppm
    FROM conf
    WHERE lev <= 64
    ORDER BY doc_a, doc_b"""))

  /** Blocked fuzzy entity linkage over a name DICTIONARY — the catalog
    * dedupe a crawl's metadata pass needs ("cold widget" vs "old widget"
    * are one product; Levenshtein over-penalizes the swap family
    * Jaro-Winkler was built for). Architecture is the scalable one:
    * resolve at the distinct-name level first (the dictionary is orders
    * of magnitude smaller than the records — 64 names vs 2,000 rows in
    * the fixture, and the same ratio holds for product/author/domain
    * catalogs at 100 TB), then records inherit their name's verdict by an
    * equi-join. Pairing is blocked on the name's last token (the head
    * noun), a hash-partitioned self-equi-join — work is Σ|block|² over
    * the dictionary, never dictionary², and a `maxBlockSize` cap bounds a
    * degenerate block (every name sharing one noun) exactly like q158's
    * hot-fingerprint cap. The [[graft.functions.JaroWinkler]] kernel is a
    * codegen'd Catalyst expression locked bitwise against DuckDB's
    * `jaro_winkler_similarity`, so the threshold filter and the 6dp
    * output agree exactly with the oracle.
    */
  def fuzzyNameLinkage(records: DataFrame, nameCol: String, keyCol: String,
      minJw: Double = 0.9, maxBlockSize: Int = 10000): DataFrame = {
    require(minJw > 0 && minJw <= 1, s"minJw must be in (0,1], got $minJw")
    val names = records
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"), min(col(keyCol)).as("canon_key"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
      .withColumn("block_n",
        count(lit(1)).over(Window.partitionBy(col("block"))))
      .filter(col("block_n") <= maxBlockSize)
      .select(col("name"), col("n_rows"), col("canon_key"), col("block"))
    val a = names.select(col("name").as("name_a"), col("n_rows").as("rows_a"),
      col("canon_key").as("key_a"), col("block"))
    val b = names.select(col("name").as("name_b"), col("n_rows").as("rows_b"),
      col("canon_key").as("key_b"), col("block"))
    val jw = graft.functions.StringFunctions
      .jaro_winkler(col("name_a"), col("name_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw_raw", jw)
      .filter(col("jw_raw") >= minJw)
      .select(col("name_a"), col("name_b"), round(col("jw_raw"), 6).as("jw"),
        col("rows_a"), col("rows_b"),
        least(col("key_a"), col("key_b")).as("canon_key"))
  }

  /** Oracle fixture of [[fuzzyNameLinkage]] on the part catalog: the
    * cold/old adjective family links at ≥ 0.95, cross-adjective pairs
    * stay below the 0.9 gate. */
  private val q164 = GQuery(
    "q164_jaro_linkage",
    (s, dir) => fuzzyNameLinkage(t(s, dir, "part"), "p_name", "p_partkey")
      .orderBy(col("name_a"), col("name_b")),
    Some("""WITH names AS (
        SELECT p_name AS name, COUNT(*) AS n_rows,
          MIN(p_partkey) AS canon_key
        FROM part GROUP BY 1),
      blk AS (SELECT *, list_extract(string_split(name, ' '), -1) AS block
        FROM names
        QUALIFY COUNT(*) OVER (PARTITION BY block) <= 10000),
      pairs AS (SELECT a.name AS name_a, b.name AS name_b,
          jaro_winkler_similarity(a.name, b.name) AS jw_raw,
          a.n_rows AS rows_a, b.n_rows AS rows_b,
          least(a.canon_key, b.canon_key) AS canon_key
        FROM blk a JOIN blk b ON a.block = b.block AND a.name < b.name)
    SELECT name_a, name_b, ROUND(jw_raw, 6) AS jw, rows_a, rows_b, canon_key
    FROM pairs WHERE jw_raw >= 0.9
    ORDER BY name_a, name_b"""))

  /** Duplicate-cluster size histogram — the dedup diagnostic read BEFORE
    * choosing a keep policy: (cluster size, number of clusters, docs in
    * them), singletons included as size 1. A long tail of huge clusters
    * means template families (use [[GraphQ.triangleStats]] before
    * trusting closure); mass concentrated at size 2 means true mirrors
    * (min-id keep is fine); the histogram also prices the dedup —
    * Σ (size−1) over clusters = docs a full dedup removes. Cost: the
    * candidate pipeline + component label counts; the histogram rides
    * the (cluster-count)-sized table. */
  def clusterSizeHistogram(docs: DataFrame,
      minEstJaccard: Double = 0.25, maxBandSize: Int = 1000): DataFrame =
    clusterSizeHistogramFrom(docs,
      connectedComponents(
        lshCandidates(minhashBands(docs), maxBandSize)
          .filter(col("est_jaccard") >= minEstJaccard)))

  /** [[clusterSizeHistogram]] over PRE-BUILT near-dup components — the
    * [[graft.pipelines.DedupGraphPipeline]] entry point. */
  def clusterSizeHistogramFrom(docs: DataFrame, comp: DataFrame)
      : DataFrame = {
    val labeled = docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(coalesce(col("component"), col("doc_id")).as("cluster"))
    labeled.groupBy(col("cluster")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"))
  }

  /** Oracle fixture of [[clusterSizeHistogram]]. */
  private val q208 = GQuery(
    "q208_cluster_histogram",
    (s, dir) => clusterSizeHistogram(t(s, dir, "documents"))
      .orderBy(col("size")),
    Some(s"""${minhashCandSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
      reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
               FROM reach GROUP BY u),
      lab AS (SELECT COALESCE(c.component, d.doc_id) AS cluster
              FROM documents d LEFT JOIN comp c USING (doc_id)),
      sizes AS (SELECT cluster, COUNT(*) AS size FROM lab GROUP BY cluster)
      SELECT size, COUNT(*) AS n_clusters,
        CAST(size * COUNT(*) AS BIGINT) AS n_docs
      FROM sizes GROUP BY size
      ORDER BY size"""))

  /** Reciprocal-best-match gate — the HIGH-PRECISION subset of the
    * linkage graph: keep a candidate pair only when each name is the
    * other's single best match (max jw, tiebreak lexicographic). ER
    * systems run transitive closure over reciprocal pairs when
    * over-merging is costlier than under-merging: a hub name that
    * weakly resembles many others keeps at most ONE reciprocal edge, so
    * the chains that turn distinct entities into one mega-cluster never
    * form. Cost on top of [[fuzzyNameLinkage]]: symmetrize the pair
    * table, one per-name argmax window (dictionary-pair-sized), one
    * self-join of the two best-match tables. */
  def reciprocalBestMatches(records: DataFrame, nameCol: String,
      keyCol: String, minJw: Double = 0.9,
      maxBlockSize: Int = 10000): DataFrame = {
    val pairs = fuzzyNameLinkage(records, nameCol, keyCol, minJw,
      maxBlockSize)
    val sym = pairs.select(col("name_a").as("me"), col("name_b").as("other"),
        col("jw"))
      .unionAll(pairs.select(col("name_b").as("me"),
        col("name_a").as("other"), col("jw")))
    val w = Window.partitionBy(col("me"))
      .orderBy(col("jw").desc, col("other"))
    val best = sym.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("me"), col("other"), col("jw"))
    best.as("x").join(best.as("y"),
        col("x.me") === col("y.other") && col("x.other") === col("y.me") &&
          col("x.me") < col("y.me"))
      .select(col("x.me").as("name_a"), col("x.other").as("name_b"),
        col("x.jw").as("jw"))
  }

  /** Oracle fixture of [[reciprocalBestMatches]] on the part catalog. */
  private val q201 = GQuery(
    "q201_reciprocal_match",
    (s, dir) => reciprocalBestMatches(t(s, dir, "part"), "p_name",
        "p_partkey")
      .orderBy(col("name_a"), col("name_b")),
    Some("""WITH names AS (
        SELECT p_name AS name, COUNT(*) AS n_rows,
          MIN(p_partkey) AS canon_key
        FROM part GROUP BY 1),
      blk AS (SELECT *, list_extract(string_split(name, ' '), -1) AS block
        FROM names
        QUALIFY COUNT(*) OVER (PARTITION BY block) <= 10000),
      pairs AS (SELECT a.name AS name_a, b.name AS name_b,
          ROUND(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        FROM blk a JOIN blk b ON a.block = b.block AND a.name < b.name
        WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9),
      sym AS (SELECT name_a AS me, name_b AS other, jw FROM pairs
        UNION ALL SELECT name_b, name_a, jw FROM pairs),
      best AS (SELECT me, other, jw FROM (
          SELECT me, other, jw,
            ROW_NUMBER() OVER (PARTITION BY me
              ORDER BY jw DESC, other) AS rn
          FROM sym) WHERE rn = 1)
      SELECT x.me AS name_a, x.other AS name_b, x.jw AS jw
      FROM best x JOIN best y
        ON x.me = y.other AND x.other = y.me AND x.me < y.me
      ORDER BY name_a, name_b"""))

  /** Sorted-neighborhood linkage — the SECOND blocking modality beside
    * [[fuzzyNameLinkage]]'s head-noun blocks (real ER systems union
    * several blockings; each has a blind spot): sort the distinct-name
    * dictionary, then compare every name against its `windowSize`
    * nearest neighbors in sort order. A typo in the BLOCKING token
    * (head noun) makes head-noun blocking miss the pair; names sharing
    * a prefix stay adjacent in sort order regardless of which later
    * token broke — and vice versa, so the union covers both.
    *
    * Plan: rank the dictionary (single-partition window over distinct
    * names — the q164 dictionary bound; swap in the bucket-offset
    * construction for an extreme dictionary), then pair via the naive
    * band predicate `abs(rank_a − rank_b) <= windowSize` — which
    * [[graft.plans.RewriteAbsRangeJoin]] rewrites into a bucketized
    * cell hash join automatically (the operator leans on the
    * optimizer rule instead of hand-building cells; the rule's
    * RangeJoinRuleSpec proves the rewrite). JW-confirm on the pairs,
    * same output shape as [[fuzzyNameLinkage]] so callers can UNION
    * the two candidate sets before [[connectedComponents]]. */
  def sortedNeighborLinkage(records: DataFrame, nameCol: String,
      keyCol: String, windowSize: Int = 4,
      minJw: Double = 0.9): DataFrame = {
    require(windowSize >= 1 && windowSize <= 1000,
      s"windowSize must be in [1, 1000], got $windowSize")
    require(minJw > 0 && minJw <= 1, s"minJw must be in (0,1], got $minJw")
    graft.plans.RangeJoin.ensureRule(records.sparkSession)
    val names = records
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"), min(col(keyCol)).as("canon_key"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("name"))).cast(LongType))
    val a = names.select(col("name").as("name_a"), col("n_rows").as("rows_a"),
      col("canon_key").as("key_a"), col("rank").as("rank_a"))
    val b = names.select(col("name").as("name_b"), col("n_rows").as("rows_b"),
      col("canon_key").as("key_b"), col("rank").as("rank_b"))
    val jw = graft.functions.StringFunctions
      .jaro_winkler(col("name_a"), col("name_b"))
    a.join(b, abs(col("rank_a") - col("rank_b")) <= windowSize &&
        col("rank_a") < col("rank_b"))
      .withColumn("jw_raw", jw)
      .filter(col("jw_raw") >= minJw)
      .select(col("name_a"), col("name_b"), round(col("jw_raw"), 6).as("jw"),
        col("rows_a"), col("rows_b"),
        least(col("key_a"), col("key_b")).as("canon_key"))
  }

  /** Oracle fixture of [[sortedNeighborLinkage]] on the part catalog
    * (window 4): rank replayed as a plain ROW_NUMBER, the band join as
    * the naive inequality — proving the rule-rewritten plan
    * result-identical. */
  private val q187 = GQuery(
    "q187_sorted_neighbors",
    (s, dir) => sortedNeighborLinkage(t(s, dir, "part"), "p_name",
        "p_partkey")
      .orderBy(col("name_a"), col("name_b")),
    Some("""WITH names AS (
        SELECT p_name AS name, COUNT(*) AS n_rows,
          MIN(p_partkey) AS canon_key
        FROM part GROUP BY 1),
      ranked AS (SELECT *,
          CAST(ROW_NUMBER() OVER (ORDER BY name) AS BIGINT) AS rank
        FROM names),
      pairs AS (SELECT a.name AS name_a, b.name AS name_b,
          jaro_winkler_similarity(a.name, b.name) AS jw_raw,
          a.n_rows AS rows_a, b.n_rows AS rows_b,
          least(a.canon_key, b.canon_key) AS canon_key
        FROM ranked a JOIN ranked b
          ON abs(a.rank - b.rank) <= 4 AND a.rank < b.rank)
    SELECT name_a, name_b, ROUND(jw_raw, 6) AS jw, rows_a, rows_b, canon_key
    FROM pairs WHERE jw_raw >= 0.9
    ORDER BY name_a, name_b"""))

  /** Full entity resolution over a name dictionary: [[fuzzyNameLinkage]]
    * proposes pairs, [[connectedComponents]] closes them transitively
    * (pairwise linkage alone splits "acme" ~ "acmee" ~ "acme e" into
    * overlapping pairs; the ENTITY is the component), and the canonical
    * spelling per entity is the one with the most records (ties to the
    * lexicographically first name — a total order). The component label
    * (min name) is the stable entity id: insensitive to which pairs the
    * blocking proposed, reproducible across runs.
    *
    * Same scale shape as the linkage: everything past the records
    * `groupBy` runs on the distinct-name dictionary; component rounds
    * shuffle pair-sized edge lists (near-dup name clusters are shallow,
    * a handful of min-label rounds). Singleton names skip the graph
    * entirely via a left join — they are their own entity.
    */
  def resolveEntities(records: DataFrame, nameCol: String, keyCol: String,
      minJw: Double = 0.9, maxBlockSize: Int = 10000): DataFrame = {
    val pairs = fuzzyNameLinkage(records, nameCol, keyCol, minJw, maxBlockSize)
      .select(col("name_a").as("doc_a"), col("name_b").as("doc_b"))
    val comps = connectedComponents(pairs)
    val names = records.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"), min(col(keyCol)).as("min_key"))
    val labeled = names.join(comps, names("name") === comps("doc_id"), "left")
      .select(col("name"), col("n_rows"), col("min_key"),
        coalesce(col("component"), col("name")).as("entity"))
    val w = Window.partitionBy(col("entity"))
      .orderBy(col("n_rows").desc, col("name"))
    labeled.withColumn("rn", row_number().over(w))
      .select(col("entity"), col("name"), col("n_rows"), col("min_key"),
        (col("rn") === 1).as("is_canonical"))
  }

  /** Golden-record survivorship — the MERGE step after
    * [[resolveEntities]] decides WHICH records are one entity: per
    * entity, each attribute keeps its most frequent NON-NULL value
    * (majority vote across every record of every member name; ties
    * break to the smallest value — a total order, so the golden record
    * is deterministic). This is the MDM "survivorship rule" a catalog
    * dedupe ends with: the canonical name (q172) answers "what is this
    * entity called", the golden record answers "what are its fields"
    * when mirrors disagree (one source has the stale brand, another the
    * typo'd container).
    *
    * Scale shape: entity labels join back to records by the name key
    * (hash equi-join; the dictionary side is small), then ONE
    * entity-keyed aggregation per attribute — each with map-side
    * partial aggregation on (entity, value) first, so a hot entity
    * never concentrates raw rows. The argmax is `min(struct(-count,
    * value))`, no per-entity sort. Attribute count is schema-bounded
    * (a handful), not data-bounded. */
  def goldenRecord(records: DataFrame, nameCol: String, keyCol: String,
      attrCols: Seq[String], minJw: Double = 0.9,
      maxBlockSize: Int = 10000): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    require(!attrCols.contains(nameCol),
      "the name column resolves via is_canonical, not survivorship")
    val ents = resolveEntities(records, nameCol, keyCol, minJw, maxBlockSize)
      .select(col("name"), col("entity")).distinct()
    val labeled = records
      .join(ents, records(nameCol) === ents("name")).drop("name")
    val base = labeled.groupBy(col("entity"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col(nameCol)).as("n_names"))
    attrCols.foldLeft(base) { (acc, a) =>
      val pick = labeled.filter(col(a).isNotNull)
        .groupBy(col("entity"), col(a)).agg(count(lit(1)).as("c"))
        .groupBy(col("entity"))
        .agg(min(struct((-col("c")).as("nc"), col(a).as("v"))).as("p"))
        .select(col("entity"), col("p.v").as(s"${a}_golden"))
      acc.join(pick, Seq("entity"), "left")
    }
  }

  /** Oracle fixture of [[goldenRecord]]: part-catalog entities (the
    * q172 closure) with brand/type/size survivorship. */
  private val q228 = {
    val attrs = Seq("p_brand", "p_type", "p_size")
    val attrSql = attrs.map { a =>
      s"""${a}_c AS (SELECT entity, $a AS v, COUNT(*) AS c
            FROM lab WHERE $a IS NOT NULL GROUP BY 1, 2),
          ${a}_p AS (SELECT entity, v AS ${a}_golden FROM (
            SELECT entity, v, ROW_NUMBER() OVER (PARTITION BY entity
              ORDER BY c DESC, v) AS rn FROM ${a}_c) WHERE rn = 1)"""
    }.mkString(",\n")
    val attrJoin = attrs.map(a => s"LEFT JOIN ${a}_p USING (entity)")
      .mkString("\n")
    GQuery(
      "q228_golden_record",
      (s, dir) => goldenRecord(t(s, dir, "part"), "p_name", "p_partkey",
          Seq("p_brand", "p_type", "p_size"))
        .orderBy(col("entity")),
      Some(s"""WITH RECURSIVE names AS (
          SELECT p_name AS name, COUNT(*) AS n_rows
          FROM part GROUP BY 1),
        blk AS (SELECT *, list_extract(string_split(name, ' '), -1) AS block
          FROM names
          QUALIFY COUNT(*) OVER (PARTITION BY block) <= 10000),
        pairs AS (SELECT a.name AS na, b.name AS nb
          FROM blk a JOIN blk b ON a.block = b.block AND a.name < b.name
          WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9),
        sym AS (SELECT na AS u, nb AS v FROM pairs
                UNION ALL SELECT nb, na FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM sym
          UNION
          SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u),
        comp AS (SELECT u AS name, LEAST(u, MIN(v)) AS component
                 FROM reach GROUP BY u),
        lab AS (SELECT COALESCE(c.component, p.p_name) AS entity, p.*
                FROM part p LEFT JOIN comp c ON c.name = p.p_name),
        base AS (SELECT entity, COUNT(*) AS n_records,
                   COUNT(DISTINCT p_name) AS n_names
                 FROM lab GROUP BY 1),
        $attrSql
        SELECT entity, n_records, n_names,
          p_brand_golden, p_type_golden, p_size_golden
        FROM base
        $attrJoin
        ORDER BY entity"""))
  }

  /** Oracle fixture of [[resolveEntities]] on the part catalog: the
    * cold/old families merge into one entity per noun; the canonical
    * spelling is the higher-count one. */
  private val q172 = GQuery(
    "q172_entity_resolution",
    (s, dir) => resolveEntities(t(s, dir, "part"), "p_name", "p_partkey")
      .orderBy(col("entity"), col("name")),
    Some("""WITH RECURSIVE names AS (
        SELECT p_name AS name, COUNT(*) AS n_rows,
          MIN(p_partkey) AS min_key
        FROM part GROUP BY 1),
      blk AS (SELECT *, list_extract(string_split(name, ' '), -1) AS block
        FROM names
        QUALIFY COUNT(*) OVER (PARTITION BY block) <= 10000),
      pairs AS (SELECT a.name AS na, b.name AS nb
        FROM blk a JOIN blk b ON a.block = b.block AND a.name < b.name
        WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9),
      sym AS (SELECT na AS u, nb AS v FROM pairs
              UNION ALL SELECT nb, na FROM pairs),
      reach(u, v) AS (
        SELECT u, v FROM sym
        UNION
        SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u),
      comp AS (SELECT u AS name, LEAST(u, MIN(v)) AS component
               FROM reach GROUP BY u),
      lab AS (SELECT n.name, n.n_rows, n.min_key,
          COALESCE(c.component, n.name) AS entity
        FROM names n LEFT JOIN comp c USING (name))
    SELECT entity, name, n_rows, min_key,
      ROW_NUMBER() OVER (PARTITION BY entity
        ORDER BY n_rows DESC, name) = 1 AS is_canonical
    FROM lab ORDER BY entity, name"""))

  /** Collocation mining: bigram association strength as an exact-integer
    * PMI analogue, lift_ppm = 10⁶·P(w1,w2)/(P(w1)·P(w2)) computed as
    * c12·N·10⁶ div (c1·c2) in BIGINT — no float logs, so the ranking is
    * bit-identical cross-engine (the log is monotone; ranking by lift IS
    * ranking by PMI). One bigram explode feeds everything: c12 is the
    * grouped count, the marginals are window sums OVER THE AGGREGATED
    * bigram table (tiny vs the corpus), and the global total joins back
    * as a broadcast scalar — never a single-partition window over data.
    * `minCount` keeps the low-support noise (hapax pairs have huge lift)
    * out of the ranking, exactly like classic PMI thresholding.
    *
    * BIGINT headroom: c12·10⁶·N needs c12·N < 9.2·10¹² — fine to ~10⁸
    * bigrams with c12 ≤ 10⁵; past that, rescale to per-mille or compute
    * the lift in DECIMAL(38,0).
    */
  def collocations(docs: DataFrame, minCount: Long = 5, topK: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val bg = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(toks) - 2),
           i -> struct(element_at(toks, i + 1) AS w1, element_at(toks, i + 2) AS w2))"""))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val n = c12.agg(sum(col("c12")).as("n_bigrams"))
    c12
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("c2", sum(col("c12")).over(Window.partitionBy(col("w2"))))
      .filter(col("c12") >= minCount)
      .crossJoin(broadcast(n))
      .withColumn("lift_ppm", expr(
        "CAST((c12 * CAST(1000000 AS BIGINT) * n_bigrams) DIV (c1 * c2) AS BIGINT)"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"), col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Oracle fixture of [[collocations]] (minCount=5, top-20). */
  private val q78 = GQuery(
    "q78_pmi_bigrams",
    (s, dir) => collocations(t(s, dir, "documents"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2")),
    Some("""WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents
                WHERE len(string_split(text, ' ')) >= 2),
      bg AS (SELECT ts[i] AS w1, ts[i+1] AS w2
             FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
      c AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
      m AS (SELECT w1, w2, c12,
          CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
          CAST(SUM(c12) OVER (PARTITION BY w2) AS BIGINT) AS c2
        FROM c),
      n AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_bigrams FROM c)
    SELECT w1, w2, c12, c1, c2,
      CAST((c12 * 1000000 * n_bigrams) // (c1 * c2) AS BIGINT) AS lift_ppm
    FROM m, n
    WHERE c12 >= 5
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT 20"""))

  /** Canonical text normalization — the first mile of every text
    * pipeline, run BEFORE exact dedup so spacing/case variants of the
    * same document collapse to one hash group: trim, collapse runs of
    * whitespace to single spaces, lowercase. Pure codegen'd expressions,
    * single scan. Adds `norm` and a `changed` flag (the normalization
    * attrition metric). */
  def normalize(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("norm",
        lower(regexp_replace(trim(col(textCol)), "\\s+", " ")))
      .withColumn("changed", col("norm") =!= col(textCol))

  /** Oracle fixture of [[normalize]]: the fixture corpus is already
    * canonical, so the query PLANTS leading/trailing/internal whitespace
    * and mixed case (identically in both engines) and proves the
    * normalizer undoes exactly that — sha256 pins the normalized bytes. */
  private val q72 = {
    def planted(upperFn: String) =
      s"('  ' || $upperFn(substr(text, 1, 4)) || substr(text, 5) || '   tail  CASE ')"
    GQuery(
      "q72_normalize",
      (s, dir) => normalize(
          t(s, dir, "documents").withColumn("raw", expr(planted("upper"))),
          "raw")
        .select(col("doc_id"), sha2(col("norm"), 256).as("norm_hash"),
          col("changed"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
          sha256(lower(regexp_replace(trim(raw), '\\s+', ' ', 'g'))) AS norm_hash,
          lower(regexp_replace(trim(raw), '\\s+', ' ', 'g')) != raw AS changed
        FROM (SELECT doc_id, ${planted("upper")} AS raw FROM documents)
        ORDER BY doc_id"""))
  }

  private val q27 = GQuery(
    "q27_simhash",
    (s, dir) => simhash(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some(s"""SELECT doc_id, CAST(${simhashTerms("strpos", "//")} AS BIGINT) AS simhash
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY doc_id
    ORDER BY doc_id"""))

  /** Oracle fixture of [[simhashNearDups]] (32-bit, hamming ≤ 1). */
  private val q27b = GQuery(
    "q27b_simhash_neardup",
    (s, dir) => simhashNearDups(t(s, dir, "documents"))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH sh AS (
        SELECT doc_id, CAST(${simhashTerms("strpos", "//", 32)} AS BIGINT) AS simhash
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id),
      chunks AS (SELECT doc_id, simhash, i AS ci, (simhash >> (i * 8)) & 255 AS cv
                 FROM sh, UNNEST([0, 1, 2, 3]) AS u(i)),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                      x.simhash AS sa, y.simhash AS sb
               FROM chunks x JOIN chunks y
                 ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 1
    ORDER BY doc_a, doc_b"""))

  /** Exact n-gram Jaccard over LSH-free blocking (same `source`): distinct
    * shingle sets joined on (source, shingle) — inter/union arithmetic, no
    * full cross join. */
  private val q28 = GQuery(
    "q28_ngram_jaccard",
    (s, dir) => {
      // Per-doc set size rides along on every shingle row (window count),
      // so the union size falls out of the one self-join — no separate
      // sizes table, no extra joins, and both join sides are the same
      // subtree (exchange reuse).
      val sh = t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("source"), explode(expr(shinglesExpr)).as("sh"))
        .distinct()
        .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      sh.as("x")
        .join(sh.as("y"),
          col("x.source") === col("y.source") && col("x.sh") === col("y.sh") &&
            col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"),
          min(col("x.n_sh")).as("na"), min(col("y.n_sh")).as("nb"))
        .select(col("doc_a"), col("doc_b"),
          round(col("n_inter").cast(DoubleType) /
            (col("na") + col("nb") - col("n_inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.1)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""$shinglesSql,
      dsh AS (SELECT DISTINCT doc_id, source, sh FROM shingles),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
      inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_inter
                FROM dsh x JOIN dsh y
                  ON x.source = y.source AND x.sh = y.sh AND x.doc_id < y.doc_id
                GROUP BY 1, 2)
    SELECT * FROM (
      SELECT doc_a, doc_b,
        ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id)
    WHERE jaccard >= 0.1
    ORDER BY doc_a, doc_b"""))

  /** Language ID by stopword-profile voting with a deterministic
    * precedence-ordered argmax; output is the lang × predicted confusion
    * matrix. */
  private val q31 = {
    val profiles = Seq(
      "en" -> Seq("the", "a", "of", "and"),
      "es" -> Seq("data", "row", "value"),
      "de" -> Seq("join", "merge", "hash"),
      "fr" -> Seq("query", "filter", "sort"),
      "zh" -> Seq("spark", "stream", "batch"))
    def hitsExpr(words: Seq[String], filterFn: String, lenFn: String, splitFn: String) =
      s"$lenFn($filterFn($splitFn(text, ' '), x -> x IN (${words.map(w => s"'$w'").mkString(", ")})))"
    def predSql(filterFn: String, lenFn: String, splitFn: String): String = {
      val hs = profiles.map { case (l, ws) => l -> hitsExpr(ws, filterFn, lenFn, splitFn) }
      val cases = hs.zipWithIndex.init.map { case ((l, h), i) =>
        val rest = hs.drop(i + 1).map(_._2)
        s"WHEN ${rest.map(r => s"$h >= $r").mkString(" AND ")} THEN '$l'"
      }
      s"CASE ${cases.mkString(" ")} ELSE '${profiles.last._1}' END"
    }
    GQuery(
      "q31_lang_id",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("predicted", expr(predSql("filter", "size", "split")))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some(s"""SELECT lang, ${predSql("list_filter", "len", "string_split")} AS predicted,
        COUNT(*) AS n
      FROM documents
      GROUP BY 1, 2
      ORDER BY lang, predicted"""))
  }

  /** Quality scoring: token counts, average token length, stopword ratio,
    * and a blended 0-1 score — the filter stage of a pretraining pipeline. */
  private val q32 = {
    val stop = Seq("the", "a", "of", "and", "data", "row")
      .map(w => s"'$w'").mkString(", ")
    def exprs(filterFn: String, lenFn: String, strlenFn: String, splitFn: String) = Map(
      "n_tokens" -> s"CAST($lenFn($splitFn(text, ' ')) AS BIGINT)",
      "n_stop" -> s"CAST($lenFn($filterFn($splitFn(text, ' '), x -> x IN ($stop))) AS BIGINT)",
      "n_alpha" -> s"CAST($strlenFn(replace(text, ' ', '')) AS BIGINT)")
    GQuery(
      "q32_quality_score",
      (s, dir) => {
        val e = exprs("filter", "size", "length", "split")
        t(s, dir, "documents")
          .withColumn("n_tokens", expr(e("n_tokens")))
          .withColumn("n_stop", expr(e("n_stop")))
          .withColumn("n_alpha", expr(e("n_alpha")))
          .select(
            col("doc_id"), col("n_tokens"),
            round(col("n_alpha").cast(DoubleType) / col("n_tokens"), 6).as("avg_tok_len"),
            round(col("n_stop").cast(DoubleType) / col("n_tokens"), 6).as("stop_ratio"),
            round(least(col("n_tokens").cast(DoubleType) / 200.0, lit(1.0)) * 0.5 +
              (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tokens")) * 0.5, 6)
              .as("q_score"))
          .orderBy(col("doc_id"))
      },
      {
        val e = exprs("list_filter", "len", "len", "string_split")
        Some(s"""SELECT doc_id, n_tokens,
          ROUND(CAST(n_alpha AS DOUBLE) / n_tokens, 6) AS avg_tok_len,
          ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
          ROUND(LEAST(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) * 0.5 +
                (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.5, 6) AS q_score
        FROM (SELECT doc_id, ${e("n_tokens")} AS n_tokens,
                ${e("n_stop")} AS n_stop, ${e("n_alpha")} AS n_alpha
              FROM documents)
        ORDER BY doc_id""")
      })
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex token count
    * (letter runs / digit runs / single other), aggregated per lang. */
  private val q33 = GQuery(
    "q33_token_count",
    (s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).cast(LongType).as("ws_toks"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast(LongType).as("re_toks"))
        .groupBy(col("lang"))
        .agg(sum(col("ws_toks")).as("sum_ws_tokens"),
          sum(col("re_toks")).as("sum_re_tokens"),
          max(col("ws_toks")).as("max_ws_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang,
      CAST(SUM(ws_toks) AS BIGINT) AS sum_ws_tokens,
      CAST(SUM(re_toks) AS BIGINT) AS sum_re_tokens,
      CAST(MAX(ws_toks) AS BIGINT) AS max_ws_tokens,
      COUNT(*) AS n_docs
    FROM (SELECT lang,
            len(string_split(text, ' ')) AS ws_toks,
            len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_toks
          FROM documents)
    GROUP BY lang
    ORDER BY lang"""))

  /** Winnowing-style document fingerprints: min md5 within each window of
    * 4 consecutive shingles; distinct mins are the fingerprint set.
    *
    * Entirely MAP-SIDE (round-9 rewrite): the fingerprint set is a
    * per-document computation, so exploding shingles to rows and paying
    * a doc_id shuffle + sort for a windowed min (the first-draft shape —
    * ~50× row blow-up, two exchanges) is pure overhead. The sliding min
    * runs as array higher-order functions on the shingle-hash array
    * (`slice` truncates at the array end, reproducing the window's
    * short tails), distinct-count and min collapse per row: scan →
    * projection, ZERO shuffles. The unchanged oracle replays the
    * windowed form, pinning the HOF rewrite result-identical. */
  private val q34 = GQuery(
    "q34_fingerprint",
    (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .withColumn("hs", expr(s"transform($shinglesExpr, x -> md5(x))"))
        .withColumn("fs", expr(
          "transform(sequence(1, size(hs)), i -> array_min(slice(hs, i, 4)))"))
        .select(col("doc_id"),
          size(array_distinct(col("fs"))).cast(LongType).as("n_fp"),
          array_min(col("fs")).as("min_fp"))
        .orderBy(col("doc_id"))
    },
    Some(s"""$shinglesSql,
      hashed AS (SELECT doc_id, i, md5(sh) AS h FROM shingles),
      fp AS (SELECT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS f
             FROM hashed)
    SELECT doc_id, COUNT(DISTINCT f) AS n_fp, MIN(f) AS min_fp
    FROM fp
    GROUP BY doc_id
    ORDER BY doc_id"""))

  /** Multimodal column plumbing: payload as an opaque binary column with
    * typed metadata; "decode" is a deterministic stub (length + header hex
    * + strided frame samples) since no media codecs ship in this env — the
    * schema/partitioning/batch shape is the real, tested part. */
  private val q35 = GQuery(
    "q35_multimodal_stub",
    (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"),
          col("lang"), col("source"))
        .select(
          col("doc_id"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          lower(hex(expr("substring(payload, 1, 8)"))).as("header_hex"),
          lower(hex(expr("substring(payload, 33, 4)"))).as("frame1_hex"),
          lower(hex(expr("substring(payload, 65, 4)"))).as("frame2_hex"),
          concat(col("lang"), lit("/"), col("source")).as("media_tag"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      octet_length(encode(text)) AS n_bytes,
      lower(hex(encode(substring(text, 1, 8)))) AS header_hex,
      lower(hex(encode(substring(text, 33, 4)))) AS frame1_hex,
      lower(hex(encode(substring(text, 65, 4)))) AS frame2_hex,
      lang || '/' || source AS media_tag
    FROM documents
    ORDER BY doc_id"""))

  /** Oracle fixture of [[graft.multimodal.Media.frameSignatures]] +
    * [[graft.multimodal.Media.frameOverlap]]: payloads = document text
    * bytes (the q35 convention — no codecs in the sandbox; the plumbing
    * is the tested part), 24-byte frames, pairs sharing ≥ 2 distinct
    * frames. The corpus's planted exact-duplicate texts surface as
    * full-containment pairs. */
  private val q206 = GQuery(
    "q206_frame_dedup",
    (s, dir) => {
      val sigs = graft.multimodal.Media.frameSignatures(
        t(s, dir, "documents"), "doc_id", "text", frameBytes = 24)
      graft.multimodal.Media.frameOverlap(sigs, minShared = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH sigs AS (SELECT doc_id AS media_id, i AS frame_idx,
          md5(substring(text, CAST(i * 24 + 1 AS INT), 24)) AS h
        FROM documents,
          UNNEST(generate_series(0, (len(text) - 1) // 24)) AS u(i)
        WHERE len(text) > 0),
      dist AS (SELECT DISTINCT media_id, h FROM sigs),
      hot AS (SELECT h FROM dist GROUP BY h HAVING COUNT(*) > 1000),
      cold AS (SELECT * FROM dist WHERE h NOT IN (SELECT h FROM hot)),
      nf AS (SELECT media_id, COUNT(*) AS nf FROM dist GROUP BY media_id),
      pairs AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
          COUNT(*) AS shared_frames
        FROM cold a JOIN cold b
          ON a.h = b.h AND a.media_id < b.media_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, shared_frames, na.nf AS nf_a, nb.nf AS nf_b,
        (1000000 * shared_frames) // least(na.nf, nb.nf) AS containment_ppm
      FROM pairs
      JOIN nf na ON na.media_id = id_a
      JOIN nf nb ON nb.media_id = id_b
      WHERE shared_frames >= 2
      ORDER BY id_a, id_b"""))

  /** Corpus n-gram statistics: top-20 bigrams by frequency with doc
    * frequency — the vocabulary-analysis pass of a pretraining pipeline
    * (one explode + one aggregation; top-k via rank, not a global sort). */
  private val q45 = GQuery(
    "q45_ngram_topk",
    (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(shingleExprN(2))).as("bg"))
        .groupBy(col("bg"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("doc_freq"))
        .orderBy(col("n").desc, col("bg"))
        .limit(20)
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents WHERE len(string_split(text, ' ')) >= 2),
      bigrams AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg
                  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i))
    SELECT bg, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS doc_freq
    FROM bigrams
    GROUP BY bg
    ORDER BY n DESC, bg
    LIMIT 20"""))

  /** Curation: stratified top-N selection — keep the 5 highest-quality
    * docs per source (the per-domain cap of a pretraining mix). Score is
    * the q32 formula; ranking is one window per source, so at corpus scale
    * this is a single hash-partitioned pass, not a global sort. */
  private val q47 = {
    def scoreSql(filterFn: String, lenFn: String, splitFn: String): String = {
      val nTok = s"$lenFn($splitFn(text, ' '))"
      val nStop = s"$lenFn($filterFn($splitFn(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'data', 'row')))"
      s"""ROUND(LEAST(CAST($nTok AS DOUBLE) / 200.0, 1.0) * 0.5 +
          (1.0 - CAST($nStop AS DOUBLE) / $nTok) * 0.5, 6)"""
    }
    GQuery(
      "q47_curation_topn",
      (s, dir) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("q_score").desc, col("doc_id"))
        t(s, dir, "documents")
          .withColumn("q_score", expr(scoreSql("filter", "size", "split")))
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter(col("rn") <= 5)
          .select(col("source"), col("rn"), col("doc_id"), col("q_score"))
          .orderBy(col("source"), col("rn"))
      },
      Some(s"""SELECT source, rn, doc_id, q_score FROM (
        SELECT source, doc_id, q_score,
          ROW_NUMBER() OVER (PARTITION BY source
                             ORDER BY q_score DESC, doc_id) AS rn
        FROM (SELECT source, doc_id,
                ${scoreSql("list_filter", "len", "string_split")} AS q_score
              FROM documents))
      WHERE rn <= 5
      ORDER BY source, rn"""))
  }

  /** Deterministic hash bucket in [0, 100) from a doc id — the
    * reproducible train/val/test splitter: no RNG, so the same doc lands
    * in the same split on every run, every engine, every cluster size
    * (sampleBy-style RNG splits are neither reproducible cross-engine nor
    * stable under repartitioning). Value = 4 hex chars of md5(doc_id)
    * starting at `offset` as an int, mod 100 — different offsets give
    * independent buckets, so e.g. a stratified SAMPLE decision doesn't
    * correlate with the train/val/test SPLIT decision. */
  private[queries] def hashBucketExpr(strpos: String, idCol: String,
      strType: String, offset: Int = 1): String = {
    def h(k: Int) = s"($strpos('0123456789abcdef', substr(md5(CAST($idCol AS $strType)), $k, 1)) - 1)"
    s"((((${h(offset)} * 16 + ${h(offset + 1)}) * 16 + ${h(offset + 2)}) * 16 + ${h(offset + 3)}) % 100)"
  }

  /** Fine-grained sibling of [[hashBucketExpr]]: a deterministic bucket in
    * [0, 1e6) from 5 md5 nibbles at `offset` (value 0..1048575, mod 1e6 —
    * the fold-back gives buckets under 48576 weight 2/16^5 instead of
    * 1/16^5, a ≤4.7% density ripple that is irrelevant for sampling and
    * identical in both engines). Parts-per-million granularity is what
    * DATA-DRIVEN rates need: mixture-rebalance rates are computed in ppm,
    * and rounding them to percent would visibly distort small strata. */
  private[queries] def ppmBucketExpr(strpos: String, idCol: String,
      strType: String, offset: Int): String = {
    def h(k: Int) = s"($strpos('0123456789abcdef', substr(md5(CAST($idCol AS $strType)), $k, 1)) - 1)"
    val folded = (1 until 5).foldLeft(h(offset)) {
      case (acc, i) => s"($acc * 16 + ${h(offset + i)})"
    }
    s"($folded % 1000000)"
  }

  /** Assign each doc a deterministic split label: [0,trainPct) → train,
    * [trainPct,trainPct+valPct) → val, rest → test. */
  def hashSplit(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucketExpr("instr", "doc_id", "STRING")
    docs.withColumn("split",
      expr(s"""CASE WHEN $b < $trainPct THEN 'train'
               WHEN $b < ${trainPct + valPct} THEN 'val'
               ELSE 'test' END"""))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * land in the SAME split, or the model trains on (a copy of) its own
    * eval set — the contamination [[hashSplit]] cannot see because it
    * hashes each doc independently. Docs first cluster by the LSH
    * near-dup graph ([[connectedComponents]] over [[lshCandidates]];
    * docs with no near-dup are their own singleton cluster), then the
    * split decision hashes the CLUSTER id, so a whole near-dup family
    * moves between splits atomically.
    *
    * Cost = the near-dup pipeline (bucketed band joins + label
    * propagation over candidate EDGES only) + one left join of the
    * cluster labels back onto the corpus — the split itself stays a
    * scan-side expression. Returns (doc_id, cluster, split). */
  def leakageSafeSplit(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5,
      minEstJaccard: Double = 0.25, maxBandSize: Int = 1000): DataFrame =
    leakageSafeSplitFrom(docs,
      connectedComponents(
        lshCandidates(minhashBands(docs), maxBandSize)
          .filter(col("est_jaccard") >= minEstJaccard)),
      trainPct, valPct)

  /** [[leakageSafeSplit]] over PRE-BUILT near-dup components — the
    * [[graft.pipelines.DedupGraphPipeline]] entry point. */
  def leakageSafeSplitFrom(docs: DataFrame, comp: DataFrame,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucketExpr("instr", "cluster", "STRING")
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("split",
        expr(s"""CASE WHEN $b < $trainPct THEN 'train'
                 WHEN $b < ${trainPct + valPct} THEN 'val'
                 ELSE 'test' END"""))
      .select(col("doc_id"), col("cluster"), col("split"))
  }

  /** Benchmark decontamination: train docs sharing at least one
    * `width`-gram with any eval doc. Distinct shingles per side, one
    * equi-join on the shingle — hash-partitioned, never all-pairs; at
    * 100 TB the (much smaller) eval shingle set typically broadcasts.
    * Returns (doc_id, n_hits = distinct shared shingles). */
  def decontaminationHits(train: DataFrame, eval: DataFrame, width: Int = 5): DataFrame = {
    // eval side dedups straight on the shingle — a (doc_id, s) distinct
    // first would be a second, wasted shuffle of the eval shingles
    val evalShingles = explodedShingles(eval, width).select(col("s")).distinct()
    explodedShingles(train, width).distinct()
      .join(evalShingles, "s")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_hits"))
  }

  private def explodedShingles(df: DataFrame, width: Int) = df
    .withColumn("toks", split(col("text"), " "))
    .filter(size(col("toks")) >= width)
    .select(col("doc_id"), explode(expr(shingleExprN(width))).as("s"))

  /** [[decontaminationHits]] with a Bloom-filter prefilter — the 100 TB
    * path. The eval side's distinct shingles build one compact Bloom
    * sketch (a distributed aggregation; only the ~`1.2·n·log2(1/fpp)`-bit
    * sketch reaches the driver), which then prunes the train shingles
    * MAP-SIDE, before the (doc_id, shingle) distinct: the corpus-sized
    * shuffle carries only probable hits instead of every shingle of every
    * document. The exact confirm-join afterwards removes the Bloom false
    * positives, so the result is byte-identical to [[decontaminationHits]]
    * — the sketch changes the plan, never the answer. */
  def decontaminationHitsBloom(train: DataFrame, eval: DataFrame,
      width: Int = 5, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // the eval shingle set is read three times (count for sizing, sketch
    // build, confirm join) and is small by construction of a
    // decontamination run — cache it rather than re-exploding the eval
    // docs per use; eviction is LRU if memory is ever tight
    val evalShingles = explodedShingles(eval, width).select(col("s")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = math.max(evalShingles.count(), 1L)
    val bloom = evalShingles.stat.bloomFilter("s", n, fpp)
    val mightContain = udf((s: String) => s != null && bloom.mightContain(s))
    explodedShingles(train, width)
      .filter(mightContain(col("s"))) // before distinct: shrink the shuffle
      .distinct()
      .join(evalShingles, "s")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_hits"))
  }

  /** Oracle fixture of [[hashSplit]]: per-split doc and token counts. */
  private val q48 = GQuery(
    "q48_hash_split",
    (s, dir) => hashSplit(t(s, dir, "documents"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
      .orderBy(col("split")),
    Some(s"""SELECT split, COUNT(*) AS n_docs,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM (SELECT text,
          CASE WHEN ${hashBucketExpr("strpos", "doc_id", "VARCHAR")} < 90 THEN 'train'
               WHEN ${hashBucketExpr("strpos", "doc_id", "VARCHAR")} < 95 THEN 'val'
               ELSE 'test' END AS split
        FROM documents)
      GROUP BY split
      ORDER BY split"""))

  /** Oracle fixture of [[decontaminationHits]]: eval set = doc_id % 97 = 0
    * (a deterministic stand-in benchmark), 5-gram overlap. */
  private val q50 = {
    val idx5 = (0 until 5).map(k => s"ts[i + $k]").mkString(" || ' ' || ")
    GQuery(
      "q50_decontamination",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        decontaminationHits(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                  FROM documents WHERE len(string_split(text, ' ')) >= 5),
        sh AS (SELECT DISTINCT doc_id, $idx5 AS s
               FROM toks, UNNEST(generate_series(1, len(ts) - 4)) AS u(i)),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
      SELECT sh.doc_id, COUNT(DISTINCT sh.s) AS n_hits
      FROM sh JOIN ev USING (s)
      WHERE sh.doc_id % 97 <> 0
      GROUP BY sh.doc_id
      ORDER BY sh.doc_id"""))
  }

  /** Oracle fixture of [[decontaminationHitsBloom]]: eval set =
    * doc_id % 89 = 0, 5-gram overlap. The oracle is the EXACT-join SQL —
    * the Bloom prefilter must not change the answer, only the plan. */
  private val q54 = {
    val idx5 = (0 until 5).map(k => s"ts[i + $k]").mkString(" || ' ' || ")
    GQuery(
      "q54_bloom_decontamination",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        decontaminationHitsBloom(
            docs.filter(col("doc_id") % 89 =!= 0),
            docs.filter(col("doc_id") % 89 === 0))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                  FROM documents WHERE len(string_split(text, ' ')) >= 5),
        sh AS (SELECT DISTINCT doc_id, $idx5 AS s
               FROM toks, UNNEST(generate_series(1, len(ts) - 4)) AS u(i)),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 89 = 0)
      SELECT sh.doc_id, COUNT(DISTINCT sh.s) AS n_hits
      FROM sh JOIN ev USING (s)
      WHERE sh.doc_id % 89 <> 0
      GROUP BY sh.doc_id
      ORDER BY sh.doc_id"""))
  }

  /** Oracle fixture of [[graft.functions.Aggregators.FrequentItems]]:
    * token heavy hitters via a Misra–Gries sketch sized above the corpus
    * vocabulary, where the sketch is provably exact — so the full
    * GROUP-BY histogram is the oracle. The under-pressure approximation
    * guarantee is AggregatorsSpec's job; this pins the reduce/merge
    * plumbing end-to-end through a real shuffle. */
  private val q62 = GQuery(
    "q62_heavy_hitters",
    (s, dir) => {
      val mg = udaf(new graft.functions.Aggregators.FrequentItems(256),
        org.apache.spark.sql.Encoders.STRING)
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(mg(col("tok")).as("sketch"))
        .select(explode(col("sketch")).as(Seq("tok", "est")))
        .orderBy(col("tok"))
    },
    Some("""SELECT tok, COUNT(*) AS est
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
      ORDER BY tok"""))

  /** Intra-document repetition stats (the Gopher-style repetition
    * filter): fraction of a doc's 3-gram shingles that are duplicates —
    * high dup_ratio marks boilerplate/looping text a pretraining pipeline
    * drops. One explode + one grouped aggregation per doc; no joins. */
  def repetitionStats(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), countDistinct(col("s")).as("n_distinct"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_distinct") / col("n_shingles"), 6))

  /** Oracle fixture of [[repetitionStats]]. */
  private val q49 = GQuery(
    "q49_repetition",
    (s, dir) => repetitionStats(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents WHERE len(string_split(text, ' ')) >= 3),
      sh AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i))
    SELECT doc_id, COUNT(*) AS n_shingles,
      COUNT(DISTINCT s) AS n_distinct,
      ROUND(1.0 - (1.0 * COUNT(DISTINCT s)) / COUNT(*), 6) AS dup_ratio
    FROM sh
    GROUP BY doc_id
    ORDER BY doc_id"""))

  /** Oracle fixture of [[leakageSafeSplit]] (90/5/5): per-doc cluster and
    * split labels; the oracle rebuilds the near-dup components with the
    * recursive transitive-closure CTE and hashes the same cluster id. */
  private val q81 = GQuery(
    "q81_leakage_split",
    (s, dir) => leakageSafeSplit(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some(s"""${minhashCandSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
      reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
               FROM reach GROUP BY u),
      lab AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
              FROM documents d LEFT JOIN comp c USING (doc_id))
    SELECT doc_id, cluster,
      CASE WHEN ${hashBucketExpr("strpos", "cluster", "VARCHAR")} < 90 THEN 'train'
           WHEN ${hashBucketExpr("strpos", "cluster", "VARCHAR")} < 95 THEN 'val'
           ELSE 'test' END AS split
    FROM lab
    ORDER BY doc_id"""))

  /** Cluster-atomic k-fold assignment — the cross-validation sibling of
    * [[leakageSafeSplit]]: every doc gets a fold in [0, k), and all
    * near-duplicates (one LSH component) share a fold, so no fold's
    * held-out set ever contains a copy of another fold's training data.
    * The fold is a ppm hash of the CLUSTER id (own offset 13, so fold
    * assignment is independent of the split/sample/repeat buckets);
    * singleton docs are their own cluster, exactly as in the split.
    * Same cost shape as [[leakageSafeSplit]]: the near-dup pipeline +
    * one left join; the fold itself is a scan-side expression. */
  def kFoldSplit(docs: DataFrame, k: Int = 5,
      minEstJaccard: Double = 0.25, maxBandSize: Int = 1000): DataFrame =
    kFoldSplitFrom(docs,
      connectedComponents(
        lshCandidates(minhashBands(docs), maxBandSize)
          .filter(col("est_jaccard") >= minEstJaccard)), k)

  /** [[kFoldSplit]] over PRE-BUILT near-dup components — the
    * [[graft.pipelines.DedupGraphPipeline]] entry point. */
  def kFoldSplitFrom(docs: DataFrame, comp: DataFrame, k: Int = 5)
      : DataFrame = {
    require(k >= 2 && k <= 100, s"k must be in [2, 100], got $k")
    val b = ppmBucketExpr("instr", "cluster", "STRING", offset = 13)
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("fold", expr(s"CAST($b % $k AS BIGINT)"))
      .select(col("doc_id"), col("cluster"), col("fold"))
  }

  /** Oracle fixture of [[kFoldSplit]] (k = 5): the q81 component replay
    * with the fold hash on the cluster id. */
  private val q199 = {
    val b = ppmBucketExpr("strpos", "cluster", "VARCHAR", offset = 13)
    GQuery(
      "q199_kfold_split",
      (s, dir) => kFoldSplit(t(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some(s"""${minhashCandSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
        edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                  UNION SELECT doc_b, doc_a FROM cand),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
                 FROM reach GROUP BY u),
        lab AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
                FROM documents d LEFT JOIN comp c USING (doc_id))
      SELECT doc_id, cluster, CAST($b % 5 AS BIGINT) AS fold
      FROM lab
      ORDER BY doc_id"""))
  }

  /** Inverted index (token → document-frequency + head of the posting
    * list): the retrieval-side structure a corpus search / dedup-debug
    * tool builds over a text corpus. The posting list is CAPPED before
    * collection — `row_number <= maxPostings` runs on the token
    * partitioning, so no executor ever materializes an unbounded
    * per-token list (a stopword's full posting list at 100 TB is the
    * corpus itself; the cap plus the separate exact `df` count is the
    * scale-safe contract). One shuffle on token: the rank and the df
    * count share the window exchange; the final agg groups on the same
    * key (token, df) and AQE coalesces the tiny tail. */
  def invertedIndex(docs: DataFrame, maxPostings: Int = 20): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    val pairs = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    val wOrd = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    val wAll = Window.partitionBy(col("token"))
    pairs
      .select(col("token"), col("doc_id"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("df"))
      .filter(col("rn") <= maxPostings)
      .groupBy(col("token"), col("df"))
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("postings_head"))
      .select(col("token"), col("df"), col("postings_head"))
  }

  /** Oracle fixture of [[invertedIndex]] (cap 20). */
  private val q91 = GQuery(
    "q91_inverted_index",
    (s, dir) => invertedIndex(t(s, dir, "documents"))
      .orderBy(col("token")),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
      pairs AS (
        SELECT DISTINCT doc_id, token FROM tok WHERE len(token) > 0),
      win AS (
        SELECT token, doc_id,
          ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY token) AS df
        FROM pairs)
      SELECT token, df,
        array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings_head
      FROM win WHERE rn <= 20
      GROUP BY token, df
      ORDER BY token"""))

  /** DuckDB MinHash signature + band CTEs over a filtered `documents`
    * subset, prefixed `alias_` — the cross-corpus twin of the
    * [[minhashCandSql]] self-join prefix. */
  private def sigSqlFor(alias: String, pred: String): String = {
    val sigCols = (0 until 8)
      .map(i => s"MIN(${minhashLane(i, "h1", "h2")}) AS h$i").mkString(", ")
    val bandSql = (0 until 4).map(b =>
      s"""SELECT doc_id, $b AS band, h${2 * b} || h${2 * b + 1} AS bkey,
          h0, h1, h2, h3, h4, h5, h6, h7 FROM ${alias}_sig""")
      .mkString(" UNION ALL ")
    s"""${alias}_toks AS (SELECT doc_id, string_split(text, ' ') AS ts
          FROM documents
          WHERE ($pred) AND len(string_split(text, ' ')) >= 3),
        ${alias}_sh AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
          FROM ${alias}_toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)),
        ${alias}_sig AS (SELECT doc_id, $sigCols
          FROM (SELECT doc_id, md5(sh) AS h1, md5('x:' || sh) AS h2
                FROM ${alias}_sh)
          GROUP BY doc_id),
        ${alias}_bands AS ($bandSql)"""
  }

  /** FUZZY benchmark decontamination: train docs whose MinHash-estimated
    * Jaccard against ANY eval doc reaches `minEstJaccard` — the
    * near-duplicate complement of [[decontaminationHits]]' exact n-gram
    * overlap (a paraphrased eval item shares few exact 5-grams but most
    * of its 3-token shingles). Returns one row per contaminated train
    * doc: (train_doc, n_eval_hits, max_est_jaccard).
    *
    * Scale shape: eval benchmark suites are small by construction, so the
    * eval band side is BROADCAST — the train corpus never shuffles; the
    * band match runs map-side inside the scan stage. The skew guard caps
    * the eval side's band buckets, which bounds the per-train-row
    * fan-out at `maxBandSize` regardless of how degenerate a train band
    * key is. If the eval set ever outgrows broadcast, drop the hint and
    * the same plan runs as a hash join on (band, bkey). */
  def fuzzyDecontamination(train: DataFrame, eval: DataFrame,
      minEstJaccard: Double = 0.5, maxBandSize: Int = 1000,
      failOnCappedBand: Boolean = false): DataFrame = {
    require(minEstJaccard > 0 && minEstJaccard <= 1,
      s"minEstJaccard must be in (0,1], got $minEstJaccard")
    // The band cap drops eval buckets — for a DECONTAMINATION filter
    // that's the unsafe direction (a dropped bucket means contamination
    // passes unflagged). The opt-in check fails loudly instead; it runs
    // eagerly but only over the (small, broadcast-bound) eval side.
    fuzzyDecontaminationBands(minhashBands(train), minhashBands(eval),
      minEstJaccard, maxBandSize, failOnCappedBand)
  }

  /** [[fuzzyDecontamination]] over PRE-BUILT band tables — the
    * [[contaminationReport]] seam (round-15: the composite card shares
    * each side's shingle+digest pass across modalities). */
  private def fuzzyDecontaminationBands(trBands: DataFrame,
      evBands: DataFrame, minEstJaccard: Double, maxBandSize: Int,
      failOnCappedBand: Boolean = false): DataFrame = {
    if (failOnCappedBand) {
      val over = evBands.groupBy(col("band"), col("bkey"))
        .count().filter(col("count") > maxBandSize).count()
      require(over == 0, s"$over eval band buckets exceed maxBandSize=" +
        s"$maxBandSize and would be silently dropped; raise the cap, " +
        "tighten the band scheme, or pre-dedup the eval set")
    }
    val pairs = trBands.as("x")
      .join(broadcast(bandSizeGuard(evBands, maxBandSize)).as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("train_doc"), col("y.doc_id").as("eval_doc"),
        laneAgreement.as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .distinct()
    pairs.groupBy(col("train_doc"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(col("est_jaccard")).as("max_est_jaccard"))
  }

  /** Oracle fixture of [[fuzzyDecontamination]]: eval set = doc_id % 10
    * = 3 (a 10% holdout; unlike q50's % 97 split this one cuts through
    * several of the corpus's near-dup families, so the fixture exercises
    * real hits), threshold 0.5 (4 of 8 lanes agree). */
  private val q94 = {
    val estSql = (0 until 8).map(i => s"CASE WHEN x.h$i = y.h$i THEN 1 ELSE 0 END")
      .mkString("(", " + ", ") / 8.0")
    GQuery(
      "q94_fuzzy_decontamination",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        fuzzyDecontamination(
          docs.filter(col("doc_id") % 10 =!= 3),
          docs.filter(col("doc_id") % 10 === 3))
          .orderBy(col("train_doc"))
      },
      Some(s"""WITH ${sigSqlFor("tr", "doc_id % 10 <> 3")},
        ${sigSqlFor("ev", "doc_id % 10 = 3")},
        ev_capped AS (
          SELECT * FROM ev_bands
          QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= 1000),
        pairs AS (
          SELECT DISTINCT x.doc_id AS train_doc, y.doc_id AS eval_doc,
            $estSql AS est_jaccard
          FROM tr_bands x JOIN ev_capped y
            ON x.band = y.band AND x.bkey = y.bkey)
        SELECT train_doc, COUNT(*) AS n_eval_hits,
          MAX(est_jaccard) AS max_est_jaccard
        FROM pairs WHERE est_jaccard >= 0.5
        GROUP BY train_doc
        ORDER BY train_doc"""))
  }

  /** Cross-source mirror detection: for every source pair, the number of
    * distinct document texts they BOTH carry — the provenance-overlap
    * diagnostic that finds mirrored crawls before per-domain caps or
    * mixture weights are trusted (two mirrors of one site would count as
    * two independent "sources" feeding the mix). Distinct (hash, source)
    * pairs first — one shuffle, the per-hash fan-out bounded by the
    * source count, never by corpus size — then an equi self-join on the
    * hash. The diagonal (a = b) is each source's distinct-text count. */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val hs = docs.select(sha2(col("text"), 256).as("h"), col("source")).distinct()
    hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.source") <= col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Oracle fixture of [[sourceOverlap]]: off-diagonal rows are the
    * mirror signal (the fixture's near-dup families cross sources). */
  private val q105 = GQuery(
    "q105_source_overlap",
    (s, dir) => sourceOverlap(t(s, dir, "documents"))
      .orderBy(col("source_a"), col("source_b")),
    Some("""WITH hs AS (
        SELECT DISTINCT sha256(text) AS h, source FROM documents)
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
      FROM hs a JOIN hs b ON a.h = b.h AND a.source <= b.source
      GROUP BY a.source, b.source
      ORDER BY source_a, source_b"""))

  /** Cross-document exact-substring duplication (the suffix-array-style
    * span dedup of "Deduplicating Training Data" re-expressed as a
    * shuffle-bounded Spark plan): every `width`-token rolling span is a
    * key; a span occurring more than once ANYWHERE in the corpus is
    * duplicated, and each doc reports how many of its tokens are covered
    * by duplicated spans — the trim/drop signal for verbatim-repeated
    * passages that intra-doc repetition (q49) and whole-doc hashing (q25)
    * both miss.
    *
    * Coverage is an exact interval union, not `n_dup_spans * width`:
    * overlapping duplicated spans share tokens, so each span contributes
    * `end - max(prev_covered_end, start - 1)` clipped at 0, with the
    * running covered-end a window max over the doc's spans in start
    * order.
    *
    * Scale shape: explode is map-side; the duplicate mark is one window
    * on the span value (hash shuffle on the span — the only corpus-sized
    * exchange); the coverage window + final aggregation share one
    * doc_id exchange. No self-join — at 100 TB a stopword-heavy span
    * key fans out within its window partition but never produces pairs.
    */
  /** One row per rolling `width`-token span: (doc_id, i, span) with `i`
    * the 0-based start. Map-side explode — shared by [[spanDuplication]]
    * and [[graft.etl.IncrementalSpanDedup]]. */
  private[graft] def spanRows(docs: DataFrame, width: Int): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= width)
      .select(col("doc_id"),
        posexplode(expr(shingleExprN(width))).as(Seq("i", "span")))

  /** Fold dup-marked spans (doc_id, i, dup) into per-doc coverage: the
    * covered-token count is an exact interval union (overlapping
    * duplicated spans share tokens — each contributes
    * `end − max(prev_covered_end, start)` clipped at 0, with the running
    * covered-end a window max over the doc's spans in start order). */
  private[graft] def spanCoverage(marked: DataFrame, width: Int): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    marked
      .withColumn("e", (col("i") + width).cast(LongType))
      .withColumn("pe", max(when(col("dup"), col("e"))).over(wDoc))
      .withColumn("contrib", when(col("dup"),
          greatest(lit(0L), col("e") -
            greatest(col("i").cast(LongType), coalesce(col("pe"), lit(0L)))))
        .otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_spans"),
        sum(col("contrib")).as("covered_tokens"))
  }

  /** Join per-doc coverage back to every doc (0s for span-less docs) and
    * derive the ratio. */
  private[graft] def withCoverageRatio(docs: DataFrame,
      agg: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_toks"))
      .join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "n_dup_spans", "covered_tokens"))
      .withColumn("dup_token_ratio",
        round(col("covered_tokens").cast(DoubleType) / col("n_toks"), 6))

  def spanDuplication(docs: DataFrame, width: Int = 8): DataFrame = {
    require(width >= 2, s"span width must be >= 2, got $width")
    val marked = spanRows(docs, width)
      .withColumn("dup",
        count(lit(1)).over(Window.partitionBy(col("span"))) > 1)
    withCoverageRatio(docs, spanCoverage(marked, width))
  }

  /** Oracle fixture of [[spanDuplication]] (width 8). The DuckDB twin
    * rebuilds the same spans 1-based (`i` is the 1-based start, so
    * `e = i + 7` and the clip floor is `i - 1`). */
  private val q110 = GQuery(
    "q110_span_dedup",
    (s, dir) => spanDuplication(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents),
      sp AS (SELECT doc_id, i,
          ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' ||
          ts[i+4] || ' ' || ts[i+5] || ' ' || ts[i+6] || ' ' || ts[i+7] AS span
        FROM toks, UNNEST(generate_series(1, len(ts) - 7)) AS u(i)
        WHERE len(ts) >= 8),
      marked AS (SELECT doc_id, i, i + 7 AS e,
          COUNT(*) OVER (PARTITION BY span) > 1 AS dup
        FROM sp),
      cov AS (SELECT doc_id, i, e, dup,
          MAX(CASE WHEN dup THEN e END) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        FROM marked),
      agg AS (SELECT doc_id, COUNT(*) AS n_spans,
          CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
          CAST(SUM(CASE WHEN dup THEN GREATEST(0, e - GREATEST(i - 1, COALESCE(pe, 0)))
                        ELSE 0 END) AS BIGINT) AS covered_tokens
        FROM cov GROUP BY doc_id),
      d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
            FROM documents)
    SELECT d.doc_id, d.n_toks,
      COALESCE(n_spans, 0) AS n_spans,
      COALESCE(n_dup_spans, 0) AS n_dup_spans,
      COALESCE(covered_tokens, 0) AS covered_tokens,
      ROUND(CAST(COALESCE(covered_tokens, 0) AS DOUBLE) / d.n_toks, 6)
        AS dup_token_ratio
    FROM d LEFT JOIN agg USING (doc_id)
    ORDER BY d.doc_id"""))

  /** BM25 top-k retrieval over an explicit query table (query_id, qtext)
    * — the ranked-search counterpart of [[invertedIndex]], with
    * k1 = 1.2 and b = 0.75.
    *
    * Determinism contract: the score is computed in EXACT integer
    * arithmetic so the DuckDB oracle reproduces it bit-for-bit. The
    * `ln` in the textbook idf is replaced by the scaled Lucene-idf
    * ratio `(100000 * (2N + 2)) DIV (2 df + 1)` (the q53 trick —
    * per-term monotone in df, so per-term ranking is preserved; the
    * doc score is the BIGINT sum of term scores, order-independent).
    * With k1 = 6/5, b = 3/4 and avgdl carried as milli-tokens
    * `A = (1000 T) DIV N`, the term score is exactly
    * `(idf_s * 22*A*tf) DIV (10*A*tf + 3*A + 9000*dl)`.
    *
    * Scale shape: term frequencies are one corpus-sized group-by; the
    * corpus then meets the QUERY VOCABULARY via a broadcast join, so
    * everything downstream — df, per-term scores, the top-k window — is
    * proportional to matching (query term × doc) pairs, never to the
    * corpus. The doc-length join is the one remaining corpus-keyed
    * exchange and AQE broadcasts the matched side when the query set is
    * small. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_toks"))
      .withColumn("a", expr("(1000L * t_toks) DIV n_docs"))
    val qterms = queries
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("tok"))
      .distinct()
    val vocab = qterms.select(col("tok")).distinct()
    val matched = tf.join(broadcast(vocab), Seq("tok"))
    // df per token over the full corpus: tf is already distinct per
    // (doc, tok), so a count per tok IS the document frequency
    val dfreq = matched.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = matched
      .join(dl, Seq("doc_id"))
      .join(broadcast(dfreq), Seq("tok"))
      .join(broadcast(qterms), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_s", expr("(100000L * (2L * n_docs + 2L)) DIV (2L * df + 1L)"))
      .withColumn("s", expr(
        "(idf_s * (22L * a * tf)) DIV (10L * a * tf + 3L * a + 9000L * dl)"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .withColumn("rn", row_number().over(wq).cast(LongType))
      .filter(col("rn") <= topK)
  }

  /** Oracle fixture of [[bm25TopK]]: four literal queries over the
    * fixture vocabulary, top 5 docs each. */
  /** The fixture's four text queries (shared with the q136 hybrid). */
  private[queries] val bm25FixtureQueries: Seq[(Int, String)] =
    Seq(1 -> "vector spark window", 2 -> "hash join",
      3 -> "customer order data row", 4 -> "stream batch merge")

  private val q111 = {
    val queryRows = bm25FixtureQueries
    val valuesSql = queryRows
      .map { case (id, txt) => s"($id, '$txt')" }.mkString(", ")
    GQuery(
      "q111_bm25_topk",
      (s, dir) => {
        import s.implicits._
        val q = queryRows.map { case (id, txt) => (id.toLong, txt) }
          .toDF("query_id", "qtext")
        bm25TopK(t(s, dir, "documents"), q)
          .orderBy(col("query_id"), col("rn"))
      },
      Some(s"""WITH q(query_id, qtext) AS (VALUES $valuesSql),
        $bm25RankedSql
      SELECT query_id, doc_id, score, rn FROM ranked
      WHERE rn <= 5
      ORDER BY query_id, rn"""))
  }

  /** DuckDB CTE chain from a `q(query_id, qtext)` CTE to
    * `ranked(query_id, doc_id, score, rn)` — [[bm25TopK]]'s oracle body,
    * shared with the hybrid-fusion fixture (q136). */
  private[queries] lazy val bm25RankedSql: String =
    """qt AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id,
                 unnest(string_split(qtext, ' ')) AS tok FROM q),
        vocab AS (SELECT DISTINCT tok FROM qt),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents) JOIN vocab USING (tok)
          GROUP BY doc_id, tok),
        dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
               FROM documents),
        st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_toks
               FROM dl),
        sta AS (SELECT n_docs, (1000 * t_toks) // n_docs AS a FROM st),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        sc AS (SELECT qt.query_id, tf.doc_id,
            ((100000 * (2 * n_docs + 2)) // (2 * df + 1))
              * (22 * a * tf.tf) // (10 * a * tf.tf + 3 * a + 9000 * dl.dl) AS s
          FROM tf JOIN dfreq USING (tok) JOIN qt USING (tok)
            JOIN dl USING (doc_id), sta),
        agg AS (SELECT query_id, doc_id, CAST(SUM(s) AS BIGINT) AS score
          FROM sc GROUP BY query_id, doc_id),
        ranked AS (SELECT query_id, doc_id, score,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS rn
          FROM agg)"""

  /** Cross-source VOCABULARY overlap — the lexical-diversity companion
    * to [[sourceOverlap]] (which catches verbatim doc mirrors): per
    * source-pair, shared distinct tokens and exact-ppm Jaccard. Near-1
    * Jaccard between two "different" sources means one is a re-crawl /
    * template clone of the other even when no document is byte-identical;
    * near-0 against the rest flags a source whose tokenizer or language
    * tag is off.
    *
    * Scale shape: one distinct over (source, token) — vocabulary-sized,
    * not corpus-sized — then a token self-join whose per-token fan-out is
    * bounded by |sources|² regardless of how hot the token is; never a
    * doc-level pair. Jaccard as `(10⁶·shared) DIV (va + vb − shared)` on
    * BIGINTs — exact, engine-portable. */
  def vocabOverlap(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("vocab"))
    st.as("a").join(st.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes).withColumnRenamed("source", "source_a")
        .withColumnRenamed("vocab", "vocab_a"), Seq("source_a"))
      .join(broadcast(sizes).withColumnRenamed("source", "source_b")
        .withColumnRenamed("vocab", "vocab_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("vocab_a"),
        col("vocab_b"), col("n_shared"),
        expr("(1000000L * n_shared) DIV (vocab_a + vocab_b - n_shared)")
          .as("jaccard_ppm"))
  }

  /** Oracle fixture of [[vocabOverlap]]. */
  private val q118 = GQuery(
    "q118_vocab_overlap",
    (s, dir) => vocabOverlap(t(s, dir, "documents"))
      .orderBy(col("source_a"), col("source_b")),
    Some("""WITH st AS (SELECT DISTINCT source, tok FROM (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents) WHERE len(tok) > 0),
      sizes AS (SELECT source, COUNT(*) AS vocab FROM st GROUP BY source),
      pairs AS (SELECT a.source AS source_a, b.source AS source_b,
          COUNT(*) AS n_shared
        FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        GROUP BY a.source, b.source)
      SELECT source_a, source_b,
        sa.vocab AS vocab_a, sb.vocab AS vocab_b, n_shared,
        (1000000 * n_shared) // (sa.vocab + sb.vocab - n_shared)
          AS jaccard_ppm
      FROM pairs
        JOIN sizes sa ON pairs.source_a = sa.source
        JOIN sizes sb ON pairs.source_b = sb.source
      ORDER BY source_a, source_b"""))

  /** Frequency-ranked vocabulary: the `vocabSize` most frequent tokens
    * as (tok, freq, tok_id) with tok_id 1-based by (freq desc, tok) —
    * id 0 is reserved for OOV by [[encodeTokens]]. The top-K is a
    * TakeOrdered (distributed partial top-K, no global sort); the final
    * rank is a window over only `vocabSize` rows. */
  def buildVocab(docs: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(vocabSize)
      .withColumn("tok_id", row_number()
        .over(Window.orderBy(col("freq").desc, col("tok"))).cast(LongType))
  }

  /** Tokenizer APPLY — the step between curation and the dataloader:
    * every token becomes its vocabulary id (OOV → 0), one flat
    * (doc_id, pos, tok_id) row per token with `pos` the token's original
    * 0-based position. Flat rows rather than arrays so the output is
    * splittable, engine-portable, and joins directly onto
    * [[CurationQ.packedChunkSpans]]' (doc, offset) map.
    *
    * Scale shape: the vocab is vocabSize rows — always broadcast; the
    * corpus explode is map-side; nothing shuffles. */
  def encodeTokens(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .join(broadcast(vocab.select(col("tok"), col("tok_id"))),
        Seq("tok"), "left")
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        coalesce(col("tok_id"), lit(0L)).as("tok_id"))

  /** Oracle fixture of [[buildVocab]] + [[encodeTokens]] (vocab 100). */
  private val q120 = GQuery(
    "q120_token_encode",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      encodeTokens(docs, buildVocab(docs, vocabSize = 100))
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""WITH tf AS (SELECT tok, COUNT(*) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE len(tok) > 0 GROUP BY tok),
      top AS (SELECT tok, tok_id FROM (
          SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok)
            AS BIGINT) AS tok_id
          FROM tf) WHERE tok_id <= 100),
      e AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ts[i] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          UNNEST(generate_series(1, len(ts))) AS u(i)
        WHERE len(ts[i]) > 0)
      SELECT doc_id, pos, COALESCE(tok_id, 0) AS tok_id
      FROM e LEFT JOIN top USING (tok)
      ORDER BY doc_id, pos"""))

  /** Cross-source token-rate drift — the top-k tokens whose usage rate
    * differs most between two sources (crawl snapshots, domains,
    * pipeline versions): per token, its count and rate (exact ppm of
    * the source's token total) on each side, ranked by |rate delta|.
    * This is the "what actually changed between crawl A and crawl B"
    * diagnostic run before trusting a re-crawl — template injections,
    * boilerplate swaps, and language drift all surface as a handful of
    * tokens with large deltas, where aggregate stats
    * ([[graft.queries.CurationQ.sourceCard]]) show nothing.
    *
    * Scale shape: one corpus explode feeding a single conditional-sum
    * aggregation on token (the only data-sized shuffle); the totals are
    * a re-aggregation of the vocabulary-sized count table (never a
    * second corpus scan) joined back as a broadcast scalar row; the
    * top-k is a TakeOrdered — distributed partial top-k, no global
    * sort. Rates in integer ppm keep every value engine-exact; the
    * (|delta| desc, token) order is total, so the k-boundary is
    * deterministic. */
  def distinctiveTokens(docs: DataFrame, sourceA: String, sourceB: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(sourceA != sourceB, "sourceA and sourceB must differ")
    val counts = docs.filter(col("source").isin(sourceA, sourceB))
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(
        sum(when(col("source") === sourceA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("source") === sourceB, 1L).otherwise(0L)).as("n_b"))
    // loud guard (the ksDrift pattern): a misspelled/empty source zeroes
    // its total and the ppm rates become an opaque ANSI div/0 otherwise
    val totals = counts.agg(
        sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
      .select(
        expr(s"CASE WHEN tot_a IS NULL OR tot_a = 0 THEN raise_error(" +
          s"'graft.distinctiveTokens: source \\'$sourceA\\' has no tokens " +
          s"— check the source name') ELSE tot_a END").as("tot_a"),
        expr(s"CASE WHEN tot_b IS NULL OR tot_b = 0 THEN raise_error(" +
          s"'graft.distinctiveTokens: source \\'$sourceB\\' has no tokens " +
          s"— check the source name') ELSE tot_b END").as("tot_b"))
    counts.crossJoin(broadcast(totals))
      .withColumn("rate_a_ppm", expr("(1000000 * n_a) DIV tot_a"))
      .withColumn("rate_b_ppm", expr("(1000000 * n_b) DIV tot_b"))
      .withColumn("delta_ppm", col("rate_a_ppm") - col("rate_b_ppm"))
      .orderBy(abs(col("delta_ppm")).desc, col("tok"))
      .limit(k)
      .select(col("tok"), col("n_a"), col("n_b"),
        col("rate_a_ppm"), col("rate_b_ppm"), col("delta_ppm"))
  }

  /** Oracle fixture of [[distinctiveTokens]] (src0 vs src1, top 40). */
  private val q126 = GQuery(
    "q126_distinctive_tokens",
    (s, dir) => distinctiveTokens(t(s, dir, "documents"), "src0", "src1",
        k = 40)
      .orderBy(abs(col("delta_ppm")).desc, col("tok")),
    Some("""WITH tk AS (SELECT source, tok FROM (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE source IN ('src0', 'src1'))
        WHERE len(tok) > 0),
      c AS (SELECT tok,
          CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_a,
          CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_b
        FROM tk GROUP BY tok),
      t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
                   CAST(SUM(n_b) AS BIGINT) AS tot_b FROM c),
      d AS (SELECT tok, n_a, n_b,
          (1000000 * n_a) // tot_a AS rate_a_ppm,
          (1000000 * n_b) // tot_b AS rate_b_ppm
        FROM c, t)
      SELECT tok, n_a, n_b, rate_a_ppm, rate_b_ppm,
        rate_a_ppm - rate_b_ppm AS delta_ppm
      FROM d
      ORDER BY abs(rate_a_ppm - rate_b_ppm) DESC, tok
      LIMIT 40"""))

  /** MinHash-estimate vs exact-Jaccard agreement — the dedup analog of
    * q58's ANN recall gate: for every LSH candidate pair, the signature
    * estimate (agreeing lanes / 8, exact ppm) next to the TRUE
    * shingle-set Jaccard and their absolute error. Run this before
    * trusting a lane/band configuration: a fat error tail means the
    * 8-lane signature is too coarse for the corpus's similarity range
    * and the q26 threshold is silently mis-calibrated (both false
    * merges above it and misses below it).
    *
    * Scale shape: the exact side is computed for CANDIDATE pairs only
    * (q77's confirm pattern — never all-pairs): candidates join the
    * per-doc distinct-shingle table twice, so the cost is
    * candidates × shingles-per-doc; sizes and intersections are exact
    * integer counts and the ppm arithmetic is engine-portable. */
  def minhashAgreement(docs: DataFrame, maxBandSize: Int = 1000): DataFrame =
    minhashAgreementFrom(docs,
      lshCandidates(minhashBands(docs), maxBandSize)
        .filter(col("est_jaccard") >= 0.25))

  /** [[minhashAgreement]] over a PRE-BUILT candidate pair set (with its
    * `est_jaccard` column) — the
    * [[graft.pipelines.DedupGraphPipeline]] entry point. */
  def minhashAgreementFrom(docs: DataFrame, candidates: DataFrame)
      : DataFrame = {
    // round-15 note: lazy-checkpointing `cand` and `dsh` here was tried
    // and MEASURED SLOWER at sf0.1 (1.51 s → 2.43 s): the checkpointed
    // sides lose statistics, flipping the sizes/inter joins from
    // broadcast to sort-merge, which costs more than the deduped
    // recompute saves. Left as-is; the shared subtrees are served by
    // exchange reuse where plans are identical.
    val cand = candidates
      .withColumn("est_ppm",
        (col("est_jaccard") * 8).cast(LongType) * 125000L)
    val dsh = docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("sh"))
      .distinct()
    val sizes = dsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand.select(col("doc_a"), col("doc_b"))
      .join(dsh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(dsh.select(col("doc_id").as("doc_b"), col("sh")),
        Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    cand.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
        Seq("doc_b"))
      .withColumn("exact_ppm",
        expr("(1000000 * n_inter) DIV (n_a + n_b - n_inter)"))
      .select(col("doc_a"), col("doc_b"), col("est_ppm"), col("exact_ppm"),
        abs(col("est_ppm") - col("exact_ppm")).as("err_ppm"))
  }

  /** LSH-threshold calibration card — where to SET the q26 threshold:
    * for each signature-agreement level (8 lanes ⇒ est levels k/8), the
    * candidate count and the fraction CONFIRMED by banded edit distance
    * (the [[editConfirmedPairs]] ground truth, maxDist budget). The
    * confirm-rate curve is the empirical precision of the signature at
    * each level — a level whose confirm ppm is noise-floor says the
    * threshold sits below the corpus's true-dup similarity and the
    * candidate budget is being spent on false positives; a real
    * calibration reads this BEFORE trusting any est_jaccard cut
    * ([[minhashAgreement]] grades pairs; this grades LEVELS).
    *
    * Scale shape: candidates computed once, the edit confirm only ever
    * touches candidate rows (the q77 bound), then one ≤9-row
    * aggregation on the agreement level. */
  def lshCalibration(docs: DataFrame, maxDist: Int = 64,
      maxBandSize: Int = 1000): DataFrame = {
    // round-15: `cand` feeds the edit confirm AND the level assembly —
    // one LSH pipeline run (lazy checkpoint), not two.
    val cand = lshCandidates(minhashBands(docs), maxBandSize)
      .filter(col("est_jaccard") >= 0.25)
      .withColumn("est_ppm",
        (col("est_jaccard") * 8).cast(LongType) * 125000L)
      .localCheckpoint(false)
    val confirmed = editConfirmedFrom(docs, cand, maxDist)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("ok"))
    cand.join(confirmed, Seq("doc_a", "doc_b"), "left")
      .groupBy(col("est_ppm"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce(col("ok"), lit(0L))).as("n_confirmed"))
      .withColumn("confirm_ppm",
        expr("(1000000 * n_confirmed) DIV n_candidates"))
  }

  /** Oracle fixture of [[lshCalibration]] (maxDist 64). */
  private val q237 = GQuery(
    "q237_lsh_calibration",
    (s, dir) => lshCalibration(t(s, dir, "documents"))
      .orderBy(col("est_ppm")),
    Some(s"""$minhashCandSql,
      lev AS (SELECT doc_a, doc_b,
          CAST(CAST(est_jaccard * 8 AS BIGINT) * 125000 AS BIGINT)
            AS est_ppm,
          levenshtein(a.text, b.text) AS lv
        FROM cand
        JOIN documents a ON doc_a = a.doc_id
        JOIN documents b ON doc_b = b.doc_id)
      SELECT est_ppm, COUNT(*) AS n_candidates,
        CAST(SUM(CASE WHEN lv <= 64 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_confirmed,
        (1000000 * CAST(SUM(CASE WHEN lv <= 64 THEN 1 ELSE 0 END)
          AS BIGINT)) // COUNT(*) AS confirm_ppm
      FROM lev
      GROUP BY est_ppm
      ORDER BY est_ppm"""))

  /** Oracle fixture of [[minhashAgreement]] (the q26 candidate set). */
  private val q128 = GQuery(
    "q128_minhash_agreement",
    (s, dir) => minhashAgreement(t(s, dir, "documents"))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""$minhashCandSql,
      dsh AS (SELECT DISTINCT doc_id, sh FROM shingles),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
      inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM cand c
        JOIN dsh a ON a.doc_id = c.doc_a
        JOIN dsh b ON b.doc_id = c.doc_b AND b.sh = a.sh
        GROUP BY c.doc_a, c.doc_b),
      agg AS (SELECT c.doc_a, c.doc_b,
          CAST(CAST(c.est_jaccard * 8 AS BIGINT) * 125000 AS BIGINT)
            AS est_ppm,
          (1000000 * COALESCE(n_inter, 0))
            // (sa.n_sh + sb.n_sh - COALESCE(n_inter, 0)) AS exact_ppm
        FROM cand c
        LEFT JOIN inter ON inter.doc_a = c.doc_a AND inter.doc_b = c.doc_b
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b)
      SELECT doc_a, doc_b, est_ppm, exact_ppm,
        abs(est_ppm - exact_ppm) AS err_ppm
      FROM agg
      ORDER BY doc_a, doc_b"""))

  /** Within-document repetition signals — the Gopher-style quality
    * heuristic that catches degenerate generations, boilerplate loops,
    * and scraped templating that CROSS-doc dedup never sees (the doc is
    * unique; its content repeats itself). Per doc: total word bigrams,
    * the fraction that are duplicates of an earlier bigram, and the mass
    * of the single most frequent bigram — both in exact ppm, so the
    * downstream filter threshold means the same thing in every engine.
    *
    * Scale shape: one explode and two hash aggregations, the first on
    * (doc_id, bigram) and the second on doc_id — strictly linear in
    * corpus tokens, no joins, no windows over the token table. At
    * 100 TB this is the same shape as q33's token count. */
  def docRepetition(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(shingleExprN(2))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bi"), count(lit(1)).as("n_dist"),
        max(col("c")).as("top_c"))
      .select(col("doc_id"), col("n_bi"),
        expr("((n_bi - n_dist) * 1000000) DIV n_bi").as("dup_ppm"),
        expr("(top_c * 1000000) DIV n_bi").as("top_ppm"))

  /** Oracle fixture of [[docRepetition]]. */
  private val q129 = GQuery(
    "q129_doc_repetition",
    (s, dir) => docRepetition(t(s, dir, "documents")).orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents WHERE len(string_split(text, ' ')) >= 2),
      bigrams AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg
                  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
      bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bigrams
             GROUP BY doc_id, bg),
      agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bi,
                COUNT(*) AS n_dist, MAX(c) AS top_c
              FROM bc GROUP BY doc_id)
      SELECT doc_id, n_bi,
        ((n_bi - n_dist) * 1000000) // n_bi AS dup_ppm,
        (top_c * 1000000) // n_bi AS top_ppm
      FROM agg
      ORDER BY doc_id"""))

  /** Split-leakage audit — the gate that CATCHES a bad train/val/test
    * split: for each assignment policy, the number of near-dup candidate
    * pairs whose two docs landed in different splits (eval answers
    * leaking into train through a near-duplicate). Run it before
    * training: [[hashSplit]] ('hash_split') shows the leak a per-doc
    * hash split necessarily has, and [[leakageSafeSplit]]'s
    * cluster-atomic assignment ('leakage_safe') must read EXACTLY zero —
    * this query is the proof obligation q81 discharges, in the q58/q125/
    * q128 gate family.
    *
    * Scale shape: the q26 candidate pipeline runs ONCE (both policies
    * audit the same pair set and the cluster labels reuse the same
    * candidates), then two broadcast-sized joins of the assignment onto
    * the candidate pairs and a 2-row aggregate. */
  def splitLeakageAudit(docs: DataFrame, minEstJaccard: Double = 0.25,
      maxBandSize: Int = 1000): DataFrame = {
    // round-15: the candidate set feeds THREE consumers (components +
    // both policy audits) — materialize the LSH pipeline once (the
    // DedupGraphPipeline discipline); without the cut each audit re-ran
    // the whole shingle→signature→self-join chain.
    val cand = lshCandidates(minhashBands(docs), maxBandSize)
      .filter(col("est_jaccard") >= minEstJaccard)
      .localCheckpoint()
    splitLeakageAuditFrom(docs, cand, connectedComponents(cand))
  }

  /** [[splitLeakageAudit]] over PRE-BUILT candidates + components — the
    * [[graft.pipelines.DedupGraphPipeline]] entry point. */
  def splitLeakageAuditFrom(docs: DataFrame, cand: DataFrame,
      comp: DataFrame): DataFrame = {
    val b = hashBucketExpr("instr", "cluster", "STRING")
    val safe = docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("split",
        expr(s"""CASE WHEN $b < 90 THEN 'train'
                 WHEN $b < 95 THEN 'val'
                 ELSE 'test' END"""))
      .select(col("doc_id"), col("split"))
    val naive = hashSplit(docs).select(col("doc_id"), col("split"))
    def audit(policy: String, assign: DataFrame): DataFrame =
      cand.select(col("doc_a"), col("doc_b"))
        .join(assign.select(col("doc_id").as("doc_a"),
          col("split").as("sa")), Seq("doc_a"))
        .join(assign.select(col("doc_id").as("doc_b"),
          col("split").as("sb")), Seq("doc_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_cross"))
        .select(lit(policy).as("policy"), col("n_pairs"), col("n_cross"),
          expr("""CASE WHEN n_pairs = 0 THEN 0L
                  ELSE (n_cross * 1000000) DIV n_pairs END""").as("leak_ppm"))
    audit("hash_split", naive).unionByName(audit("leakage_safe", safe))
  }

  /** Oracle fixture of [[splitLeakageAudit]]. */
  private val q134 = GQuery(
    "q134_split_leakage",
    (s, dir) => splitLeakageAudit(t(s, dir, "documents"))
      .orderBy(col("policy")),
    Some(s"""${minhashCandSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
      reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
               FROM reach GROUP BY u),
      asg AS (SELECT d.doc_id,
          CASE WHEN ${hashBucketExpr("strpos", "d.doc_id", "VARCHAR")} < 90
                 THEN 'train'
               WHEN ${hashBucketExpr("strpos", "d.doc_id", "VARCHAR")} < 95
                 THEN 'val'
               ELSE 'test' END AS naive_split,
          CASE WHEN ${hashBucketExpr("strpos",
            "COALESCE(c.component, d.doc_id)", "VARCHAR")} < 90 THEN 'train'
               WHEN ${hashBucketExpr("strpos",
            "COALESCE(c.component, d.doc_id)", "VARCHAR")} < 95 THEN 'val'
               ELSE 'test' END AS safe_split
        FROM documents d LEFT JOIN comp c USING (doc_id)),
      p AS (SELECT a.naive_split AS na, b.naive_split AS nb,
          a.safe_split AS fa, b.safe_split AS fb
        FROM cand c
        JOIN asg a ON a.doc_id = c.doc_a
        JOIN asg b ON b.doc_id = c.doc_b),
      u AS (
        SELECT 'hash_split' AS policy, COUNT(*) AS n_pairs,
          CAST(SUM(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cross
        FROM p
        UNION ALL
        SELECT 'leakage_safe', COUNT(*),
          CAST(SUM(CASE WHEN fa <> fb THEN 1 ELSE 0 END) AS BIGINT)
        FROM p)
      SELECT policy, n_pairs, n_cross,
        CASE WHEN n_pairs = 0 THEN 0
             ELSE (n_cross * 1000000) // n_pairs END AS leak_ppm
      FROM u
      ORDER BY policy"""))

  /** Ingest NOVELTY CURVE — per arrival batch, how much of the batch is
    * new content vs an exact duplicate of anything earlier: the
    * "is the crawl saturating?" monitor that decides when further
    * ingestion stops paying. A doc is novel iff it is the FIRST
    * occurrence of its content hash in arrival order (min doc_id per
    * sha256 — doc_id is the fixture's arrival proxy; production passes
    * its real ingest sequence). Batch = doc_id DIV batchSize. One hash
    * shuffle (the per-hash window), a batch-sized aggregation, and a
    * batch-count-sized cumulative window; novelty as exact ppm. */
  def noveltyCurve(docs: DataFrame, batchSize: Long): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val wh = Window.partitionBy(sha2(col("text"), 256))
    val wb = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("batch", expr(s"doc_id DIV ${batchSize}L"))
      .withColumn("novel",
        (col("doc_id") === min(col("doc_id")).over(wh)).cast(LongType))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_docs"), sum(col("novel")).as("n_novel"))
      .withColumn("novelty_ppm", expr("(1000000 * n_novel) DIV n_docs"))
      .withColumn("cum_unique", sum(col("n_novel")).over(wb))
  }

  /** Oracle fixture of [[noveltyCurve]] (batches of 100 doc_ids). */
  private val q146 = GQuery(
    "q146_novelty_curve",
    (s, dir) => noveltyCurve(t(s, dir, "documents"), batchSize = 100L)
      .orderBy(col("batch")),
    Some("""WITH d AS (SELECT doc_id, doc_id // 100 AS batch,
          CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))
               THEN 1 ELSE 0 END AS novel
        FROM documents),
      b AS (SELECT batch, COUNT(*) AS n_docs,
              CAST(SUM(novel) AS BIGINT) AS n_novel
            FROM d GROUP BY batch)
      SELECT batch, n_docs, n_novel,
        (1000000 * n_novel) // n_docs AS novelty_ppm,
        CAST(SUM(n_novel) OVER (ORDER BY batch
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_unique
      FROM b
      ORDER BY batch"""))

  /** Self-retrieval evaluation of the lexical stack — every sampled
    * document's leading tokens become a query whose one relevant answer
    * is the document itself; [[bm25TopK]] then either re-finds the
    * origin or it doesn't. Reported as exact-integer hit@1 / hit@k and
    * MRR ppm (reciprocal ranks are `10⁶ DIV rn` — integer-exact, the
    * q136 RRF quantization). This is the standard index-quality
    * smoke-eval needing no human labels; on an UNDEDUPLICATED corpus an
    * exact mirror with a smaller doc_id legitimately outranks the origin
    * under the deterministic (score, doc_id) tiebreak — run it after
    * dedup, or read hit@k rather than hit@1, exactly as in production.
    *
    * Scale shape: inherits [[bm25TopK]]'s (query-vocabulary-bounded
    * corpus join, per-query top-k); the eval adds one |queries|-sized
    * left join and a scalar aggregation. */
  def selfRetrievalEval(docs: DataFrame, sampleMod: Long = 25L,
      snippetToks: Int = 8, topK: Int = 5): DataFrame = {
    require(sampleMod >= 1 && snippetToks >= 1,
      s"sampleMod/snippetToks must be >= 1, got $sampleMod/$snippetToks")
    val q = docs.filter(col("doc_id") % sampleMod === 0L)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(col("text"), " "), 1, snippetToks), " ")
          .as("qtext"))
    val origin = bm25TopK(docs, q, topK)
      .filter(col("doc_id") === col("query_id"))
      .select(col("query_id"), col("rn"))
    q.select(col("query_id")).join(origin, Seq("query_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("rn") === 1L, 1L).otherwise(0L)).as("hit_at_1"),
        sum(when(col("rn").isNotNull, 1L).otherwise(0L)).as("hit_at_k"),
        sum(coalesce(expr("1000000 DIV rn"), lit(0L))).as("rr_sum"))
      // loud zero-query guard: sampleMod too thin for the corpus would
      // otherwise surface as an opaque null DIV 0
      .withColumn("mrr_ppm", expr(
        s"CASE WHEN n_queries = 0 THEN raise_error('graft.selfRetrievalEval:" +
          s" sampleMod = $sampleMod sampled no query docs — lower it') " +
          "ELSE rr_sum DIV n_queries END"))
  }

  /** Oracle fixture of [[selfRetrievalEval]] (every 125th doc, 8-token
    * snippets, k = 5). The thin 1/125 sample is deliberate: the fixture
    * corpus has a 31-token vocabulary, so EVERY query matches EVERY doc
    * and scoring cost is |queries|·|corpus| — the degenerate worst case a
    * real vocabulary's per-token query fan-out never approaches. The
    * planted-vocabulary spec covers the semantics densely. */
  private val q149 = GQuery(
    "q149_self_retrieval",
    (s, dir) => selfRetrievalEval(t(s, dir, "documents"), sampleMod = 125L)
      .orderBy(col("n_queries")),
    Some(s"""WITH q(query_id, qtext) AS (
        SELECT doc_id,
          array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
        FROM documents WHERE doc_id % 125 = 0),
      $bm25RankedSql,
      origin AS (SELECT query_id, rn FROM ranked
                 WHERE doc_id = query_id AND rn <= 5)
      SELECT COUNT(*) AS n_queries,
        CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hit_at_1,
        CAST(SUM(CASE WHEN rn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hit_at_k,
        CAST(SUM(COALESCE(1000000 // rn, 0)) AS BIGINT) AS rr_sum,
        CAST(SUM(COALESCE(1000000 // rn, 0)) // COUNT(*) AS BIGINT) AS mrr_ppm
      FROM q LEFT JOIN origin USING (query_id)"""))

  /** Zipf rank–frequency slope card — the one-row corpus-health check
    * that natural text obeys Zipf's law (log-frequency falls ~linearly
    * in log-rank, slope near −1): template spam flattens the curve,
    * tokenizer bugs and boilerplate floods steepen or kink it, so a
    * drifting slope between ingestion batches flags a corpus problem
    * before any downstream model sees it.
    *
    * Exactness discipline: both axes are STAIRCASE logs — x =
    * ⌊log₂ rank⌋, y = ⌊log₂ freq⌋ via binary-string length, exact
    * integers in both engines (the q168 staircase rule: never cross-
    * engine ln/exp) — and the least-squares slope comes from exact
    * sufficient statistics in DECIMAL(38,0)/HUGEINT with the sign
    * carried separately so truncating DIV and flooring // agree (the
    * q166 rule).
    *
    * Scale shape — no global sort: a token's ⌊log₂ rank⌋ only needs its
    * freq-GROUP's rank range [c0+1, c0+n] (ties share a y, and the
    * x-sums depend on the range as a set, not on any tie order), so the
    * corpus-sized work is one (tok) hash agg + one (freq) hash agg, and
    * the rank cumsum runs on the distinct-FREQUENCY table (≤ a few
    * thousand rows at any corpus size — the q165/q170 histogram bound).
    * Σ⌊log₂ r⌋ and Σ⌊log₂ r⌋² over a rank range come from closed forms
    * (S(m) = (m+1)B − 2^{B+1} + 2 and its square analogue, B = ⌊log₂ m⌋),
    * verified against the naive per-rank oracle by the q179 hash-match.
    * A single-type corpus has no rank spread (den = 0) and fails loudly. */
  def zipfCard(docs: DataFrame): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val hist = tf.groupBy(col("freq")).agg(count(lit(1)).as("n_toks"))
    // closed forms over BIGINT; m ranges over rank bounds (≥ 0)
    def bS(m: String) =
      s"""(CASE WHEN $m < 1 THEN CAST(0 AS BIGINT)
        ELSE ($m + 1) * (length(bin($m)) - 1)
          - shiftleft(CAST(1 AS BIGINT), length(bin($m))) + 2 END)"""
    def bT(m: String) =
      s"""(CASE WHEN $m < 1 THEN CAST(0 AS BIGINT)
        ELSE shiftleft(CAST(1 AS BIGINT), length(bin($m)) - 1)
            * ((length(bin($m)) - 1) * (length(bin($m)) - 1)
              - 4 * (length(bin($m)) - 1) + 6) - 6
          + (length(bin($m)) - 1) * (length(bin($m)) - 1)
            * ($m - shiftleft(CAST(1 AS BIGINT), length(bin($m)) - 1) + 1)
        END)"""
    // rank-range prefix via the bucket-offset construction: at corpus
    // scale the distinct-FREQUENCY table is usually small, but nothing
    // bounds it for heavy-tailed token counts — never a global
    // single-partition window here (c0 = exclusive rank prefix over
    // freq desc, c1 = inclusive)
    // width 4096, not the 2^20 default: frequencies are DENSE small
    // integers (most distinct values sit under 2^20, i.e. in ONE
    // default-width bucket), and an explicit width caps every in-bucket
    // window at <= 4096 distinct values regardless of the domain
    val groups = PrefixSum.exclusive(hist, "freq", Seq("n_toks"),
        bucketWidth = 4096L, descending = true)
      .withColumn("c0", col("n_toks_cum"))
      .withColumn("c1", col("c0") + col("n_toks"))
      .withColumn("y", expr("length(bin(freq)) - 1"))
      .select(
        col("n_toks"), (col("n_toks") * col("freq")).as("occ"),
        (col("n_toks") * col("y")).as("gy"),
        expr(s"${bS("c1")} - ${bS("c0")}").as("gx"),
        (col("y") * expr(s"${bS("c1")} - ${bS("c0")}")).as("gxy"),
        expr(s"${bT("c1")} - ${bT("c0")}").as("gx2"))
    groups.agg(
        sum(col("n_toks")).cast(DecimalType(38, 0)).as("n"),
        sum(col("occ")).as("occ"),
        sum(col("gx")).cast(DecimalType(38, 0)).as("sx"),
        sum(col("gy")).cast(DecimalType(38, 0)).as("sy"),
        sum(col("gxy")).cast(DecimalType(38, 0)).as("sxy"),
        sum(col("gx2")).cast(DecimalType(38, 0)).as("sx2"))
      .select(
        col("n").cast(LongType).as("n_types"),
        col("occ").cast(LongType).as("n_occurrences"),
        expr("""CASE
          WHEN n * sx2 - sx * sx = 0 THEN raise_error(
            'graft.zipfCard: degenerate corpus (single distinct rank bucket)')
          WHEN n * sxy - sx * sy < 0 THEN
            -CAST((1000000 * -(n * sxy - sx * sy)) DIV (n * sx2 - sx * sx)
              AS BIGINT)
          ELSE
            CAST((1000000 * (n * sxy - sx * sy)) DIV (n * sx2 - sx * sx)
              AS BIGINT)
          END""").as("slope_ppm"))
  }

  /** Oracle fixture of [[zipfCard]]: the naive construction — a global
    * ROW_NUMBER rank per token and per-token staircase logs — whose
    * hash-match proves the closed-form group decomposition exact. */
  private val q179 = GQuery(
    "q179_zipf_card",
    (s, dir) => zipfCard(t(s, dir, "documents")),
    Some("""WITH tf AS (SELECT tok, COUNT(*) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE length(tok) > 0 GROUP BY tok),
      r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC) AS rank
            FROM tf),
      pts AS (SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS x,
          CAST(length(bin(freq)) - 1 AS BIGINT) AS y, freq FROM r),
      s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
          CAST(SUM(freq) AS BIGINT) AS occ,
          CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
          CAST(SUM(x * y) AS HUGEINT) AS sxy,
          CAST(SUM(x * x) AS HUGEINT) AS sx2
        FROM pts)
      SELECT CAST(n AS BIGINT) AS n_types, occ AS n_occurrences,
        CASE WHEN n * sxy - sx * sy < 0 THEN
            -CAST((1000000 * -(n * sxy - sx * sy)) // (n * sx2 - sx * sx)
              AS BIGINT)
          ELSE
            CAST((1000000 * (n * sxy - sx * sy)) // (n * sx2 - sx * sx)
              AS BIGINT)
          END AS slope_ppm
      FROM s"""))

  /** Multi-modality contamination report — the capstone over the
    * decontamination family: one row per train doc flagged by ANY
    * text modality, with a bitmask of WHICH modalities fired
    * (1 = exact `width`-gram overlap, [[decontaminationHits]];
    * 2 = MinHash fuzzy near-dup, [[fuzzyDecontamination]];
    * 4 = shared winnowing fingerprints, [[winnowFingerprints]] — the
    * MOSS guarantee catches long shared substrings that survive a
    * paraphrase's n-gram dilution) and the per-modality hit counts.
    * Modality DISAGREEMENT is the report's point: mask 2-only rows are
    * paraphrases lexical checks miss, 1-only rows are short-phrase
    * collisions fuzzy matching correctly ignores, and an empty report
    * on a leaked benchmark means the thresholds are wrong. The
    * embedding modality (q174) rides the separate vector table and
    * anti-joins downstream. Eval sets are small by construction, so
    * each modality's eval side broadcasts; the three verdict tables are
    * doc-keyed and FULL-OUTER-join into the mask — all shuffles on
    * doc_id. */
  def contaminationReport(train: DataFrame, eval: DataFrame,
      width: Int = 5, minEstJaccard: Double = 0.5,
      window: Int = 8): DataFrame = {
    // round-15: the fuzzy and winnow modalities hash the IDENTICAL
    // 3-token shingles (winnow's fingerprint hash IS MinHash's first
    // digest) — one lazily-checkpointed shingle+md5 pass per side feeds
    // both, instead of each modality re-tokenizing and re-digesting the
    // corpus (guide §2.3: don't compute things twice).
    val trSh3 = shingleHashes3(train).localCheckpoint(false)
    val evSh3 = shingleHashes3(eval).localCheckpoint(false)
    val exact = decontaminationHits(train, eval, width)
      .select(col("doc_id"), col("n_hits").as("n_exact"))
    val fuzzy = fuzzyDecontaminationBands(
        minhashBandsFrom(trSh3), minhashBandsFrom(evSh3),
        minEstJaccard, maxBandSize = 1000)
      .select(col("train_doc").as("doc_id"),
        col("n_eval_hits").as("n_fuzzy"))
    val evFp = winnowFingerprintsFrom(evSh3, window)
      .select(col("h")).distinct()
    val winnow = winnowFingerprintsFrom(trSh3, window)
      .join(evFp, "h")
      .groupBy(col("doc_id")).agg(countDistinct(col("h")).as("n_fp"))
    exact.join(fuzzy, Seq("doc_id"), "full_outer")
      .join(winnow, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (when(col("n_exact").isNotNull, 1L).otherwise(0L)
          + when(col("n_fuzzy").isNotNull, 2L).otherwise(0L)
          + when(col("n_fp").isNotNull, 4L).otherwise(0L))
          .as("modality_mask"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_fuzzy"), lit(0L)).as("n_fuzzy"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"))
  }

  /** Oracle fixture of [[contaminationReport]]: eval = doc_id % 11 = 5
    * (a fresh modulus so all three modalities see the SAME split). */
  private val q194 = {
    val idx5 = (0 until 5).map(k => s"ts[i + $k]").mkString(" || ' ' || ")
    val estSql = (0 until 8).map(i => s"CASE WHEN x.h$i = y.h$i THEN 1 ELSE 0 END")
      .mkString("(", " + ", ") / 8.0")
    GQuery(
      "q194_contamination_report",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        contaminationReport(
            docs.filter(col("doc_id") % 11 =!= 5),
            docs.filter(col("doc_id") % 11 === 5))
          .orderBy(col("doc_id"))
      },
      Some(s"""${winnowSql(8)},
        e_toks AS (SELECT doc_id, string_split(text, ' ') AS ts
            FROM documents WHERE len(string_split(text, ' ')) >= 5),
        e_sh AS (SELECT DISTINCT doc_id, $idx5 AS s
            FROM e_toks, UNNEST(generate_series(1, len(ts) - 4)) AS u(i)),
        e_ev AS (SELECT DISTINCT s FROM e_sh WHERE doc_id % 11 = 5),
        exact AS (SELECT e_sh.doc_id, COUNT(DISTINCT e_sh.s) AS n_exact
            FROM e_sh JOIN e_ev USING (s)
            WHERE e_sh.doc_id % 11 <> 5 GROUP BY e_sh.doc_id),
        ${sigSqlFor("tr", "doc_id % 11 <> 5")},
        ${sigSqlFor("ev", "doc_id % 11 = 5")},
        ev_capped AS (SELECT * FROM ev_bands
          QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= 1000),
        fpairs AS (SELECT DISTINCT x.doc_id AS doc_id,
              y.doc_id AS eval_doc, $estSql AS est_jaccard
            FROM tr_bands x JOIN ev_capped y
              ON x.band = y.band AND x.bkey = y.bkey),
        fuzzy AS (SELECT doc_id, COUNT(*) AS n_fuzzy
            FROM fpairs WHERE est_jaccard >= 0.5 GROUP BY doc_id),
        w_ev AS (SELECT DISTINCT h FROM fp WHERE doc_id % 11 = 5),
        winnow AS (SELECT fp.doc_id, COUNT(DISTINCT fp.h) AS n_fp
            FROM fp JOIN w_ev USING (h)
            WHERE fp.doc_id % 11 <> 5 GROUP BY fp.doc_id),
        ids AS (SELECT doc_id FROM exact
          UNION SELECT doc_id FROM fuzzy
          UNION SELECT doc_id FROM winnow)
      SELECT i.doc_id,
        CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN f.doc_id IS NOT NULL THEN 2 ELSE 0 END
           + CASE WHEN w.doc_id IS NOT NULL THEN 4 ELSE 0 END AS BIGINT)
          AS modality_mask,
        CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact,
        CAST(COALESCE(f.n_fuzzy, 0) AS BIGINT) AS n_fuzzy,
        CAST(COALESCE(w.n_fp, 0) AS BIGINT) AS n_fp
      FROM ids i
      LEFT JOIN exact e USING (doc_id)
      LEFT JOIN fuzzy f USING (doc_id)
      LEFT JOIN winnow w USING (doc_id)
      ORDER BY i.doc_id"""))
  }

  /** Cross-source code-table drift — the compression-transfer matrix:
    * for every ordered source pair (a, b), the milli-bits-per-token cost
    * of encoding A's tokens with B's staircase-bit code table
    * (cost_b(t) = ⌊log₂ total_b⌋ − ⌊log₂ cnt_b(t)⌋ via binary-string
    * length — the [[TokenizerQ]] unigram cost, exact in both engines;
    * tokens unseen in B pay the escape cost ⌊log₂ total_b⌋ + 1, one bit
    * above a singleton). The diagonal is each source's own compression
    * baseline; `excess = xfer(a,b) − xfer(a,a)` is a cross-entropy-style
    * distribution distance that, unlike KS (q148, one scalar metric) or
    * χ² (q184, categorical association), measures WHOLE-VOCABULARY
    * drift and directly answers the curation question "can these two
    * sources share one tokenizer/mixture bucket".
    *
    * Scale shape: ONE corpus scan (the per-(source, token) count —
    * map-side combined); everything after is vocabulary-sized: the cost
    * table is counts × a broadcast per-source total, the transfer join
    * fans each a-token row out to |sources| rows (sources are dozens,
    * the row count stays vocab·|sources|), and the matrix aggregation
    * is |sources|² rows. No data²-sized step anywhere. */
  def codeTableDrift(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = toks.groupBy(col("source"))
      .agg(sum(col("cnt")).as("total"))
      .select(col("source").as("src_b"),
        col("total"),
        expr("CAST(length(bin(total)) AS BIGINT)").as("tot_bits"))
    val costs = toks.select(col("source").as("src_b"), col("tok"),
        col("cnt").as("cnt_b"))
      .join(tot.select(col("src_b"), col("tot_bits")), Seq("src_b"))
      .select(col("src_b"), col("tok"),
        (col("tot_bits") - expr("CAST(length(bin(cnt_b)) AS BIGINT)"))
          .as("cost_bits"))
    toks.select(col("source").as("src_a"), col("tok"), col("cnt"))
      .crossJoin(broadcast(tot.select(col("src_b"), col("tot_bits"))))
      .join(costs, Seq("src_b", "tok"), "left")
      .withColumn("cost",
        coalesce(col("cost_bits"), col("tot_bits") + 1))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("cost")).as("total_bits"))
      .select(col("src_a"), col("src_b"), col("n_tokens"),
        col("total_bits"),
        expr("(1000 * total_bits) DIV n_tokens").as("mbpt"))
  }

  /** Per-document surprise under the CORPUS code table — the document-
    * level projection of [[codeTableDrift]]: each doc's mean token cost
    * in staircase bits against the whole-corpus unigram frequencies.
    * Low surprise = the doc is made of the corpus's most common tokens
    * (boilerplate, templates); high surprise = rare-token soup (OCR
    * noise, wrong language, binary spill). The unigram complement of
    * [[graft.queries.CurationQ.lmTransitionScore]]'s bigram score — a
    * doc of common tokens in impossible ORDER scores low here and low
    * there is the cross-check. All exact integers.
    *
    * Plan: ONE token explode feeding a (doc, token) tf compression
    * (materialized once — it has two consumers), from which both the
    * vocabulary counts (Σ tf per token) and the per-doc costs
    * (Σ tf·cost) derive. The cost join keys the tf table, not raw token
    * instances: instances hash-partitioned by a Zipf vocabulary put
    * whole stopword populations on single reducers (a first draft
    * joined instances and probed 3.7× at 10×), while tf rows are
    * bounded by |docs|·|distinct tokens per doc| and spread by doc. */
  def docSurprise(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val cnts = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("total"))
    val costs = cnts.crossJoin(broadcast(tot))
      .select(col("tok"),
        expr("CAST(length(bin(total)) - length(bin(cnt)) AS BIGINT)")
          .as("cost_bits"))
    tf.join(costs, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("cost_bits")).as("total_bits"))
      .select(col("doc_id"), col("n_tokens"), col("total_bits"),
        expr("(1000 * total_bits) DIV n_tokens").as("surprise_mbpt"))
  }

  /** Oracle fixture of [[docSurprise]]. */
  private val q205 = GQuery(
    "q205_doc_surprise",
    (s, dir) => docSurprise(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents) WHERE len(tok) > 0),
      cnts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
      tot AS (SELECT SUM(cnt) AS total FROM cnts),
      costs AS (SELECT tok,
          CAST(length(bin(CAST(tot.total AS BIGINT)))
            - length(bin(CAST(cnt AS BIGINT))) AS BIGINT) AS cost_bits
        FROM cnts, tot)
      SELECT doc_id, COUNT(*) AS n_tokens,
        CAST(SUM(cost_bits) AS BIGINT) AS total_bits,
        (1000 * CAST(SUM(cost_bits) AS BIGINT)) // COUNT(*) AS surprise_mbpt
      FROM toks JOIN costs USING (tok)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Oracle fixture of [[codeTableDrift]] over the full source matrix. */
  private val q192 = GQuery(
    "q192_codetable_drift",
    (s, dir) => codeTableDrift(t(s, dir, "documents"))
      .orderBy(col("src_a"), col("src_b")),
    Some("""WITH toks AS (SELECT source, tok, COUNT(*) AS cnt FROM (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents) WHERE len(tok) > 0
        GROUP BY source, tok),
      tot AS (SELECT source AS src_b, SUM(cnt) AS total,
          CAST(length(bin(CAST(SUM(cnt) AS BIGINT))) AS BIGINT) AS tot_bits
        FROM toks GROUP BY source),
      costs AS (SELECT t.source AS src_b, t.tok,
          o.tot_bits - CAST(length(bin(t.cnt)) AS BIGINT) AS cost_bits
        FROM toks t JOIN tot o ON o.src_b = t.source),
      x AS (SELECT a.source AS src_a, o.src_b, a.tok, a.cnt,
          COALESCE(c.cost_bits, o.tot_bits + 1) AS cost
        FROM toks a
        CROSS JOIN tot o
        LEFT JOIN costs c ON c.src_b = o.src_b AND c.tok = a.tok)
      SELECT src_a, src_b,
        CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        CAST(SUM(cnt * cost) AS BIGINT) AS total_bits,
        (1000 * CAST(SUM(cnt * cost) AS BIGINT))
          // CAST(SUM(cnt) AS BIGINT) AS mbpt
      FROM x GROUP BY src_a, src_b
      ORDER BY src_a, src_b"""))

  /** Source-overlap sketch card — the one-scan complement to q156's exact
    * cross-source duplication matrix: per source, a k-lane MinHash sketch
    * over the DISTINCT document texts (lane j keeps the min of a j-salted
    * rehash of each doc's content digest — one full-text md5 per doc, k
    * cheap fixed-width rehashes of the 32-char digest); the pairwise
    * fraction of matching lanes estimates content-identity Jaccard
    * between every source pair. This is the data-card number a curator
    * reads BEFORE paying for the LSH candidate build: sketches are
    * mergeable (min is associative), so at 100 TB the card costs one
    * corpus scan + a |sources|·k-row exchange — no join touches documents
    * pairwise. Identity-level overlap only (near-dups need q26/q156);
    * estimator std-err ≈ √(J(1−J)/k).
    */
  def sourceOverlapSketch(docs: DataFrame, k: Int = 12): DataFrame = {
    require(k >= 1, s"sourceOverlapSketch: k=$k lanes")
    val lanes = docs
      .select(col("source"), md5(col("text")).as("d"))
      .withColumn("j", explode(expr(s"sequence(0, ${k - 1})")))
      .select(col("source"), col("j"),
        md5(concat(col("j").cast(StringType), lit(":"), col("d"))).as("h"))
      .groupBy(col("source"), col("j")).agg(min(col("h")).as("m"))
    lanes.select(col("source").as("src_x"), col("j"), col("m").as("mx"))
      .join(lanes.select(col("source").as("src_y"), col("j"),
        col("m").as("my")), Seq("j"))
      .filter(col("src_x") < col("src_y"))
      .groupBy(col("src_x"), col("src_y"))
      .agg(count(lit(1)).as("k_lanes"),
        sum(when(col("mx") === col("my"), 1L).otherwise(0L)).as("n_match"))
      .withColumn("jaccard_est_ppm",
        expr("(1000000 * n_match) DIV k_lanes"))
  }

  /** Oracle fixture of [[sourceOverlapSketch]]. */
  private val q253 = GQuery(
    "q253_source_overlap",
    (s, dir) => sourceOverlapSketch(t(s, dir, "documents"))
      .orderBy(col("src_x"), col("src_y")),
    Some("""WITH lanes AS (SELECT source, u.j AS j,
          MIN(md5(CAST(u.j AS VARCHAR) || ':' || md5(text))) AS m
        FROM documents, UNNEST(generate_series(0, 11)) AS u(j)
        GROUP BY 1, 2)
      SELECT a.source AS src_x, b.source AS src_y,
        COUNT(*) AS k_lanes,
        CAST(SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT)
          AS n_match,
        (1000000 * CAST(SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END)
          AS BIGINT)) // COUNT(*) AS jaccard_est_ppm
      FROM lanes a JOIN lanes b ON a.j = b.j AND a.source < b.source
      GROUP BY 1, 2 ORDER BY src_x, src_y"""))

  /** Sliding-window document chunking with overlap — the op every
    * context-bounded consumer (embedding index, RAG retriever,
    * fixed-window trainer) runs between the corpus and the model:
    * chunks of `window` chars start every `stride` chars
    * (stride < window ⇒ overlap, so no boundary-straddling content is
    * ever unseen by every chunk), the tail chunk is short rather than
    * padded, and an empty document (NULL text included) still yields
    * its one empty chunk
    * (never-drop — a vanished doc breaks chunk→doc lineage audits).
    *
    * Emits (doc_id, chunk_idx, start_char, chunk_chars, chunk_md5) —
    * the hash, not the text, so downstream exact-dedup at CHUNK grain
    * (boilerplate headers/footers collapse across docs) runs on
    * 32-byte keys instead of hauling bodies (the q177 rule).
    *
    * Plan: pure map-side sequence-explode — one scan, output linear in
    * chunks (exactly the work any chunker must emit), zero shuffles. */
  def chunkWithOverlap(docs: DataFrame, window: Int = 200,
      stride: Int = 150): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    docs
      // NULL text coalesces to '' FIRST: a NULL length would make the
      // sequence() NULL and the explode silently drop the doc row,
      // breaking the advertised chunk→doc lineage (a NULL-text doc is
      // an empty doc, and an empty doc yields its one empty chunk)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .withColumn("__len", length(col("text")))
      .withColumn("start_char", explode(expr(
        s"sequence(0, greatest(CAST(__len AS INT) - 1, 0), $stride)")))
      .select(col("doc_id"),
        expr(s"CAST(start_char DIV $stride AS BIGINT)").as("chunk_idx"),
        col("start_char").cast(LongType).as("start_char"),
        expr(s"substring(text, start_char + 1, $window)").as("__chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_char"),
        length(col("__chunk")).cast(LongType).as("chunk_chars"),
        md5(col("__chunk")).as("chunk_md5"))
  }

  /** Oracle fixture of [[chunkWithOverlap]] (window 200, stride 150 —
    * 50-char overlap): chunk rows over the documents table, hash
    * carried instead of text. */
  private val q271 = GQuery(
    "q271_chunk_overlap",
    (s, dir) => chunkWithOverlap(t(s, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH d AS (SELECT doc_id, text, length(text) AS len
        FROM documents),
      st AS (SELECT doc_id, text,
          UNNEST(generate_series(0, GREATEST(len - 1, 0), 150)) AS s
        FROM d)
      SELECT doc_id, CAST(s // 150 AS BIGINT) AS chunk_idx,
        CAST(s AS BIGINT) AS start_char,
        CAST(length(substr(text, s + 1, 200)) AS BIGINT) AS chunk_chars,
        md5(substr(text, s + 1, 200)) AS chunk_md5
      FROM st ORDER BY doc_id, chunk_idx"""))

  /** Boilerplate share by CHUNK frequency — the deduplication signal at
    * sub-document grain: headers, footers, navigation and license
    * blocks repeat VERBATIM across documents that are otherwise unique,
    * so whole-doc dedup never sees them. Chunks here are
    * NON-overlapping (stride = window — an overlapping grid would count
    * the same repeated text twice); a chunk appearing in ≥ `minDocs`
    * distinct documents is boilerplate, and the per-doc card (chunks,
    * boilerplate chunks, boilerplate ppm) is the filter input — a doc
    * that is MOSTLY boilerplate is template spam regardless of its
    * near-dup score.
    *
    * Plan: the [[chunkWithOverlap]] map-side explode → one hash agg at
    * chunk-HASH grain (32-byte keys, never text — the q177 rule) → one
    * hash join back on the hash → one doc-grain agg. Two shuffles,
    * both on hash keys. */
  def boilerplateChunks(docs: DataFrame, window: Int = 40,
      minDocs: Int = 2): DataFrame = {
    val chunks = chunkWithOverlap(docs, window, stride = window)
      .select(col("doc_id"), col("chunk_md5"))
    val freq = chunks.groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("__ndocs"))
    chunks.join(freq, Seq("chunk_md5"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__ndocs") >= minDocs, 1L).otherwise(0L))
          .as("n_boiler"))
      .withColumn("boiler_ppm",
        expr("(1000000 * n_boiler) DIV n_chunks"))
  }

  /** Oracle fixture of [[boilerplateChunks]] (window 40, minDocs 2):
    * the fixture corpus genuinely repeats 40-char aligned chunks
    * (~170 repeats at sf0.01), so nonzero boilerplate rows are real. */
  private val q273 = GQuery(
    "q273_boilerplate_chunks",
    (s, dir) => boilerplateChunks(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""WITH ch AS (SELECT doc_id,
          md5(substr(text, s + 1, 40)) AS h
        FROM (SELECT doc_id, text,
            UNNEST(generate_series(0, GREATEST(length(text) - 1, 0), 40))
              AS s
          FROM documents)),
      freq AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs
        FROM ch GROUP BY 1),
      j AS (SELECT ch.doc_id, freq.ndocs FROM ch JOIN freq USING (h)),
      g AS (SELECT doc_id, COUNT(*) AS n_chunks,
          CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_boiler
        FROM j GROUP BY 1)
      SELECT doc_id, n_chunks, n_boiler,
        (1000000 * n_boiler) // n_chunks AS boiler_ppm
      FROM g ORDER BY doc_id"""))

  /** Readability card — the grade-level lens the quality family (q32
    * length/punct ratios, q65 LM score, q205 surprise) lacks: classic
    * Flesch–Kincaid grade per document, in EXACT integer milli so both
    * engines (and any two cluster runs) agree bit-for-bit. Words are
    * whitespace tokens; sentences are `[.!?]+` runs (min 1 — a fragment
    * is one sentence); syllables are approximated by VOWEL RUNS per
    * word (`[aeiouy]+`, min 1 per word — the standard cheap estimator;
    * the card is a RANKING/gating signal, not a linguistics claim, and
    * the estimator is documented so the gate is reproducible).
    * `fk_grade_milli = 390·(words DIV-scaled by sentences) +
    * 11800·(syllables scaled by words) − 15590`, truncating division;
    * empty documents keep a row with NULL grade (never-drop).
    *
    * Plan: pure map-side — one higher-order fold over each doc's token
    * array inside the scan projection; zero shuffles at any corpus
    * size (the oracle replays it via unnest + group-by). */
  def readabilityCard(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        expr("""filter(split(lower(text), ' '), w -> length(w) > 0)""")
          .as("__ws"),
        greatest(expr(
          "CAST(size(regexp_extract_all(text, '[.!?]+', 0)) AS BIGINT)"),
          lit(1L)).as("n_sentences"))
      .select(col("doc_id"),
        expr("CAST(size(__ws) AS BIGINT)").as("n_words"),
        col("n_sentences"),
        expr("""aggregate(__ws, CAST(0 AS BIGINT), (acc, w) ->
          acc + greatest(CAST(size(regexp_extract_all(w, '[aeiouy]+', 0))
            AS BIGINT), 1L))""").as("n_syllables"))
      .withColumn("fk_grade_milli",
        when(col("n_words") > 0L,
          expr("(390 * n_words) DIV n_sentences" +
            " + (11800 * n_syllables) DIV n_words - 15590")))

  /** Oracle fixture of [[readabilityCard]] over the documents table. */
  private val q296 = GQuery(
    "q296_readability",
    (s, dir) => readabilityCard(t(s, dir, "documents"))
      .orderBy(col("doc_id")),
    Some("""WITH e AS (SELECT doc_id,
          unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
      ws AS (SELECT doc_id, COUNT(*) AS n_words,
          CAST(SUM(greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))
            AS BIGINT) AS n_syllables
        FROM e WHERE len(w) > 0 GROUP BY 1),
      se AS (SELECT doc_id,
          greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
            AS BIGINT), 1) AS n_sentences
        FROM documents)
      SELECT d.doc_id,
        CAST(COALESCE(ws.n_words, 0) AS BIGINT) AS n_words,
        se.n_sentences,
        CAST(COALESCE(ws.n_syllables, 0) AS BIGINT) AS n_syllables,
        CASE WHEN COALESCE(ws.n_words, 0) > 0 THEN
          CAST((390 * ws.n_words) // se.n_sentences
            + (11800 * ws.n_syllables) // ws.n_words - 15590 AS BIGINT)
          END AS fk_grade_milli
      FROM documents d
      LEFT JOIN ws ON ws.doc_id = d.doc_id
      JOIN se ON se.doc_id = d.doc_id
      ORDER BY d.doc_id"""))

  /** Vocabulary-growth (Heaps) curve — the TYPE-grain novelty view the
    * doc-grain q146 curve cannot see: per ingestion batch, how many
    * word types appear for the FIRST time, with cumulative tokens,
    * cumulative types, and the running type/token ratio in exact ppm.
    * A healthy crawl keeps minting types roughly as a power of tokens
    * (Heaps' law); a curve that flatlines early means the corpus is
    * recombining a closed vocabulary — more data is not more language.
    * Read beside q179 (Zipf says how the vocabulary is USED, this says
    * how it GROWS) and q146 (whole-document novelty).
    *
    * Plan: one token explode → a type-grain `min(batch)` hash
    * aggregation (the only corpus-sized shuffle) + a batch-grain token
    * count; the cumulative sums ride the bucket-offset prefix
    * construction ([[PrefixSum.exclusive]]) because |batches| grows
    * with the corpus — never a single-partition window. The fixture's
    * synthetic vocabulary saturates in batch 0 (a real crawl would
    * not); the spec pins a hand corpus with genuine growth. */
  def vocabGrowth(docs: DataFrame, batchSize: Long = 100L): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val tk = docs.select(expr(s"doc_id DIV ${batchSize}L").as("batch"),
      explode(expr("filter(split(lower(text), ' '), w -> length(w) > 0)"))
        .as("w"))
    // token counts come from the DOC grain, not the explode: a batch
    // of only empty/NULL docs must keep its row with zero tokens
    // (never-drop — an empty ingestion batch is a fact the curve
    // reader needs), and the explode elides exactly those batches
    val bt = docs.select(expr(s"doc_id DIV ${batchSize}L").as("batch"),
        expr("""CAST(size(filter(split(lower(coalesce(text, '')), ' '),
          w -> length(w) > 0)) AS BIGINT)""").as("__tk"))
      .groupBy(col("batch")).agg(sum(col("__tk")).as("batch_tokens"))
    val nb = tk.groupBy(col("w")).agg(min(col("batch")).as("batch"))
      .groupBy(col("batch")).agg(count(lit(1)).as("new_types"))
    // batch-grain cut: the prefix construction fans into bucket-total
    // + offset + join branches, each of which would otherwise re-run
    // the corpus-sized token explode feeding bt/nb (the q298 lesson)
    val b = bt.join(nb, Seq("batch"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .localCheckpoint()
    // bucketWidth 1024, NOT the 2^20 default: batch = doc_id DIV 100,
    // so the batch-id domain is |corpus|/100 — at the default width any
    // corpus under ~10^8 docs lands in ONE bucket and the in-bucket
    // window degenerates to a single partition (the advice-r12 finding;
    // same trap the rfmSegments comment documents for small-domain keys)
    PrefixSum.exclusive(b, "batch", Seq("batch_tokens", "new_types"),
      bucketWidth = 1024L)
      .withColumn("cum_tokens",
        col("batch_tokens_cum") + col("batch_tokens"))
      .withColumn("cum_types", col("new_types_cum") + col("new_types"))
      .select(col("batch"), col("batch_tokens"), col("new_types"),
        col("cum_tokens"), col("cum_types"),
        when(col("cum_tokens") > 0L,
          expr("(1000000 * cum_types) DIV cum_tokens")).as("ttr_ppm"))
  }

  /** Oracle fixture of [[vocabGrowth]] (batches of 100 doc_ids). */
  private val q301 = GQuery(
    "q301_vocab_growth",
    (s, dir) => vocabGrowth(t(s, dir, "documents"), batchSize = 100L)
      .orderBy(col("batch")),
    Some("""WITH tk AS (SELECT doc_id // 100 AS batch,
          unnest(string_split(lower(text), ' ')) AS w FROM documents),
      tk2 AS (SELECT batch, w FROM tk WHERE len(w) > 0),
      bt AS (SELECT doc_id // 100 AS batch,
          CAST(SUM(len(list_filter(string_split(lower(COALESCE(text,
            '')), ' '), w -> len(w) > 0))) AS BIGINT) AS batch_tokens
        FROM documents GROUP BY 1),
      fb AS (SELECT w, MIN(batch) AS batch FROM tk2 GROUP BY 1),
      nb AS (SELECT batch, COUNT(*) AS new_types FROM fb GROUP BY 1),
      b AS (SELECT bt.batch, batch_tokens,
          COALESCE(new_types, 0) AS new_types
        FROM bt LEFT JOIN nb USING (batch))
      SELECT batch, batch_tokens, CAST(new_types AS BIGINT) AS new_types,
        CAST(SUM(batch_tokens) OVER (ORDER BY batch) AS BIGINT)
          AS cum_tokens,
        CAST(SUM(new_types) OVER (ORDER BY batch) AS BIGINT) AS cum_types,
        CASE WHEN SUM(batch_tokens) OVER (ORDER BY batch) > 0 THEN
          CAST((1000000 * SUM(new_types) OVER (ORDER BY batch))
            // SUM(batch_tokens) OVER (ORDER BY batch) AS BIGINT) END
          AS ttr_ppm
      FROM b ORDER BY batch"""))

  val queries: Seq[GQuery] =
    Seq(q25, q26, q26b, q27, q27b, q28, q31, q32, q33, q34, q35, q45, q47,
      q48, q49, q50, q54, q62, q69, q72, q77, q78, q81, q91, q94, q105,
      q110, q111, q118, q120, q126, q128, q129, q134, q146, q149, q156,
      q157, q158, q159, q162, q164, q172, q179, q187, q192, q194, q199,
      q201, q205, q206, q208, q228, q237, q242, q253, q271, q273, q296,
      q301)
}
