package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Dsl._

/** Byte-pair-encoding merge LEARNING — the tokenizer-training step that
  * precedes [[TextQ.buildVocab]]'s whole-token frequency vocabulary:
  * instead of ranking existing tokens, BPE *constructs* subword units by
  * repeatedly merging the corpus's most frequent adjacent symbol pair
  * (Sennrich et al. 2016, the construction GPT/Llama tokenizers build on).
  *
  * Semantics (pinned by the DuckDB oracle, which replays the identical
  * construction):
  *   - Words are whitespace tokens; learning runs on the DISTINCT word
  *     table weighted by word frequency — the classic formulation, and the
  *     reason this scales: every per-round step touches the vocabulary
  *     (≤ a few million rows at 100 TB), never the corpus. The corpus is
  *     scanned exactly once, by the initial word count.
  *   - A word's initial symbol sequence is its characters (codepoints —
  *     both engines' `(.)` regex and `length` are codepoint-based).
  *   - Each round counts adjacent symbol pairs (weight = word frequency),
  *     picks the max by (freq desc, left asc, right asc) — a total order,
  *     so the winner is deterministic — and rewrites every word by merging
  *     that pair GREEDILY LEFT-TO-RIGHT: in `a a a` with pair (a,a) the
  *     first two merge, the third survives. The rewrite is a left fold
  *     whose accumulator is the partially-merged symbol string; a merge
  *     consumes its left operand, so an overlapping second match cannot
  *     fire — exactly the reference BPE convention.
  *
  * Scale shape: one corpus scan (word count) + per round one
  * vocabulary-sized aggregation, one driver-collected candidate list
  * (≤ 4·batch+16 rows — bounded traffic, like `kmeansCentroids`'
  * centroid collect), and one vocabulary-sized codegen'd map (the
  * multi-pair fold). With `batch = m`, a `rounds`-merge budget needs
  * ~rounds/m Spark rounds, so the per-round scheduling floor no longer
  * bounds wall-clock at production merge budgets (30k–100k merges) —
  * the round-5 weakness. Lineage is cut per round (`localCheckpoint`,
  * or durable `checkpoint` with `reliable = true`, the
  * [[TextQ.connectedComponents]] pattern) so plans don't grow with
  * `rounds`.
  */
object TokenizerQ {

  /** Distinct-word frequency table with the initial (character-level)
    * symbol sequence as a space-separated string. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("sym", trim(regexp_replace(col("word"), "(.)", "$1 ")))

  /** Greedy leftmost-first merge of a BATCH of adjacent pairs in a
    * space-separated symbol string, as ONE codegen'd fold: append each
    * symbol to the accumulator, except that some pair's right symbol
    * arriving while the accumulator ends in that pair's left replaces
    * the left with the merged product — which cannot be re-consumed this
    * round (it equals no pair's left: batch pairs are SYMBOL-DISJOINT,
    * see [[learn]]'s selection, and a single pair's product l+r never
    * equals l for nonempty r).
    *
    * For symbol-disjoint pairs the one-pass multi-branch fold is exactly
    * the sequential composition of the per-pair folds in any order:
    * merging one pair can neither create nor destroy an adjacency of
    * another (the product sits between its neighbors and shares no
    * symbol with other pairs), so each pair observes the same adjacency
    * stream either way — BpePropertySpec checks this against naive
    * sequential merges. The expression is O(batch) in size: the
    * accumulator is a lambda VARIABLE, so the per-pair branches
    * reference it as a leaf, not by duplicating the whole subtree
    * (a literal composition of single-pair folds would be ~5^batch
    * nodes — the reason the batch is one fold, not m folds). */
  private def mergeFold(sym: Column, pairs: Seq[(String, String)]): Column = {
    require(pairs.nonEmpty, "mergeFold needs at least one pair")
    val syms = split(sym, " ")
    val step = (acc: Column, x: Column) => {
      val accSyms = split(acc, " ")
      val merged = pairs.foldLeft(when(lit(false), acc)) { case (w, (l, r)) =>
        w.when(x === lit(r) && element_at(accSyms, -1) === lit(l),
          array_join(
            concat(slice(accSyms, lit(1), size(accSyms) - 1),
              array(lit(l + r))),
            " "))
      }
      merged.otherwise(concat(acc, lit(" "), x))
    }
    when(size(syms) < 2, sym)
      .otherwise(aggregate(
        slice(syms, lit(2), size(syms) - 1), element_at(syms, 1), step))
  }

  /** Test seam: [[mergeFold]] exposed for the property spec (which
    * cross-checks it against a naive imperative greedy merge). */
  private[graft] def testMergeFold(sym: Column, l: String, r: String): Column =
    mergeFold(sym, Seq((l, r)))

  /** Test seam: the batched fold for the batch-equivalence property. */
  private[graft] def testBatchMergeFold(sym: Column,
      pairs: Seq[(String, String)]): Column = mergeFold(sym, pairs)

  /** Run a `rounds`-merge budget; returns the merge list and the final
    * (word, freq, sym) table. Fails loudly if the vocabulary runs out of
    * adjacent pairs before `rounds` merges — silently returning fewer
    * would diverge from the oracle's fixed unrolling and from what the
    * caller asked a tokenizer budget for.
    *
    * `batch` merges per Spark round: each round counts pairs ONCE,
    * collects the top candidates, keeps up to `batch` of them greedily
    * in (freq desc, l, r) order subject to SYMBOL-DISJOINTNESS — a kept
    * pair shares no symbol (left, right, or merged product) with any
    * earlier kept pair — and applies all kept merges in one
    * vocabulary-sized rewrite. Disjointness makes the batch
    * order-insensitive and batch-apply ≡ sequential-apply
    * ([[mergeFold]]); the product exclusion stops a `(a,b)`-batch-mate
    * from consuming symbols the `ab` merge just created. `batch = 1`
    * reproduces classic sequential BPE EXACTLY (same argmax, same
    * rewrite, same rounds — the q137/q138 oracles pin it).
    *
    * This is the practical-budget dial the driver-sequential loop
    * lacked: wall-clock per merge is dominated by the per-round job
    * scheduling floor (~0.1–0.2s regardless of cluster size), so a
    * production 30k-merge budget at batch=64 is ~470 rounds (~minutes)
    * instead of 30k rounds (hours). Batched selection diverges from
    * sequential BPE only where sequential round k+1's argmax would be a
    * pair CREATED by merge k (excluded from the batch by the product
    * rule and picked up next round) — the standard batched-BPE
    * trade-off, bounded by `batch`. */
  /** Signed adjacent-pair explode of one symbol column: (l, r, ±freq)
    * rows for every adjacency in `symName`. The building block of both
    * the initial full pair count (+1 over all words) and the per-round
    * DELTA (−1 over touched words' old symbols, +1 over their new). */
  private def pairDelta(df: DataFrame, symName: String, sign: Int): DataFrame = {
    val ts = split(col(symName), " ")
    df.filter(size(ts) >= 2)
      .select((col("freq") * sign).as("d"), explode(zip_with(
        slice(ts, lit(1), size(ts) - 1),
        slice(ts, lit(2), size(ts) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("d"))
  }

  /** Signed symbol explode of one symbol column: (s, ±freq) rows — the
    * [[pairDelta]] analogue for the symbol-frequency table the WordPiece
    * scorer divides by. */
  private def symDelta(df: DataFrame, symName: String, sign: Int): DataFrame =
    df.select((col("freq") * sign).as("d"),
      explode(split(col(symName), " ")).as("s"))
      .select(col("s"), col("d"))

  private def learn(docs: DataFrame, rounds: Int, reliable: Boolean,
      batch: Int = 1, likelihood: Boolean = false)
      : (Seq[(Int, String, String, Long, Long)], DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 100000,
      s"rounds must be in [1, 100000], got $rounds")
    require(batch >= 1 && batch <= 256,
      s"batch must be in [1, 256], got $batch")
    // Lineage policy (round-9): the per-round tables are tiny, but an
    // EAGER localCheckpoint is one whole Spark job each — at 2-3 per
    // round the ~0.1s job-scheduling floor, not the data, dominated the
    // learner's wall (q153 ran 1.6× its baseline on checkpoint jobs
    // alone). LAZY localCheckpoints keep the same lineage cut and the
    // same once-only materialization (the RDD caches on first use), but
    // the materialization rides the next argmax collect — a round is ONE
    // job instead of three. `reliable` keeps the every-round durable
    // checkpoint contract unchanged.
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint(eager = false)
    var words = snap(wordTable(docs))
    // Incremental pair counts: pc holds the EXACT adjacency counts of the
    // current word table. Per round only words actually rewritten by the
    // last batch contribute a ± delta — the untouched-word fraction
    // (almost all words, once the vocabulary is past the first merges)
    // is never re-exploded, unlike a full recount. pc after the merge
    //   pc' = pc − pairs(old touched) + pairs(new touched)
    // equals the full recount of the new table by construction
    // (BpePropertySpec pins the equivalence after multiple rounds).
    var pc = snap(pairDelta(words, "sym", 1)
      .groupBy(col("l"), col("r")).agg(sum(col("d")).as("pf")))
    // Likelihood (WordPiece) mode additionally maintains the symbol
    // frequency table sc the same incremental way; the argmax then ranks
    // by score = pf·10¹² DIV (fl·fr) computed over the (pair-table-sized)
    // pc ⋈ sc join. batch > 1 scores the whole batch against PRE-batch
    // counts — the same bounded approximation as batched frequency BPE.
    var sc =
      if (likelihood) snap(symDelta(words, "sym", 1)
        .groupBy(col("s")).agg(sum(col("d")).as("c")))
      else null: DataFrame
    val merges = Seq.newBuilder[(Int, String, String, Long, Long)]
    var done = 0
    while (done < rounds) {
      val want = math.min(batch, rounds - done)
      // collect enough candidates to skip over conflict chains; a
      // shorter list than the limit just means fewer pairs exist
      val ranked =
        if (likelihood)
          pc.filter(col("pf") > 0)
            .join(sc.select(col("s").as("l"), col("c").as("fl")), Seq("l"))
            .join(sc.select(col("s").as("r"), col("c").as("fr")), Seq("r"))
            .select(col("l"), col("r"), col("pf"), expr(
              """(CAST(pf AS DECIMAL(38,0)) * 1000000000000)
                 div (CAST(fl AS DECIMAL(38,0)) * fr)""").as("score"))
            .orderBy(col("score").desc, col("l"), col("r"))
        else
          pc.filter(col("pf") > 0)
            .select(col("l"), col("r"), col("pf"), col("pf").as("score"))
            .orderBy(col("pf").desc, col("l"), col("r"))
      val cand = ranked.limit(4 * want + 16).collect()
      if (cand.isEmpty) throw new IllegalStateException(
        s"vocabulary has no adjacent pairs left after $done merges; " +
          s"asked for $rounds — lower rounds or grow the corpus")
      val used = scala.collection.mutable.Set.empty[String]
      val kept = Seq.newBuilder[(String, String, Long, Long)]
      var n = 0
      val it = cand.iterator
      while (n < want && it.hasNext) {
        val row = it.next()
        val l = row.getString(0); val r = row.getString(1)
        val syms = Seq(l, r, l + r)
        if (!syms.exists(used.contains)) {
          used ++= syms
          kept += ((l, r, row.getLong(2), row.getLong(3)))
          n += 1
        }
      }
      val sel = kept.result()
      sel.zipWithIndex.foreach { case ((l, r, pf, sc0), i) =>
        merges += ((done + i + 1, l, r, pf, sc0))
      }
      val upd = snap(words.withColumn("new_sym",
        mergeFold(col("sym"), sel.map { case (l, r, _, _) => (l, r) })))
      val touched = upd.filter(col("new_sym") =!= col("sym"))
      pc = snap(pc.select(col("l"), col("r"), col("pf").as("d"))
        .union(pairDelta(touched, "sym", -1))
        .union(pairDelta(touched, "new_sym", 1))
        .groupBy(col("l"), col("r")).agg(sum(col("d")).as("pf"))
        .filter(col("pf") =!= 0L))
      if (likelihood)
        sc = snap(sc.select(col("s"), col("c").as("d"))
          .union(symDelta(touched, "sym", -1))
          .union(symDelta(touched, "new_sym", 1))
          .groupBy(col("s")).agg(sum(col("d")).as("c"))
          .filter(col("c") =!= 0L))
      words = upd.select(col("word"), col("freq"),
        col("new_sym").as("sym"))
      done += sel.size
    }
    (merges.result(), words, pc)
  }

  /** Test seam: the learner's incremental pair-count table next to its
    * word table after `rounds` merges, for the delta-vs-full-recount
    * equivalence spec. */
  private[graft] def testLearnState(docs: DataFrame, rounds: Int,
      batch: Int): (DataFrame, DataFrame) = {
    val (_, words, pc) = learn(docs, rounds, reliable = false, batch)
    (words, pc)
  }

  /** The learned merge table: one row per merge with the winning pair,
    * the merged symbol, and the pair's corpus frequency at merge time
    * (batch-time frequency when `batch > 1`). */
  def bpeMerges(docs: DataFrame, rounds: Int,
      reliable: Boolean = false, batch: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, rounds, reliable, batch)._1
      .map { case (rd, l, r, pf, _) => (rd, l, r, pf) }
      .toDF("round", "left_sym", "right_sym", "pair_freq")
      .select(col("round").cast(LongType).as("round"),
        col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_freq"))
  }

  /** Tokenizer APPLY at the document level: per doc, whitespace-token
    * count, character count, and the BPE token count after `rounds`
    * learned merges — the compression-ratio card that decides whether a
    * merge budget is worth shipping. The per-word segmentation is reused
    * from training (the learner's final word table IS the apply map), so
    * application is one corpus explode joined to a vocabulary-sized map —
    * no per-document fold. The join is hint-free: at fixture scale AQE
    * broadcasts the vocabulary; at 100 TB with a huge vocab the shuffled
    * fallback is the right plan. */
  def bpeTokenCounts(docs: DataFrame, rounds: Int,
      reliable: Boolean = false, batch: Int = 1): DataFrame = {
    val seg = learn(docs, rounds, reliable, batch)._2
      .select(col("word"), size(split(col("sym"), " ")).cast(LongType).as("n_bpe"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(seg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast(LongType).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe_tokens"))
  }

  /** DuckDB twin of [[learn]]: `rounds` unrolled CTE blocks. Each round
    * r builds p{r} (pair counts), b{r} (the argmax row) and s{r} (the
    * rewritten word table); the fold is `list_reduce` with the same
    * consume-the-left-operand greedy semantics as [[mergeFold]]. */
  private[queries] def bpeSql(rounds: Int): String = {
    val init =
      """w AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM
           (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           WHERE len(word) > 0 GROUP BY word),
         s0 AS (SELECT word, freq,
             trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym FROM w)"""
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS (SELECT ts[i] AS l, ts[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS pf
            FROM (SELECT freq, string_split(sym, ' ') AS ts FROM s${r - 1}),
              UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
            WHERE len(ts) >= 2
            GROUP BY 1, 2),
          b$r AS (SELECT l, r, pf FROM p$r ORDER BY pf DESC, l, r LIMIT 1),
          s$r AS (SELECT word, freq,
              CASE WHEN len(string_split(sym, ' ')) < 2 THEN sym ELSE
                list_reduce(string_split(sym, ' '), (acc, x) ->
                  CASE WHEN x = b$r.r
                      AND string_split(acc, ' ')[-1] = b$r.l
                    THEN array_to_string(list_append(
                      list_slice(string_split(acc, ' '), 1,
                        len(string_split(acc, ' ')) - 1), b$r.l || b$r.r), ' ')
                    ELSE acc || ' ' || x END) END AS sym
            FROM s${r - 1}, b$r)"""
    }.mkString(",\n")
    s"$init,\n$perRound"
  }

  /** Oracle fixture of [[bpeMerges]]: 3 rounds over the full corpus. */
  private val q137 = {
    val rows = (1 to 3).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, l AS left_sym, r AS right_sym, l || r AS merged, pf AS pair_freq FROM b$r")
      .mkString(" UNION ALL ")
    GQuery(
      "q137_bpe_merges",
      (s, dir) => bpeMerges(t(s, dir, "documents"), rounds = 3)
        .orderBy(col("round")),
      Some(s"""WITH ${bpeSql(3)}
        $rows
        ORDER BY round"""))
  }

  /** Oracle fixture of [[bpeTokenCounts]] after the same 3 merges. */
  private val q138 = GQuery(
    "q138_bpe_encode",
    (s, dir) => bpeTokenCounts(t(s, dir, "documents"), rounds = 3)
      .orderBy(col("doc_id")),
    Some(s"""WITH ${bpeSql(3)},
      seg AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_bpe
              FROM s3),
      e AS (SELECT doc_id, word FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents) WHERE len(word) > 0)
      SELECT doc_id, COUNT(*) AS n_words,
        CAST(SUM(len(word)) AS BIGINT) AS n_chars,
        CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens
      FROM e JOIN seg USING (word)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** DuckDB twin of [[learn]] at `batch = 2`: per batch-round r, `a$r`
    * is the argmax pair, `b$r` the best pair SYMBOL-DISJOINT from it
    * (left, right, and merged product all unshared — exactly the
    * greedy selection for m = 2), and the rewrite applies a then b
    * sequentially, which equals the engine's one-pass batch fold for
    * disjoint pairs (the BpePropertySpec equivalence). */
  private[queries] def bpeBatch2Sql(rounds: Int): String = {
    val init =
      """w AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM
           (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           WHERE len(word) > 0 GROUP BY word),
         s0 AS (SELECT word, freq,
             trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym FROM w)"""
    def fold(src: String, pick: String) =
      s"""CASE WHEN len(string_split(sym, ' ')) < 2 THEN sym ELSE
           list_reduce(string_split(sym, ' '), (acc, x) ->
             CASE WHEN x = $pick.r
                 AND string_split(acc, ' ')[-1] = $pick.l
               THEN array_to_string(list_append(
                 list_slice(string_split(acc, ' '), 1,
                   len(string_split(acc, ' ')) - 1), $pick.l || $pick.r), ' ')
               ELSE acc || ' ' || x END) END"""
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS (SELECT ts[i] AS l, ts[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS pf
            FROM (SELECT freq, string_split(sym, ' ') AS ts FROM s${r - 1}),
              UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
            WHERE len(ts) >= 2
            GROUP BY 1, 2),
          a$r AS (SELECT l, r, pf FROM p$r ORDER BY pf DESC, l, r LIMIT 1),
          b$r AS (SELECT p.l, p.r, p.pf FROM p$r p, a$r a
            WHERE p.l NOT IN (a.l, a.r, a.l || a.r)
              AND p.r NOT IN (a.l, a.r, a.l || a.r)
              AND (p.l || p.r) NOT IN (a.l, a.r, a.l || a.r)
            ORDER BY p.pf DESC, p.l, p.r LIMIT 1),
          t$r AS (SELECT word, freq, ${fold(s"s${r - 1}", s"a$r")} AS sym
            FROM s${r - 1}, a$r),
          s$r AS (SELECT word, freq, ${fold(s"t$r", s"b$r")} AS sym
            FROM t$r, b$r)"""
    }.mkString(",\n")
    s"$init,\n$perRound"
  }

  /** Oracle fixture of the BATCHED learner: 4 merges at batch = 2 (two
    * batch-rounds of an argmax + its best disjoint runner-up). Pins the
    * round-6 batching against an exactly-replayed DuckDB construction —
    * the m = 1 semantics stay pinned by [[q137]]/[[q138]]. */
  private val q153 = {
    val rows = (1 to 2).flatMap(r => Seq(
      s"SELECT CAST(${2 * r - 1} AS BIGINT) AS round, l AS left_sym, r AS right_sym, l || r AS merged, pf AS pair_freq FROM a$r",
      s"SELECT CAST(${2 * r} AS BIGINT), l, r, l || r, pf FROM b$r"))
      .mkString(" UNION ALL ")
    GQuery(
      "q153_bpe_batched",
      (s, dir) => bpeMerges(t(s, dir, "documents"), rounds = 4, batch = 2)
        .orderBy(col("round")),
      Some(s"""WITH ${bpeBatch2Sql(2)}
        $rows
        ORDER BY round"""))
  }

  /** WordPiece merge learning — the THIRD tokenizer family next to BPE
    * (q137, raw pair frequency) and unigram-LM (q180, global
    * segmentation cost): the BERT-style scorer picks the pair maximizing
    * `freq(lr) / (freq(l)·freq(r))` — a LIKELIHOOD ratio, so a
    * moderately-frequent pair of RARE symbols beats a frequent pair of
    * ubiquitous ones (BPE's known failure: gluing the two most common
    * letters first). Same greedy leftmost rewrite ([[mergeFold]]), same
    * vocabulary-sized rounds; only the argmax changes. The score is the
    * exact scaled integer `pf·10¹² DIV (fl·fr)` in DECIMAL(38,0) with
    * (score desc, l, r) as the total order, so the DuckDB oracle
    * replays the identical selection.
    *
    * Scale shape: shares [[learn]]'s machinery — incremental pair AND
    * symbol counts (± deltas from touched words only), batched
    * symbol-disjoint merges, lineage cut per round — so the same
    * production merge budgets are practical; `batch = 1` is the exact
    * sequential scorer the oracle pins, `batch > 1` scores the batch
    * against pre-batch counts (the documented batched-BPE trade-off). */
  def wordpieceMerges(docs: DataFrame, rounds: Int,
      reliable: Boolean = false, batch: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, rounds, reliable, batch, likelihood = true)._1
      .toDF("round", "left_sym", "right_sym", "pair_freq", "score_scaled")
      .select(col("round").cast(LongType).as("round"),
        col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_freq"), col("score_scaled"))
  }

  /** DuckDB twin of [[wordpieceMerges]]: the bpeSql chain with a
    * symbol-frequency CTE and the likelihood-ratio argmax per round. */
  private[queries] def wordpieceSql(rounds: Int): String = {
    val init =
      """w AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM
           (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           WHERE len(word) > 0 GROUP BY word),
         s0 AS (SELECT word, freq,
             trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym FROM w)"""
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS (SELECT ts[i] AS l, ts[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS pf
            FROM (SELECT freq, string_split(sym, ' ') AS ts FROM s${r - 1}),
              UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
            WHERE len(ts) >= 2
            GROUP BY 1, 2),
          y$r AS (SELECT s, CAST(SUM(freq) AS BIGINT) AS c
            FROM (SELECT freq, unnest(string_split(sym, ' ')) AS s
                  FROM s${r - 1})
            GROUP BY s),
          b$r AS (SELECT l, r, pf,
              CAST((CAST(pf AS HUGEINT) * 1000000000000)
                // (CAST(fl.c AS HUGEINT) * fr.c) AS BIGINT) AS score
            FROM p$r
            JOIN y$r fl ON fl.s = p$r.l
            JOIN y$r fr ON fr.s = p$r.r
            ORDER BY score DESC, l, r LIMIT 1),
          s$r AS (SELECT word, freq,
              CASE WHEN len(string_split(sym, ' ')) < 2 THEN sym ELSE
                list_reduce(string_split(sym, ' '), (acc, x) ->
                  CASE WHEN x = b$r.r
                      AND string_split(acc, ' ')[-1] = b$r.l
                    THEN array_to_string(list_append(
                      list_slice(string_split(acc, ' '), 1,
                        len(string_split(acc, ' ')) - 1), b$r.l || b$r.r), ' ')
                    ELSE acc || ' ' || x END) END AS sym
            FROM s${r - 1}, b$r)"""
    }.mkString(",\n")
    s"$init,\n$perRound"
  }

  /** Oracle fixture of [[wordpieceMerges]]: 3 likelihood-scored rounds. */
  private val q200 = {
    val rows = (1 to 3).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, l AS left_sym, r AS right_sym, l || r AS merged, pf AS pair_freq, score AS score_scaled FROM b$r")
      .mkString(" UNION ALL ")
    GQuery(
      "q200_wordpiece_merges",
      (s, dir) => wordpieceMerges(t(s, dir, "documents"), rounds = 3)
        .orderBy(col("round")),
      Some(s"""WITH ${wordpieceSql(3)}
        $rows
        ORDER BY round"""))
  }

  // ------------------------------------------------------------------
  // Unigram-LM segmentation — the SECOND tokenizer family (SentencePiece
  // / Kudo 2018 style) next to BPE: instead of learning merges, score a
  // substring VOCABULARY by corpus frequency and segment each word into
  // the minimum-total-cost sequence of vocabulary pieces (Viterbi over
  // the word's position DAG). Costs are STAIRCASE bits — cost(piece) =
  // ⌊log₂ Σcnt⌋ − ⌊log₂ cnt⌋ via binary-string length, exact integers in
  // both engines (the q168/q179 rule: never cross-engine ln), so the
  // min-cost DP value is engine-portable and the DuckDB oracle replays
  // the identical unrolled iteration (the q139 pattern).
  //
  // Scale shape: ONE corpus scan (the word count); everything after —
  // n-gram counting, top-K selection, the edge DAG, and every DP round —
  // runs on the distinct-word DICTIONARY (the q164 lesson), so a 100 TB
  // corpus costs the same as its vocabulary after the first aggregation.
  // The DP is maxWordLen sequential dictionary-sized rounds (lineage cut
  // per round); words longer than maxWordLen fail loudly rather than
  // silently vanishing from the output.
  // ------------------------------------------------------------------

  /** Distinct-word frequency table (whitespace tokens, empties dropped). */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Substring vocabulary with staircase-bit costs from a word table. */
  private def vocabFromWords(w: DataFrame, maxPieceLen: Int,
      topK: Int): DataFrame = {
    val grams = w
      .select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word))")).as("s"))
      .select(col("word"), col("freq"), col("s"), explode(expr(
        s"sequence(1, least($maxPieceLen, length(word) - s + 1))")).as("plen"))
      .select(expr("substring(word, s, plen)").as("piece"), col("freq"))
    val cnts = grams.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("total"))
    // top-K as TakeOrderedAndProject (distributed partial top-K), UNION
    // the single-char coverage floor, distinct to collapse the overlap —
    // exactly the rows `rn <= topK OR len = 1` selects, without ranking
    // the SUBSTRING table (≈ |word vocab| · maxPieceLen rows — the one
    // table in this family that is NOT small) through an un-partitioned
    // window (the q183 lesson applied here)
    val kept = cnts.orderBy(col("cnt").desc, col("piece")).limit(topK)
      .unionAll(cnts.filter(length(col("piece")) === 1))
      .distinct()
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        expr("CAST(length(bin(total)) - length(bin(cnt)) AS BIGINT)")
          .as("cost_bits"))
  }

  /** Corpus-derived substring vocabulary: all char n-grams of length
    * 1..maxPieceLen weighted by word frequency, keep the `topK` most
    * frequent PLUS every single character (coverage: segmentation can
    * never fail), cost = staircase bits of the piece's corpus share. */
  def unigramVocab(docs: DataFrame, maxPieceLen: Int = 4,
      topK: Int = 256): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"maxPieceLen must be in [1, 8], got $maxPieceLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    vocabFromWords(wordFreq(docs), maxPieceLen, topK)
  }

  /** Per-distinct-word minimum segmentation cost under the corpus-derived
    * unigram vocabulary: Viterbi over the position DAG (edge = a
    * vocabulary piece occurring at a position), unrolled as `maxWordLen`
    * dictionary-sized rounds. Returns (word, freq, word_len, cost_bits,
    * bits_total = freq·cost) — the table a tokenizer-selection study
    * reads, and the input to [[unigramCorpusCard]]. */
  def unigramSegmentCosts(docs: DataFrame, maxPieceLen: Int = 4,
      topK: Int = 256, maxWordLen: Int = 12,
      reliable: Boolean = false, dpBatch: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"maxPieceLen must be in [1, 8], got $maxPieceLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(maxWordLen >= 1 && maxWordLen <= 64,
      s"maxWordLen must be in [1, 64], got $maxWordLen")
    require(dpBatch >= 1 && dpBatch <= 8,
      s"dpBatch must be in [1, 8], got $dpBatch")
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val w = snap(wordFreq(docs).withColumn("word", expr(
      s"""CASE WHEN length(word) > $maxWordLen THEN raise_error(concat(
        'graft.unigramSegmentCosts: word longer than $maxWordLen: ', word))
      ELSE word END""")))
    val vocab = snap(vocabFromWords(w, maxPieceLen, topK))
    val edges = snap(w
      .select(col("word"), explode(expr("sequence(1, length(word))")).as("s"))
      .select(col("word"), col("s"), explode(expr(
        s"sequence(1, least($maxPieceLen, length(word) - s + 1))")).as("plen"))
      .select(col("word"), col("s"), (col("s") + col("plen") - 1).as("e"),
        expr("substring(word, s, plen)").as("piece"))
      .join(vocab.select(col("piece"), col("cost_bits").as("cost")),
        Seq("piece"))
      .select(col("word"), col("s"), col("e"), col("cost")))
    // Batched relaxation (the BPE batch-fold lever applied to the DP's
    // scheduling floor): instead of one dictionary-sized job per
    // position, fold `dpBatch` Viterbi steps into one job. Precompute
    // min-cost multi-edge PATHS of 1..dpBatch pieces (min-plus compose
    // of the edge DAG with itself, grouped to min per (word, s, e) each
    // step — associativity makes intermediate mins exact); then one
    // batch round relaxes positions [a, a+dpBatch−1] at once, joining
    // paths ending in the batch against the already-final best values
    // (pos < a). Coverage: the optimal route to j ∈ batch decomposes at
    // its last node p < a into best(p) + a path with all intermediates
    // in [a, j) — at most dpBatch edges, so it is in the path table.
    // In-batch predecessors are simply absent from `best` at join time;
    // their contribution arrives via the longer composed paths. The
    // per-position oracle unrolling hash-proves batch ≡ sequential.
    val paths = {
      var cur = edges
      var acc = edges
      for (_ <- 2 to dpBatch) {
        cur = cur.as("p").join(edges.as("n"),
            col("p.word") === col("n.word") &&
              col("n.s") === col("p.e") + 1)
          .select(col("p.word").as("word"), col("p.s").as("s"),
            col("n.e").as("e"), (col("p.cost") + col("n.cost")).as("cost"))
          .groupBy(col("word"), col("s"), col("e"))
          .agg(min(col("cost")).as("cost"))
        acc = acc.union(cur)
      }
      if (dpBatch == 1) edges
      else snap(acc.groupBy(col("word"), col("s"), col("e"))
        .agg(min(col("cost")).as("cost")))
    }
    var best = w.select(col("word"), lit(0).as("pos"), lit(0L).as("cost"))
    var a = 1
    while (a <= maxWordLen) {
      val hi = math.min(a + dpBatch - 1, maxWordLen)
      val nxt = paths.filter(col("e") >= a && col("e") <= hi)
        .select(col("word"), (col("s") - 1).as("ppos"), col("e"),
          col("cost"))
        .join(best.select(col("word"), col("pos").as("ppos"),
          col("cost").as("pcost")), Seq("word", "ppos"))
        .groupBy(col("word"), col("e"))
        .agg(min(col("pcost") + col("cost")).as("cost"))
        .select(col("word"), col("e").as("pos"), col("cost"))
      best = snap(best.union(nxt))
      a = hi + 1
    }
    w.join(best.filter(col("pos") === length(col("word"))), Seq("word"))
      .select(col("word"), col("freq"),
        length(col("word")).cast(LongType).as("word_len"),
        col("cost").as("cost_bits"),
        (col("freq") * col("cost")).as("bits_total"))
  }

  /** One-row corpus compression card under the unigram vocabulary:
    * distinct words, corpus characters, total encoding cost, and
    * milli-bits-per-character — the number two tokenizer candidates are
    * compared by (the unigram twin of q138's BPE compression card). */
  def unigramCorpusCard(docs: DataFrame, maxPieceLen: Int = 4,
      topK: Int = 256, maxWordLen: Int = 12,
      reliable: Boolean = false, dpBatch: Int = 4): DataFrame =
    unigramSegmentCosts(docs, maxPieceLen, topK, maxWordLen, reliable,
      dpBatch)
      .agg(count(lit(1)).as("n_words"),
        sum(col("freq") * col("word_len")).as("total_chars"),
        sum(col("bits_total")).as("total_bits"))
      .select(col("n_words"), col("total_chars"), col("total_bits"),
        expr("(1000 * total_bits) DIV total_chars").as("bpc_milli"))

  /** Shared oracle CTE chain: vocabulary, edge DAG, and the DP unrolled
    * to `maxWordLen` rounds (the q139 fixed-unrolling convention),
    * ending in the per-word relation `seg`. */
  private def unigramSql(maxPieceLen: Int, topK: Int,
      maxWordLen: Int): String = {
    // AS MATERIALIZED on every DP round: DuckDB inlines plain CTEs, and
    // each b_j references b_{j-1} twice — un-materialized, the plan tree
    // doubles per round (2^maxWordLen copies of the vocabulary pipeline)
    val rounds = (1 to maxWordLen).map { j =>
      s"""b$j AS MATERIALIZED (SELECT * FROM b${j - 1}
          UNION ALL
          SELECT e.word, $j AS pos, MIN(p.cost + e.cost) AS cost
          FROM edges e JOIN b${j - 1} p
            ON p.word = e.word AND p.pos = e.s - 1
          WHERE e.e = $j
          GROUP BY e.word)"""
    }.mkString(",\n")
    s"""WITH w AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE length(word) > 0 GROUP BY word),
      g AS (SELECT substring(word, s, plen) AS piece, freq
            FROM (SELECT word, freq, s
                  FROM w, UNNEST(range(1, length(word) + 1)) AS ts(s)),
                 UNNEST(range(1, ${maxPieceLen + 1})) AS tp(plen)
            WHERE s + plen - 1 <= length(word)),
      cnts AS (SELECT piece, SUM(freq) AS cnt FROM g GROUP BY piece),
      tot AS (SELECT SUM(cnt) AS total FROM cnts),
      vr AS (SELECT piece, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
             FROM cnts),
      vc AS MATERIALIZED (SELECT piece,
               CAST(length(bin(total)) - length(bin(cnt)) AS BIGINT) AS cost
             FROM vr, tot WHERE rn <= $topK OR length(piece) = 1),
      edges AS MATERIALIZED (SELECT x.word, x.s, x.s + length(x.piece) - 1 AS e, v.cost
                FROM (SELECT word, s, substring(word, s, plen) AS piece
                      FROM (SELECT word, s
                            FROM w, UNNEST(range(1, length(word) + 1)) AS ts(s)),
                           UNNEST(range(1, ${maxPieceLen + 1})) AS tp(plen)
                      WHERE s + plen - 1 <= length(word)) x
                JOIN vc v ON v.piece = x.piece),
      b0 AS MATERIALIZED (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost FROM w),
      $rounds,
      seg AS (SELECT w.word, w.freq,
                CAST(length(w.word) AS BIGINT) AS word_len,
                b.cost AS cost_bits, w.freq * b.cost AS bits_total
              FROM w JOIN b$maxWordLen b
                ON b.word = w.word AND b.pos = length(w.word))"""
  }

  /** Oracle fixture of [[unigramSegmentCosts]] (pieces ≤ 4 chars, top-256
    * vocabulary, DP unrolled to 12 — the fixture's words are ≤ 8). */
  private val q180 = GQuery(
    "q180_unigram_segment",
    (s, dir) => unigramSegmentCosts(t(s, dir, "documents"))
      .orderBy(col("word")),
    Some(s"""${unigramSql(4, 256, 12)}
      SELECT word, freq, word_len, cost_bits, bits_total FROM seg
      ORDER BY word"""))

  /** Oracle fixture of [[unigramCorpusCard]]: the q180 chain aggregated
    * to the one-row compression card. */
  private val q181 = GQuery(
    "q181_unigram_card",
    (s, dir) => unigramCorpusCard(t(s, dir, "documents")),
    Some(s"""${unigramSql(4, 256, 12)}
      SELECT COUNT(*) AS n_words,
        CAST(SUM(freq * word_len) AS BIGINT) AS total_chars,
        CAST(SUM(bits_total) AS BIGINT) AS total_bits,
        (1000 * CAST(SUM(bits_total) AS BIGINT))
          // CAST(SUM(freq * word_len) AS BIGINT) AS bpc_milli
      FROM seg"""))

  val queries: Seq[GQuery] = Seq(q137, q138, q153, q180, q181, q200)
}
