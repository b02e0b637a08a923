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
  private def learn(docs: DataFrame, rounds: Int, reliable: Boolean,
      batch: Int = 1): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 100000,
      s"rounds must be in [1, 100000], got $rounds")
    require(batch >= 1 && batch <= 256,
      s"batch must be in [1, 256], got $batch")
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    var words = snap(wordTable(docs))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var done = 0
    while (done < rounds) {
      val want = math.min(batch, rounds - done)
      val ts = split(col("sym"), " ")
      // collect enough candidates to skip over conflict chains; a
      // shorter list than the limit just means fewer pairs exist
      val cand = words
        .filter(size(ts) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(ts, lit(1), size(ts) - 1),
          slice(ts, lit(2), size(ts) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l"), col("r"))
        .limit(4 * want + 16).collect()
      if (cand.isEmpty) throw new IllegalStateException(
        s"BPE vocabulary has no adjacent pairs left after $done merges; " +
          s"asked for $rounds — lower rounds or grow the corpus")
      val used = scala.collection.mutable.Set.empty[String]
      val kept = Seq.newBuilder[(String, String, Long)]
      var n = 0
      val it = cand.iterator
      while (n < want && it.hasNext) {
        val row = it.next()
        val l = row.getString(0); val r = row.getString(1)
        val syms = Seq(l, r, l + r)
        if (!syms.exists(used.contains)) {
          used ++= syms
          kept += ((l, r, row.getLong(2)))
          n += 1
        }
      }
      val sel = kept.result()
      sel.zipWithIndex.foreach { case ((l, r, pf), i) =>
        merges += ((done + i + 1, l, r, pf))
      }
      words = snap(words.withColumn("sym",
        mergeFold(col("sym"), sel.map { case (l, r, _) => (l, r) })))
      done += sel.size
    }
    (merges.result(), words)
  }

  /** The learned merge table: one row per merge with the winning pair,
    * the merged symbol, and the pair's corpus frequency at merge time
    * (batch-time frequency when `batch > 1`). */
  def bpeMerges(docs: DataFrame, rounds: Int,
      reliable: Boolean = false, batch: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, rounds, reliable, batch)._1
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
      """w AS (SELECT word, COUNT(*) AS freq FROM
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
      """w AS (SELECT word, COUNT(*) AS freq FROM
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

  val queries: Seq[GQuery] = Seq(q137, q138, q153)
}
