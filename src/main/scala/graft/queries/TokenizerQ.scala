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
  * vocabulary-sized aggregation, one driver-collected row (the argmax —
  * bounded traffic, like `kmeansCentroids`' centroid collect), and one
  * vocabulary-sized codegen'd map (the fold). Lineage is cut per round
  * (`localCheckpoint`, or durable `checkpoint` with `reliable = true`,
  * the [[TextQ.connectedComponents]] pattern) so plans don't grow with
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

  /** Greedy leftmost-first merge of adjacent pair (l, r) in a
    * space-separated symbol string, as a single codegen'd fold: append
    * each symbol to the accumulator, except that `r` arriving while the
    * accumulator ends in token `l` replaces that token with the merged
    * `l+r` — which cannot itself be re-consumed this round (it no longer
    * equals `l` unless l = r = l+r, impossible for nonempty symbols). */
  private def mergeFold(sym: Column, l: String, r: String): Column = {
    val syms = split(sym, " ")
    val step = (acc: Column, x: Column) => {
      val accSyms = split(acc, " ")
      when(x === lit(r) && element_at(accSyms, -1) === lit(l),
        array_join(
          concat(slice(accSyms, lit(1), size(accSyms) - 1), array(lit(l + r))),
          " "))
        .otherwise(concat(acc, lit(" "), x))
    }
    when(size(syms) < 2, sym)
      .otherwise(aggregate(
        slice(syms, lit(2), size(syms) - 1), element_at(syms, 1), step))
  }

  /** Test seam: [[mergeFold]] exposed for the property spec (which
    * cross-checks it against a naive imperative greedy merge). */
  private[graft] def testMergeFold(sym: Column, l: String, r: String): Column =
    mergeFold(sym, l, r)

  /** Run `rounds` merge rounds; returns the merge list and the final
    * (word, freq, sym) table. Fails loudly if the vocabulary runs out of
    * adjacent pairs before `rounds` merges — silently returning fewer
    * would diverge from the oracle's fixed unrolling and from what the
    * caller asked a tokenizer budget for. */
  private def learn(docs: DataFrame, rounds: Int, reliable: Boolean)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 4096,
      s"rounds must be in [1, 4096], got $rounds")
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    var words = snap(wordTable(docs))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rd <- 1 to rounds) {
      val ts = split(col("sym"), " ")
      val best = words
        .filter(size(ts) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(ts, lit(1), size(ts) - 1),
          slice(ts, lit(2), size(ts) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) throw new IllegalStateException(
        s"BPE vocabulary has no adjacent pairs left after ${rd - 1} merges; " +
          s"asked for $rounds — lower rounds or grow the corpus")
      val l = best(0).getString(0)
      val r = best(0).getString(1)
      merges += ((rd, l, r, best(0).getLong(2)))
      words = snap(words.withColumn("sym", mergeFold(col("sym"), l, r)))
    }
    (merges.result(), words)
  }

  /** The learned merge table: one row per round with the winning pair,
    * the merged symbol, and the pair's corpus frequency at merge time. */
  def bpeMerges(docs: DataFrame, rounds: Int,
      reliable: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, rounds, reliable)._1
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
      reliable: Boolean = false): DataFrame = {
    val seg = learn(docs, rounds, reliable)._2
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

  val queries: Seq[GQuery] = Seq(q137, q138)
}
