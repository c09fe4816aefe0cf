package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Tokenizer-design analytics over the `documents` corpus — the
  * measurements a team runs BEFORE training a subword tokenizer on a
  * 100 TB corpus: the first BPE merge table (which adjacent character
  * pairs dominate), and the fertility profile (how many subword tokens a
  * word costs per language/source, the cost model for context-window
  * budgeting).
  *
  * Scale posture shared by both ops: every stage is a per-row map /
  * explode followed by a partial-aggregating groupBy whose key space is
  * BOUNDED (≤ |langs|·26² pairs; |lang × source| cells) — the shuffle
  * carries merged counts, never corpus-sized rows, and the only window
  * runs on the bounded aggregate. No join, no broadcast, no skew risk:
  * this is the same shape at sf0.001 and at 100 TB.
  */
object TokenizerOps {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** First-round BPE merge candidates: the top-20 adjacent character
    * pairs inside letter-run words, per language. This is exactly the
    * statistic byte-pair-encoding training maximizes on its first merge
    * round; ranked per language because merge tables are usually trained
    * per-corpus-slice before being unioned.
    *
    * Determinism: ties in pair count are broken by the pair string, so
    * the rank is a total order in both engines. */
  val bpePairStats: Q = Q.sql(
    "bpe_pair_stats",
    """WITH w AS (SELECT lang,
      |    unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
      |  FROM documents),
      |p0 AS (SELECT lang, word,
      |    unnest(generate_series(1, length(word) - 1)) AS i
      |  FROM w WHERE length(word) >= 2),
      |p AS (SELECT lang, substr(word, CAST(i AS INT), 2) AS pair FROM p0),
      |c AS (SELECT lang, pair, count(*) AS cnt FROM p GROUP BY 1, 2),
      |r AS (SELECT lang, pair, cnt,
      |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, pair) AS rk
      |  FROM c)
      |SELECT lang, rk, pair, cnt FROM r
      |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin) { (s, d) =>
    val pairs = docs(s, d)
      .select(col("lang"),
        explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(col("lang"),
        explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
      .groupBy("lang", "pair").agg(count(lit(1)).as("cnt"))
    // the window runs on the ≤ |langs|·26² aggregate, never the corpus
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("pair"))
    pairs.select(col("lang"), row_number().over(w).as("rk"),
        col("pair"), col("cnt"))
      .filter(col("rk") <= 20)
      .orderBy("lang", "rk")
  }

  /** Tokenizer fertility profile per (lang, source): subword tokens per
    * whitespace word and characters per subword token, under the engine's
    * BPE-style regex pre-tokenization (letter runs / digit runs / single
    * marks — the token_regex split pass). High fertility slices are the
    * expensive ones in a fixed context window; this is the per-slice cost
    * table a mixing plan consumes next to corpus_mix.
    *
    * All sums are integers (exact, order-independent); ratios are derived
    * once at the output edge. */
  val tokFertility: Q = Q.sql(
    "tok_fertility",
    """WITH f AS (
      |  SELECT lang, source, n_chars,
      |    len(str_split(text, ' ')) AS n_words,
      |    len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tokens
      |  FROM documents)
      |SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_words) AS BIGINT) AS n_words,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  round(1.0 * sum(n_tokens) / sum(n_words), 4) AS tokens_per_word,
      |  round(1.0 * sum(n_chars) / sum(n_tokens), 4) AS chars_per_token
      |FROM f GROUP BY 1, 2 ORDER BY lang, source""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("lang"), col("source"), col("n_chars"),
        expr("size(split(text, ' '))").as("n_words"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .as("n_tokens"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"),
        round(lit(1.0) * col("n_tokens") / col("n_words"), 4)
          .as("tokens_per_word"),
        round(lit(1.0) * col("n_chars") / col("n_tokens"), 4)
          .as("chars_per_token"))
      .orderBy("lang", "source")
  }

  val all: Seq[Q] = Seq(bpePairStats, tokFertility)
}
