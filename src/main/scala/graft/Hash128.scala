package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 128-bit content keys for the duplicate-collapse discipline (SURVEY
  * §4). The collapse family (distinct-text fold, LM term/gram dictionary
  * ids, span folds) used 8-byte xxhash64 keys through round 10; at true
  * web scale (1e9+ distinct texts in a 100 TB corpus) the 64-bit
  * birthday bound reaches ~3%, and a collision silently merges two
  * texts' model counts — the engine's one silent-corruption design
  * point. This widens every collapse key to a 128-bit fold: two
  * independent xxhash64 lanes packed in a struct. Lane 2 re-keys the
  * hash's internal state by folding a fixed 8-byte salt ahead of the
  * payload, so a simultaneous collision in both lanes is a ~2^-128
  * event per pair (vs 2^-64) — negligible past any plausible corpus.
  *
  * A single struct<h1,h2> column (rather than two loose columns) keeps
  * every call site's groupBy/join/min/max shape unchanged: Spark structs
  * hash, compare and order field-wise, so the key still rides exchanges
  * as one fixed-width 16-byte value and stays inside whole-stage
  * codegen (xxhash64 and struct both codegen).
  */
object Hash128 {

  /** Golden-ratio salt (2^64/φ) — any fixed odd constant works; what
    * matters is that lane 2 hashes a DIFFERENT byte stream. */
  private val Salt = 0x9e3779b97f4a7c15L

  /** 128-bit key over one or more columns — drop-in for
    * `xxhash64(cols…)` wherever the hash is a pure content key
    * (grouping / joining), never published. */
  def key128(cols: Column*): Column =
    struct(
      xxhash64(cols: _*).as("h1"),
      xxhash64(lit(Salt) +: cols: _*).as("h2"))
}
