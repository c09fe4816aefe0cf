package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator of the engine: a Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract (driver correctness gate): result column names must match the
  * oracle exactly; results must be deterministically ordered; double
  * aggregates are rounded on both sides; timestamps are emitted as
  * formatted strings or DATEs (never raw TIMESTAMP, for tz safety).
  *
  * Ops without an oracle (streaming replays, sketch ops whose error
  * bounds are probabilistic) carry `spec` — the name of the ScalaTest
  * suite that verifies their semantics — so the correctness artifact is
  * self-describing: a `no_oracle` entry points at its verification
  * instead of reading as an unchecked row count.
  *
  * `scaleOracle`: an OPTIONAL second DuckDB formulation of the same
  * result for the replicated scale gates (sf10's 100x twinning). The
  * primary oracle stays the NAIVE doc-level shape — maximally
  * independent of the Spark plan — but for the closure/all-pairs family
  * that shape is deliberately quadratic in duplicate-group size and
  * OOMs single-box DuckDB at 100x. The scale twin applies the
  * duplicate-collapse discipline (distinct-content groups + multiplicity
  * weights) INSIDE SQL, so the 100x gate hash-checks these ops instead
  * of trusting sf1. Both formulations run at sf0.01/sf1 (where the
  * naive one is feasible), pinning naive ≡ collapsed ≡ Spark.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    spec: Option[String] = None,
    scaleOracle: Option[String] = None)

object Q {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def sqlDual(name: String, oracle: String, scaleOracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle), None, Some(scaleOracle))
  def rowsOnly(name: String, spec: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, Some(spec))
}
