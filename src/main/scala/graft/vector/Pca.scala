package graft.vector

import graft.{GraftFunctions, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Top-principal-component audit of the embedding cloud — the
  * cross-dimension health check [[Similarity]]'s per-dim `emb_dim_stats`
  * cannot see: a collapsed encoder (all variance on one axis) has healthy
  * per-dim stats but `explained_share` → 1, and an index built on it is
  * garbage. Run before ann_* index construction, alongside emb_outliers.
  *
  * Method: deterministic power iteration on the centered covariance,
  * seeded with the constant unit vector (1/√d per entry, exact in binary
  * for d = 64) — no RNG, so the oracle replays training bit-for-bit
  * (the ann_ivf_kmeans discipline; reference analog: the fixed-seed
  * review queries of /root/reference/audit/audit.go:127-199).
  *
  * Determinism: every embedding value is rounded ONCE at the source to
  * scale 6; every derived quantity is then exact — mean (rounded 6),
  * centered value (difference of two scale-6 values), per-row projection
  * s = Σ c·p (scale-12 products summed as DECIMAL — exact ⇒
  * order-independent, so Spark's sequential array fold and DuckDB's
  * unordered GROUP BY sum agree bit-for-bit), matrix-vector product
  * y = Σ s·c likewise. Only sqrt/divide run in DOUBLE, as single
  * identically-shaped expressions on both engines, rounded once.
  *
  * Scale (100 TB posture): NO shuffle ever carries a per-vector or
  * per-(vector,dim) row — the per-row projection is an array fold (zero
  * shuffle), and each round's y is ONE partial-aggregating groupBy
  * bounded at |dims| output rows; the iterate (a |dims|-row frame) is
  * broadcast back each round. The centered corpus (dims doubles/row, no
  * text) persists MEMORY_AND_DISK across the 3 rounds + variance pass.
  */
object Pca {

  private val Rounds = 3

  private def emb(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensureRegistered(s)
    Tables.embeddings(s, d)
  }

  /** Per-row projection s = Σ_d c_d·p_d as a zero-shuffle array fold:
    * exact scale-12 decimal terms, decimal accumulation (associative ⇒
    * order-free), rounded once in decimal space. */
  private def withProjection(cent: DataFrame, pArr: DataFrame): DataFrame =
    cent.crossJoin(broadcast(pArr))
      .withColumn("sdec",
        expr("""aggregate(
                 zip_with(c, p_arr, (a, b) -> cast(a * b as decimal(28,12))),
                 cast(0 as decimal(28,12)),
                 (acc, t) -> cast(acc + t as decimal(28,12)))"""))
      .withColumn("s", round(col("sdec"), 6).cast("double"))

  /** One power-iteration round: centered corpus × current direction →
    * un-normalized next direction y (|dims| rows). One corpus scan, one
    * |dims|-bounded shuffle. */
  private def powerRound(cent: DataFrame, pArr: DataFrame): DataFrame =
    withProjection(cent, pArr)
      .select(col("s"), posexplode(col("c")).as(Seq("pos", "cv")))
      .select((col("pos") + 1).cast("long").as("dim"),
        (col("cv") * col("s")).cast("decimal(28,12)").as("t"))
      .groupBy("dim")
      .agg(round(sum(col("t")), 6).cast("double").as("y"))

  /** ‖y‖² as an exact decimal-sum 1-row frame (q). */
  private def norm2(y: DataFrame): DataFrame =
    y.agg(sum((col("y") * col("y")).cast("decimal(28,12)")).cast("double").as("q"))

  /** y → unit-ish direction rounded to scale 6, as a 1-row array frame
    * (the broadcast side of the next round). */
  private def normalized(y: DataFrame, q: DataFrame): DataFrame =
    y.crossJoin(broadcast(q))
      .select(col("dim"), round(col("y") / sqrt(col("q")), 6).as("p"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, p))), t -> t.p)")
        .as("p_arr"))

  /** Oracle twin of one round: projection s, matrix-vector product y,
    * squared norm q, next direction p. Round 1 multiplies by the constant
    * seed; later rounds join the previous direction table on dim. */
  private def roundSql(i: Int): String = {
    val (pTerm, pJoin) =
      if (i == 1) ("CAST(0.125 AS DOUBLE)", "")
      else ("p.p", s" JOIN p${i - 1} p ON ce.dim = p.dim")
    s"""s$i AS MATERIALIZED (SELECT ce.vec_id,
       |  CAST(round(sum(CAST(ce.c * $pTerm AS DECIMAL(28,12))), 6) AS DOUBLE) AS s
       |  FROM ce$pJoin GROUP BY ce.vec_id),
       |y$i AS MATERIALIZED (SELECT ce.dim,
       |  CAST(round(sum(CAST(ce.c * s$i.s AS DECIMAL(28,12))), 6) AS DOUBLE) AS y
       |  FROM ce JOIN s$i ON ce.vec_id = s$i.vec_id GROUP BY ce.dim),
       |q$i AS (SELECT CAST(sum(CAST(y * y AS DECIMAL(28,12))) AS DOUBLE) AS q FROM y$i),
       |p$i AS (SELECT dim, round(y / sqrt((SELECT q FROM q$i)), 6) AS p FROM y$i)""".stripMargin
  }

  val embPcaPower: Q = Q.sql(
    "emb_pca_power", {
      val rounds = (1 to Rounds).map(roundSql).mkString(",\n")
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS v
         |  FROM embeddings),
         |nv AS (SELECT count(*) AS n FROM e),
         |u AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM e),
         |mu AS MATERIALIZED (SELECT CAST(dim AS BIGINT) AS dim,
         |    round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS m
         |  FROM u GROUP BY dim),
         |ce AS MATERIALIZED (SELECT u.vec_id, CAST(u.dim AS BIGINT) AS dim,
         |    u.x - mu.m AS c
         |  FROM u JOIN mu ON CAST(u.dim AS BIGINT) = mu.dim),
         |tot AS (SELECT CAST(sum(CAST(c * c AS DECIMAL(28,12))) AS DOUBLE) AS t FROM ce),
         |$rounds,
         |sf AS (SELECT ce.vec_id,
         |  CAST(round(sum(CAST(ce.c * p.p AS DECIMAL(28,12))), 6) AS DOUBLE) AS s
         |  FROM ce JOIN p$Rounds p ON ce.dim = p.dim GROUP BY ce.vec_id),
         |lam AS (SELECT CAST(sum(CAST(s * s AS DECIMAL(28,12))) AS DOUBLE) AS l FROM sf)
         |SELECT mu.dim, mu.m AS mu, p$Rounds.p AS loading,
         |  round((SELECT l FROM lam) / (SELECT n FROM nv), 6) AS lambda1,
         |  round((SELECT l FROM lam) / (SELECT t FROM tot), 6) AS explained_share
         |FROM mu JOIN p$Rounds USING (dim) ORDER BY mu.dim""".stripMargin
    }) { (s, d) =>
    val e0 = emb(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> round(cast(x as double), 6))").as("v"))
    val mu = e0.select(posexplode(col("v")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x"))
      .groupBy("dim")
      .agg(round(sum(col("x").cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("m"))
    val muArr = mu
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), t -> t.m)")
        .as("mu_arr"))
    // centered, text-free corpus: |dims| doubles per row, read by the
    // variance pass + every power round — spill-safe persist
    val cent = e0.crossJoin(broadcast(muArr))
      .select(col("vec_id"), expr("zip_with(v, mu_arr, (a, b) -> a - b)").as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = cent.select(explode(col("c")).as("cv"))
      .agg(sum((col("cv") * col("cv")).cast("decimal(28,12)")).cast("double").as("t"))
    val nv = e0.agg(count(lit(1)).as("n"))
    val seed = muArr.select(
      expr("transform(mu_arr, x -> cast(0.125 as double))").as("p_arr"))
    var pArr = seed
    var lastY: DataFrame = null
    var lastQ: DataFrame = null
    for (_ <- 1 to Rounds) {
      val y = powerRound(cent, pArr)
      val q = norm2(y)
      lastY = y; lastQ = q
      pArr = normalized(y, q)
    }
    val loadings = lastY.crossJoin(broadcast(lastQ))
      .select(col("dim"), round(col("y") / sqrt(col("q")), 6).as("loading"))
    // report the Rayleigh quotient OF THE PUBLISHED loading (one more
    // projection pass), not the previous iterate's norm — the released
    // numbers must describe the released direction
    val lam = withProjection(cent, pArr)
      .agg(sum((col("s") * col("s")).cast("decimal(28,12)")).cast("double").as("l"))
    mu.join(loadings, Seq("dim"))
      .crossJoin(broadcast(lam))
      .crossJoin(broadcast(nv))
      .crossJoin(broadcast(tot))
      .select(col("dim"), col("m").as("mu"), col("loading"),
        round(col("l") / col("n"), 6).as("lambda1"),
        round(col("l") / col("t"), 6).as("explained_share"))
      .orderBy("dim")
  }

  val all: Seq[Q] = Seq(embPcaPower)
}
