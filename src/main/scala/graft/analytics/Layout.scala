package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout planning: which sort/cluster key should a 100 TB fact
  * table be written under?
  *
  * At cluster scale the dominant query cost is the SCAN, and the scan is
  * bounded by file-level zone maps (parquet row-group min/max): a
  * predicate prunes exactly the files whose key range misses it, so the
  * layout decision — sort by date, sort by key, or Z-ORDER both — decides
  * whether a selective query reads 2% or 100% of the table. This module
  * simulates that decision before any data is rewritten.
  */
object Layout {

  private val Files = 50 // simulated file count per layout
  private val GridBits = 5 // 32×32 z-grid

  /** Bit-interleave of two 5-bit grid coordinates (x in the odd bits) —
    * integer arithmetic only, valid verbatim in both dialects. */
  private def zExprSql(gx: String, gy: String): String =
    (0 until GridBits).map { i =>
      val px = 1L << (2 * i + 1)
      val py = 1L << (2 * i)
      s"(($gx // ${1 << i}) % 2) * $px + (($gy // ${1 << i}) % 2) * $py"
    }.mkString("(", " + ", ")")

  /** Spark twin — `div` for integer division, same bit arithmetic. */
  private def zExprSpark(gx: String, gy: String): String =
    (0 until GridBits).map { i =>
      val px = 1L << (2 * i + 1)
      val py = 1L << (2 * i)
      s"(($gx div ${1 << i}) % 2) * ${px}L + (($gy div ${1 << i}) % 2) * ${py}L"
    }.mkString("(", " + ", ")")

  /** Zone-map pruning simulator: assigns every lineitem row to its file
    * under three candidate layouts — `date_sorted` (range-partitioned on
    * ship date), `part_sorted` (on part key), `zorder` (bit-interleaved
    * date×part grid) — and replays a 3-predicate workload (a ship-date
    * week, the first 1% of the part-key range, their conjunction)
    * against each, reporting how many files a min/max zone map would
    * scan. The verdict this table gives is the classic one: single-key
    * sorts prune their own dimension perfectly and the other not at
    * all; Z-ORDER prunes BOTH to ~√ of single-key quality — the reason
    * multi-predicate workloads cluster by z-value.
    *
    * Scale: the key-range frame is a 1-row broadcast; file assignment is
    * a per-row projection; the only shuffle is ONE partial-agg groupBy
    * bounded at |layouts|×|files| = 150 cells (any-match flags combine
    * map-side); the 3×3 report explodes from that aggregate. The
    * simulation IS the plan: writing the table with
    * `repartitionByRange(z)` realizes exactly the zorder row→file map
    * measured here. */
  val layoutPruneSim: Q = {
    val zDuck = zExprSql("gx", "gy")
    val zSpark = zExprSpark("gx", "gy")
    Q.sql(
      "layout_prune_sim",
      s"""WITH li AS (SELECT CAST(l_shipdate AS DATE) AS sd, l_partkey AS p
         |       FROM lineitem),
         |mm AS (SELECT min(sd) AS dmin, max(sd) AS dmax,
         |         min(p) AS pmin, max(p) AS pmax FROM li),
         |f AS (
         |  SELECT
         |    date_diff('day', dmin, sd) AS d,
         |    CAST(date_diff('day', dmin, dmax) + 1 AS BIGINT) AS dspan,
         |    p - pmin AS pk, CAST(pmax - pmin + 1 AS BIGINT) AS pspan,
         |    CASE WHEN sd >= DATE '1997-03-01' AND sd < DATE '1997-03-08'
         |      THEN 1 ELSE 0 END AS m_date,
         |    CASE WHEN (p - pmin) * 100 // (pmax - pmin + 1) = 0
         |      THEN 1 ELSE 0 END AS m_part
         |  FROM li CROSS JOIN mm),
         |g AS (
         |  SELECT (d * $Files) // dspan AS file_date,
         |    (pk * $Files) // pspan AS file_part,
         |    (d * ${1 << GridBits}) // dspan AS gx,
         |    (pk * ${1 << GridBits}) // pspan AS gy,
         |    m_date, m_part, m_date * m_part AS m_both
         |  FROM f),
         |z AS (SELECT file_date, file_part,
         |        ($zDuck * $Files) // ${1L << (2 * GridBits)} AS file_z,
         |        m_date, m_part, m_both
         |      FROM g),
         |lf AS (
         |  SELECT 'date_sorted' AS layout, file_date AS file,
         |    m_date, m_part, m_both FROM z
         |  UNION ALL SELECT 'part_sorted', file_part, m_date, m_part, m_both FROM z
         |  UNION ALL SELECT 'zorder', file_z, m_date, m_part, m_both FROM z),
         |agg AS (
         |  SELECT layout, file, count(*) AS n_rows,
         |    max(m_date) AS h_date, max(m_part) AS h_part, max(m_both) AS h_both
         |  FROM lf GROUP BY 1, 2),
         |rep AS (
         |  SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
         |    CAST(sum(h_date) AS BIGINT) AS s_date,
         |    CAST(sum(h_part) AS BIGINT) AS s_part,
         |    CAST(sum(h_both) AS BIGINT) AS s_both
         |  FROM agg GROUP BY 1),
         |out AS (
         |  SELECT layout, 'date_week' AS predicate, n_files,
         |    s_date AS files_scanned FROM rep
         |  UNION ALL SELECT layout, 'part_band', n_files, s_part FROM rep
         |  UNION ALL SELECT layout, 'date_and_part', n_files, s_both FROM rep)
         |SELECT layout, predicate, n_files, files_scanned,
         |  round(1.0 * files_scanned / n_files, 4) AS scan_ratio
         |FROM out ORDER BY layout, predicate""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(to_date(col("l_shipdate")).as("sd"), col("l_partkey").as("p"))
      val mm = li.agg(min("sd").as("dmin"), max("sd").as("dmax"),
        min("p").as("pmin"), max("p").as("pmax"))
      val f = li.crossJoin(broadcast(mm))
        .select(
          datediff(col("sd"), col("dmin")).cast("long").as("d"),
          (datediff(col("dmax"), col("dmin")) + 1).cast("long").as("dspan"),
          (col("p") - col("pmin")).as("pk"),
          (col("pmax") - col("pmin") + 1).as("pspan"),
          when(col("sd") >= lit("1997-03-01") && col("sd") < lit("1997-03-08"), 1)
            .otherwise(0).as("m_date"),
          when(expr("(p - pmin) * 100 div (pmax - pmin + 1)") === 0, 1)
            .otherwise(0).as("m_part"))
      val g = f.select(
        expr(s"(d * $Files) div dspan").as("file_date"),
        expr(s"(pk * $Files) div pspan").as("file_part"),
        expr(s"(d * ${1 << GridBits}) div dspan").as("gx"),
        expr(s"(pk * ${1 << GridBits}) div pspan").as("gy"),
        col("m_date"), col("m_part"),
        (col("m_date") * col("m_part")).as("m_both"))
      val z = g.select(col("file_date"), col("file_part"),
        expr(s"($zSpark * $Files) div ${1L << (2 * GridBits)}").as("file_z"),
        col("m_date"), col("m_part"), col("m_both"))
      // explode, not union: a 3-branch union would re-run the scan and
      // the key-frame crossJoin once per layout — the explode keeps the
      // whole simulation to ONE corpus pass
      val lf = z.select(explode(array(
          struct(lit("date_sorted").as("layout"), col("file_date").as("file")),
          struct(lit("part_sorted").as("layout"), col("file_part").as("file")),
          struct(lit("zorder").as("layout"), col("file_z").as("file")))).as("lf"),
          col("m_date"), col("m_part"), col("m_both"))
        .select(col("lf.layout").as("layout"), col("lf.file").as("file"),
          col("m_date"), col("m_part"), col("m_both"))
      val agg = lf.groupBy("layout", "file")
        .agg(max("m_date").as("h_date"), max("m_part").as("h_part"),
          max("m_both").as("h_both"))
      val rep = agg.groupBy("layout")
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum("h_date").cast("long").as("s_date"),
          sum("h_part").cast("long").as("s_part"),
          sum("h_both").cast("long").as("s_both"))
      // same explode trick on the 3-row report side
      val out = rep.select(col("layout"), col("n_files"),
          explode(array(
            struct(lit("date_week").as("predicate"), col("s_date").as("files_scanned")),
            struct(lit("part_band").as("predicate"), col("s_part").as("files_scanned")),
            struct(lit("date_and_part").as("predicate"), col("s_both").as("files_scanned"))))
            .as("p"))
        .select(col("layout"), col("p.predicate").as("predicate"),
          col("n_files"), col("p.files_scanned").as("files_scanned"))
      out.select(col("layout"), col("predicate"), col("n_files"),
          col("files_scanned"),
          round(lit(1.0) * col("files_scanned") / col("n_files"), 4)
            .as("scan_ratio"))
        .orderBy("layout", "predicate")
    }
  }

  val all: Seq[Q] = Seq(layoutPruneSim)
}
