package graft

/** Single-query fresh-JVM bench: cold = rep 1 (includes session+JIT
  * warmup), warm = min of later reps. Used by tools/bench_iso.py and
  * tools/bench_subset.py for contention-free numbers. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-bench-one", cpus)
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // Between-reps hygiene, untimed: drop cached frames, then nudge the
      // ContextCleaner so the previous rep's shuffle files are deleted —
      // without this, shuffle-heavy ops pay rep N-1's disk residue in
      // rep N and "warm" reads SLOWER than cold (seen at sf1 on the
      // dedup closure family: 34 s cold / 58 s "warm").
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
      dt
    }
    println(s"""{"query":"$name","sf":"$sfDir","times":[${times.map(t => f"$t%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
