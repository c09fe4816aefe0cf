package graft

/** Per-query timing harness for plan iteration — `Bench` for a handful of
  * named queries: runs each twice (cold + warm) against a given sf dir and
  * prints both, so a plan change's effect is visible without paying the
  * full 155-query sweep. Usage:
  *   tools/run_graft.sh graft.TimeQueries <sfDir> <name> [name...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-time", cpus)
    for (name <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      println(f"[time] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
