package graft

import org.apache.spark.sql.SparkSession

/** Batch plan/timing dump for a list of registered queries in ONE
  * session (dev tool; Explain's loop form — one JVM + one warm session
  * instead of one sbt launch per query).
  * Usage: runMain graft.ExplainAll <q1,q2,...> <outDir> [sfDir] [repeat] [suffix]
  * Writes <outDir>/<query>_<suffix>.txt containing the formatted plan,
  * and prints per-run wall times like Bench (toRdd.count of the planned
  * query, rebuilt per run).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 3) args(3).toInt else 2
    val suffix = if (args.length > 4) args(4) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.widenReads", "true")
      .config("spark.graft.cacheTables", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // warm-up outside any measurement (same as Bench)
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[explainall] $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
