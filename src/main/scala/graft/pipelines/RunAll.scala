package graft.pipelines

import org.apache.spark.sql.SparkSession

/** End-to-end pipeline runner: executes all eight reference-shaped ETL
  * jobs over a directory of extracted CSVs and writes the warehouse
  * (append-history + replace-latest parquet tables), reproducing one
  * daily cron tick of the reference system.
  *
  * Usage: runMain graft.pipelines.RunAll <inputDir> <warehouseDir> <runDate>
  * where inputDir holds the reference-shaped CSVs (see FIXTURES.md §B;
  * src/test/resources has a complete sample set).
  */
object RunAll {
  def main(args: Array[String]): Unit = {
    val Array(inputDir, outDir, runDate) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val alerts = scala.collection.mutable.ListBuffer.empty[String]
    val alert: Pipelines.Alert = m => { alerts += m; System.err.println(s"[alert] $m") }

    def in(name: String) = s"$inputDir/$name"

    // E1 Audisto (append-history)
    Pipelines.appendDaily(
      Pipelines.audisto(spark.read.option("header", true)
        .csv(in("audisto_pages_chunk_0.csv"), in("audisto_pages_chunk_1.csv")),
        runDate),
      s"$outDir/audisto_pages")

    // E2 Screaming Frog HTML (K3: slim append + content append + content
    // replace) — persist across the three sinks, release after
    val (slim, content) = Pipelines.sfHtml(
      Pipelines.readCsv(spark, in("internal_html.csv")), runDate, alert = alert)
    slim.persist(); content.persist()
    try {
      Pipelines.appendDaily(slim, s"$outDir/html_slim")
      Pipelines.appendDaily(content, s"$outDir/content_history")
      Pipelines.replaceTable(content, s"$outDir/content_current")
    } finally { slim.unpersist(); content.unpersist() }

    // E3 Midoco bookings (append)
    Pipelines.appendDaily(
      Pipelines.midoco(Pipelines.readCsvLatin1(spark, in("midoco_report.csv")),
        runDate),
      s"$outDir/bookings")

    // Link graph (replace), orphans/backlinks/images (append), hreflang (replace)
    Pipelines.replaceTable(
      Pipelines.inlinks(Pipelines.readCsv(spark, in("all_inlinks.csv")), runDate),
      s"$outDir/inlinks")
    Pipelines.appendDaily(
      Pipelines.orphans(
        Pipelines.readCsv(spark, in("search_console_orphan_urls.csv")),
        Pipelines.readCsv(spark, in("sitemaps_orphan_urls.csv")), runDate),
      s"$outDir/orphans")
    Pipelines.appendDaily(
      Pipelines.backlinks(Pipelines.readCsv(spark, in("link_metrics_all.csv")),
        runDate),
      s"$outDir/backlinks")
    Pipelines.replaceTable(
      Pipelines.hreflang(Pipelines.readCsv(spark,
        in("hreflang_missing_return_links.csv")), runDate),
      s"$outDir/hreflang_missing")

    println(s"[runall] wrote warehouse to $outDir (alerts: ${alerts.size})")
    spark.stop()
  }
}
