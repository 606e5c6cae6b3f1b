package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.fastMd5

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("fastMd5 is value-identical to built-in md5 (codegen path)") {
    val df = (Seq("", "a", "hello world", "äöü unicode ✓") ++
      (0 until 200).map(i => s"doc $i payload")).toDF("s")
    val bad = df.filter(fastMd5(col("s")) =!= md5(col("s").cast("binary"))).count()
    assert(bad === 0)
  }

  test("fastMd5 is value-identical in interpreted mode") {
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = Seq("x", "interpreted row", "").toDF("s")
      val r = df.select(fastMd5(col("s")).as("f"), md5(col("s").cast("binary")).as("b"))
        .collect()
      r.foreach(row => assert(row.getString(0) === row.getString(1)))
    }
  }

  test("graft_md5 is callable from raw SQL after extensions registration") {
    graft.functions.GraftExtensions.registerOn(spark)
    val r = spark.sql(
      "SELECT graft_md5('abc') AS f, md5(cast('abc' AS BINARY)) AS b").head()
    assert(r.getString(0) === r.getString(1))
    // the extensions class itself applies cleanly (spark.sql.extensions path)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }

  test("fastMd5 propagates null") {
    val r = rows(strDf("s", Seq(None)).select(fastMd5(col("s"))))
    assert(r.head.head === null)
  }

  private def withSqlConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
