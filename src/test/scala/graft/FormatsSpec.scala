package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-format coverage beyond parquet/CSV/JSON: ORC round-trip
  * (the other columnar format Spark ships natively), the binaryFile
  * source (how raw image/audio payloads enter a multimodal pipeline
  * before ops/multimodal takes over), and the line-text source.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trip preserves rows, schema and values") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src.write.mode("overwrite").orc(s"$dir/docs")
    val back = spark.read.orc(s"$dir/docs")
    assert(back.schema === src.schema)
    // content digest: same rows regardless of file/partition layout
    def digest(df: org.apache.spark.sql.DataFrame): String =
      df.select(md5(concat_ws("\u0000", df.columns.map(col): _*)).as("h"))
        .agg(md5(concat_ws("", sort_array(collect_list("h")))))
        .collect().head.getString(0)
    assert(digest(back) === digest(src))
  }

  test("ORC predicate pushdown reaches the scan") {
    val dir = Files.createTempDirectory("graft-orc2").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.mode("overwrite").orc(s"$dir/orders")
    val plan = spark.read.orc(s"$dir/orders")
      .filter(col("o_custkey") === 42L).select("o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), " +
      "EqualTo(o_custkey,42)]"), s"pushdown missing in:\n$plan")
  }

  test("binaryFile source: opaque payloads with typed metadata") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.img"), Array[Byte](9, 8, 7))
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img").load(dir.toString)
    assert(df.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    val byName = df.select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(byName("a.img") === ((4L, Seq[Byte](1, 2, 3, 4))))
    assert(byName("b.img") === ((3L, Seq[Byte](9, 8, 7))))
  }

  test("text source reads lines; JSONL written by the engine reads back") {
    val dir = Files.createTempDirectory("graft-text").toString
    Seq((1L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "text")
      .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
      .write.mode("overwrite").text(s"$dir/jsonl")
    val lines = spark.read.text(s"$dir/jsonl")
    assert(lines.count() === 2)
    val back = spark.read.json(s"$dir/jsonl")
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(back.toSeq === Seq((1L, "alpha"), (2L, "beta")))
  }

  test("XML source (built-in, Spark 4) round-trips rows by rowTag") {
    val dir = Files.createTempDirectory("graft-xml").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src.write.mode("overwrite").format("xml")
      .option("rootTag", "nations").option("rowTag", "nation")
      .save(s"$dir/nations")
    val back = spark.read.format("xml").option("rowTag", "nation")
      .load(s"$dir/nations")
      .select(src.columns.map(col): _*) // column order, not inferred order
    assert(back.count() === src.count())
    val a = back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = src.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("from_xml parses embedded XML strings against a schema") {
    val xml = Seq(
      (1L, "<doc><lang>en</lang><n>42</n></doc>"),
      (2L, "<doc><lang>de</lang><n>7</n></doc>")).toDF("id", "payload")
    val parsed = xml.select(col("id"),
        from_xml(col("payload"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "lang STRING, n BIGINT")).as("p"))
      .select(col("id"), col("p.lang"), col("p.n"))
      .orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(parsed === Seq(Seq(1L, "en", 42L), Seq(2L, "de", 7L)))
  }
}
