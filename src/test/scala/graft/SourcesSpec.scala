package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Paginated
import graft.ops.Text

class WebhookSpec extends AnyFunSuite {
  import graft.sources.Webhook

  test("K4: posts the reference-shaped message card, returns HTTP status") {
    val received = new java.util.concurrent.atomic.AtomicReference[String]()
    val ctype = new java.util.concurrent.atomic.AtomicReference[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", exchange => {
      received.set(new String(
        exchange.getRequestBody.readAllBytes(), "UTF-8"))
      ctype.set(exchange.getRequestHeaders.getFirst("Content-Type"))
      exchange.sendResponseHeaders(200, -1)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      val status = Webhook(url).send("Issue raised", "line1\nline2 \"x\"")
      assert(status === 200)
      assert(ctype.get() === "application/json")
      val body = received.get()
      assert(body.contains("\"summary\":\"Issue raised\""))
      assert(body.contains("\"activityTitle\":\"Issue raised\""))
      assert(body.contains("\"activitySubtitle\":\"line1\\nline2 \\\"x\\\"\""))
      assert(body.contains("\"themeColor\":\"000000\""))

      // the Alert-hook adapter fires the same post
      Webhook(url).alert("T")("content")
      assert(received.get().contains("\"activitySubtitle\":\"content\""))
    } finally server.stop(0)
  }

  test("K4: unreachable webhook returns -1, never throws (alert-and-continue)") {
    // loopback port 1: nothing listens there, so the connect is refused
    // instantly with no network egress involved
    val w = Webhook("http://127.0.0.1:1/hook",
      timeout = java.time.Duration.ofMillis(200))
    assert(w.send("t", "c") === -1)
  }
}

class PaginatedSpec extends AnyFunSuite {

  test("chunkSpecs: ceil paging with a short final chunk (C15)") {
    val specs = Paginated.chunkSpecs(250, 100)
    assert(specs.map(s => (s.offset, s.limit)) ===
      Seq((0L, 100L), (100L, 100L), (200L, 50L)))
    assert(Paginated.chunkSpecs(300, 100).length === 3)
    assert(Paginated.chunkSpecs(0, 100).isEmpty)
  }

  test("statusGate alerts on non-200 and reports failure (V1)") {
    var alerts = List.empty[String]
    assert(Paginated.statusGate(200, "probe", m => alerts ::= m))
    assert(!Paginated.statusGate(503, "probe", m => alerts ::= m))
    assert(alerts === List("probe returned HTTP 503"))
  }

  test("fetchAll: retry then skip failing chunk, keep the rest (V3)") {
    var alerts = List.empty[String]
    var attempts = Map.empty[Int, Int].withDefaultValue(0)
    val result = Paginated.fetchAll[Long](
      total = 250, chunkSize = 100,
      fetch = spec => {
        attempts += spec.index -> (attempts(spec.index) + 1)
        if (spec.index == 1) Left("boom")
        else Right(spec.offset until (spec.offset + spec.limit))
      },
      alert = m => alerts ::= m,
      retriesPerChunk = 2)
    assert(result.rows.length === 150) // chunks 0 and 2
    assert(result.skippedChunks.map(_.index) === Seq(1))
    assert(attempts(1) === 3) // initial + 2 retries
    assert(alerts.head.contains("chunk 1 failed"))
  }

  test("fetchAll: transient failure recovers within retry budget") {
    var calls = 0
    val result = Paginated.fetchAll[Int](
      total = 100, chunkSize = 100,
      fetch = _ => { calls += 1; if (calls < 2) Left("flaky") else Right(Seq(1, 2)) },
      retriesPerChunk = 2)
    assert(result.rows === Seq(1, 2))
    assert(result.skippedChunks.isEmpty)
  }
}

class ChunkedSourceSpec extends SparkSpec {

  test("DSv2 chunked source: one input partition per chunk, exact rows") {
    val df = spark.read.format("graft.sources.chunked")
      .option("total", "250").option("chunkSize", "100").load()
    assert(df.rdd.getNumPartitions === 3) // ceil(250/100) chunks
    assert(df.count() === 250)
    assert(df.select("id").distinct().count() === 250)
    val byChunk = df.groupBy("chunk").count().orderBy("chunk")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(byChunk === Seq((0, 100L), (1, 100L), (2, 50L)))
    // filters/pruning compose like any scan
    assert(df.filter(col("id") >= 200).count() === 50)
  }
}

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("fleschReadingEase: simple text scores high, empty scores 0") {
    val df = Seq(
      "The cat sat. The dog ran.", // short words, short sentences -> high
      "Extraordinarily sophisticated considerations notwithstanding.",
      "").toDF("t")
    val scores = rows(df.select(round(Text.fleschReadingEase(col("t")), 2)))
      .flatten.map(_.asInstanceOf[Double])
    assert(scores(0) > 90.0)
    assert(scores(1) < scores(0)) // polysyllabic words lower the score
    assert(scores(2) === 0.0)
  }

  test("sentence and syllable counts behave on edge cases") {
    val df = Seq(("no terminal punctuation here", "why?! two sentences. three")).toDF("a", "b")
    val r = rows(df.select(Text.sentenceCount(col("a")),
      Text.sentenceCount(col("b")), Text.syllableCount(col("a")))).head
    assert(r(0) === 1) // floored at 1
    assert(r(1) === 2) // "?!" is one run, "." is another
    assert(r(2) === 9) // no-o-ter-mi-nal-punc-tua-tion-here vowel groups
  }
}
