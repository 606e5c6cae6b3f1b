package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.pipelines.Pipelines
import graft.sources.Fetchers
import graft.sources.Fetchers.{HttpFolderFetcher, HttpMailbox, MailQuery}

/** S6/S7 connector specs: in-process HTTP servers stand in for the
  * remote folder (Drive-shaped) and mailbox gateway (IMAP-shaped), and
  * the fetched files drive the E2/E3 pipelines END TO END — the full
  * extract→transform path the reference runs, with auth-failure → alert
  * (V1) parity. */
class FetchersSpec extends SparkSpec {

  private def res(name: String): Array[Byte] =
    Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/" + name).getPath))
  private val runDate = "2024-05-01"

  private def withServer(routes: (String, com.sun.net.httpserver.HttpHandler)*)
                        (body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, h) }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def bytesHandler(status: Int, bytes: () => Array[Byte],
                           requireToken: Option[String] = None)
      : com.sun.net.httpserver.HttpHandler = exchange => {
    val authed = requireToken.forall(t =>
      exchange.getRequestHeaders.getFirst("Authorization") == s"Bearer $t")
    val (st, b) = if (!authed) (401, Array.empty[Byte])
                  else (status, bytes())
    exchange.sendResponseHeaders(st, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) exchange.getResponseBody.write(b)
    exchange.close()
  }

  test("remote filenames are sanitized and path-encoded") {
    // a hostile listing name can never escape the destination dir
    assert(Fetchers.safeLocalName("../../etc/passwd") === "passwd")
    assert(Fetchers.safeLocalName("..\\..\\x.csv") === "x.csv")
    assert(Fetchers.safeLocalName("a/b/c.csv") === "c.csv")
    assert(Fetchers.safeLocalName("..") === "unnamed")
    assert(Fetchers.safeLocalName("") === "unnamed")
    assert(Fetchers.safeLocalName("plain.csv") === "plain.csv")
    // spaces ride as %20 in a path segment, not form-encoded '+'
    assert(Fetchers.pathSegment("my report.csv") === "my%20report.csv")
    assert(Fetchers.pathSegment("a+b.csv") === "a%2Bb.csv")
  }

  test("a non-numeric size field degrades to -1 instead of throwing") {
    withServer("/" -> bytesHandler(200,
        () => "report.csv\tN/A\nok.csv\t10\n".getBytes("UTF-8"))) { base =>
      val listing = HttpFolderFetcher(base).list()
      assert(listing === Right(Seq(
        Fetchers.RemoteFile("report.csv", -1L),
        Fetchers.RemoteFile("ok.csv", 10L))))
    }
  }

  test("S6 folder fetch drives E2 end-to-end (list, find by name, download)") {
    val csv = res("internal_html.csv")
    withServer(
      "/drive/" -> bytesHandler(200,
        () => "internal_html.csv\t123\nother_file.csv\t9\n".getBytes("UTF-8"),
        requireToken = Some("tok")),
      "/drive/internal_html.csv" -> bytesHandler(200, () => csv,
        requireToken = Some("tok"))
    ) { base =>
      val dest = Files.createTempDirectory("graft-drive")
      var alerts = List.empty[String]
      val fetcher = HttpFolderFetcher(s"$base/drive", Some("tok"))
      assert(fetcher.list().map(_.map(_.name)) ===
        Right(Seq("internal_html.csv", "other_file.csv")))
      val local = fetcher.fetchNamed("internal_html.csv", dest,
        m => alerts ::= m)
      assert(local.isDefined && alerts.isEmpty)
      // the full E2 pipeline over the fetched file
      val raw = Pipelines.readCsv(spark, local.get.toString)
      val (slim, content) = Pipelines.sfHtml(raw, runDate,
        alert = m => alerts ::= m)
      assert(alerts.isEmpty && slim.count() === 6 && content.count() === 6)
    }
  }

  test("S6 auth failure and missing file alert and degrade (V1 parity)") {
    withServer(
      "/drive/" -> bytesHandler(200,
        () => "a.csv\t1\n".getBytes("UTF-8"), requireToken = Some("tok"))
    ) { base =>
      val dest = Files.createTempDirectory("graft-drive2")
      // wrong token -> 401 on the listing -> alert, None
      var alerts = List.empty[String]
      val bad = HttpFolderFetcher(s"$base/drive", Some("WRONG"))
        .fetchNamed("a.csv", dest, m => alerts ::= m)
      assert(bad === None)
      assert(alerts.exists(_.contains("HTTP 401")))
      // right token, absent file -> not-found alert, None
      alerts = Nil
      val miss = HttpFolderFetcher(s"$base/drive", Some("tok"))
        .fetchNamed("nope.csv", dest, m => alerts ::= m)
      assert(miss === None)
      assert(alerts.exists(_.contains("not found")))
    }
  }

  test("S7 mailbox fetch drives E3 end-to-end (search, mark seen, attachments)") {
    val csv = res("midoco_report.csv")
    val seen = new java.util.concurrent.atomic.AtomicReference[String]()
    withServer(
      "/mail/search" -> bytesHandler(200, () => "42\n".getBytes("UTF-8")),
      "/mail/message/42/attachments" -> bytesHandler(200,
        () => "midoco_report.csv\n".getBytes("UTF-8")),
      "/mail/message/42/attachment/midoco_report.csv" ->
        bytesHandler(200, () => csv),
      "/mail/message/42/seen" -> (exchange => {
        seen.set(exchange.getRequestMethod)
        exchange.sendResponseHeaders(204, -1); exchange.close()
      })
    ) { base =>
      val dest = Files.createTempDirectory("graft-mail")
      var alerts = List.empty[String]
      val saved = HttpMailbox(s"$base/mail").downloadAttachments(
        MailQuery("reports@example.de", java.time.LocalDate.parse(runDate)),
        dest, m => alerts ::= m)
      assert(alerts.isEmpty && saved.map(_.getFileName.toString) ===
        Seq("42-midoco_report.csv"))
      assert(seen.get() === "POST") // the reference's mark_seen
      // the full E3 pipeline over the fetched attachment (;/latin-1)
      val raw = Pipelines.readCsvLatin1(spark, saved.head.toString)
      val out = Pipelines.midoco(raw, runDate)
      assert(out.count() === 3)
      assert(out.filter(col("ext_id") === "X123").head()
        .getAs[String]("vermittler") === "Büro München")
    }
  }

  test("S7 mailbox search failure alerts and yields nothing") {
    withServer(
      "/mail/search" -> bytesHandler(503, () => Array.empty[Byte])
    ) { base =>
      var alerts = List.empty[String]
      val saved = HttpMailbox(s"$base/mail").downloadAttachments(
        MailQuery("x@y.z", java.time.LocalDate.parse(runDate)),
        Files.createTempDirectory("graft-mail2"), m => alerts ::= m)
      assert(saved.isEmpty)
      assert(alerts.exists(_.contains("HTTP 503")))
    }
  }

  test("S7 one bad attachment is skipped, the rest land (retry-skip posture)") {
    val seenCalled = new java.util.concurrent.atomic.AtomicBoolean(false)
    withServer(
      "/mail/search" -> bytesHandler(200, () => "7\n".getBytes("UTF-8")),
      "/mail/message/7/attachments" -> bytesHandler(200,
        () => "good.csv\nbad.csv\n".getBytes("UTF-8")),
      "/mail/message/7/attachment/good.csv" ->
        bytesHandler(200, () => "a;b\n1;2\n".getBytes("UTF-8")),
      "/mail/message/7/attachment/bad.csv" ->
        bytesHandler(500, () => Array.empty[Byte]),
      "/mail/message/7/seen" -> (exchange => {
        seenCalled.set(true)
        exchange.sendResponseHeaders(204, -1); exchange.close()
      })
    ) { base =>
      var alerts = List.empty[String]
      val saved = HttpMailbox(s"$base/mail").downloadAttachments(
        MailQuery("x@y.z", java.time.LocalDate.parse(runDate)),
        Files.createTempDirectory("graft-mail3"), m => alerts ::= m)
      assert(saved.map(_.getFileName.toString) === Seq("7-good.csv"))
      assert(alerts.exists(a => a.contains("bad.csv") && a.contains("HTTP 500")))
      // a partially-failed message stays UNSEEN so a later unseen-scoped
      // run retries it instead of permanently skipping
      assert(!seenCalled.get())
    }
  }
}
