package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

/** S6/S7: the two extract connectors the reference runs driver-side —
  * fetch a named file from a remote FOLDER (Drive-shaped; reference:
  * `Screaming Frog/sf_html_data.py:51-88` lists a folder, finds the file
  * by title, downloads it to a local path) and fetch a day's message
  * ATTACHMENTS from a mailbox (IMAP-shaped; reference:
  * `Midoco/product_data.py:40-55` searches by sender/date, marks seen,
  * saves each attachment into a download folder).
  *
  * Both are expressed as transport-agnostic interfaces with HTTP gateway
  * implementations built on the JDK client only — no vendor SDK, no
  * proprietary endpoint baked in. The conversation shapes mirror the
  * originals (folder: list → find-by-name → download; mailbox: search →
  * fetch parts → mark seen) so a Drive/IMAP-backed implementation is a
  * drop-in. Downloads land as LOCAL FILES and enter the engine through
  * the ordinary CSV/JSON scans (S1/S2/S5) — connector code stays outside
  * the query path, exactly like [[Paginated]] and [[Webhook]].
  *
  * Failure contract (V1 parity): auth/transport errors surface as
  * `Left(reason)`; the `fetchNamed`/`downloadAttachments` conveniences
  * fire the injected [[Paginated.Alert]] and degrade (None / empty)
  * instead of throwing — the reference's alert-and-continue posture.
  */
object Fetchers {

  type Alert = Paginated.Alert

  final case class RemoteFile(name: String, sizeBytes: Long)

  /** Local filename for a server-supplied name: strip any directory
    * components so a hostile listing ("../../etc/passwd", "a/b.csv",
    * "C:\\x") can never resolve outside the destination directory —
    * remote names are DATA, not paths. */
  private[graft] def safeLocalName(name: String): String = {
    val base = name.replace('\\', '/').split('/').lastOption.getOrElse("")
    val cleaned = if (base.isEmpty || base == "." || base == "..") "" else base
    if (cleaned.isEmpty) "unnamed" else cleaned
  }

  /** Percent-encode one URL PATH segment. URLEncoder alone produces
    * form encoding, where a space becomes '+' — a server decoding only
    * %xx would look up a literally-plus-named file; '+' must ride as
    * %20 in a path. */
  private[graft] def pathSegment(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** A remote folder of downloadable files (S6). */
  trait FolderFetcher {

    /** Folder listing (Drive: `ListFile` over the parent folder). */
    def list(): Either[String, Seq[RemoteFile]]

    /** Download one file into `destDir`, returning the local path. */
    def download(name: String, destDir: Path): Either[String, Path]

    /** The reference's find-by-title-then-download
      * (`sf_html_data.py:75-88`): alert + None when the listing fails,
      * the name is absent, or the download fails. */
    def fetchNamed(name: String, destDir: Path,
                   alert: Alert = _ => ()): Option[Path] =
      list() match {
        case Left(err) =>
          alert(s"folder listing failed: $err"); None
        case Right(files) if !files.exists(_.name == name) =>
          alert(s"file '$name' not found in remote folder"); None
        case Right(_) =>
          download(name, destDir) match {
            case Left(err) => alert(s"download of '$name' failed: $err"); None
            case Right(p) => Some(p)
          }
      }
  }

  /** Folder served over HTTP: `GET <base>/` returns a newline-delimited
    * listing of `name<TAB>sizeBytes`, `GET <base>/<name>` returns the
    * file bytes. `authToken` rides as a Bearer header; a 401/403 listing
    * is the auth-failure path the reference hits when the service
    * account loses folder access. */
  final case class HttpFolderFetcher(
      baseUrl: String,
      authToken: Option[String] = None,
      timeout: Duration = Duration.ofSeconds(30),
      client: HttpClient = Fetchers.defaultClient) extends FolderFetcher {

    private def get(url: String): Either[String, Array[Byte]] =
      Fetchers.get(client, url, authToken, timeout)

    override def list(): Either[String, Seq[RemoteFile]] =
      get(s"$baseUrl/").map { bytes =>
        new String(bytes, "UTF-8").linesIterator.filter(_.nonEmpty).map {
          line =>
            line.split('\t') match {
              case Array(n, sz) =>
                // never-throws contract: a non-numeric size is a
                // malformed listing line, not an exception
                RemoteFile(n, sz.toLongOption.getOrElse(-1L))
              case _ => RemoteFile(line, -1L)
            }
        }.toSeq
      }

    override def download(name: String, destDir: Path): Either[String, Path] =
      get(s"$baseUrl/" + Fetchers.pathSegment(name))
        .map { bytes =>
          Files.createDirectories(destDir)
          Files.write(destDir.resolve(Fetchers.safeLocalName(name)), bytes)
        }
  }

  final case class MailQuery(from: String, onDate: java.time.LocalDate)
  final case class AttachmentRef(uid: String, filename: String)

  /** A searchable mailbox with attachment download (S7). The three
    * operations are the IMAP conversation the reference's Imbox calls
    * wrap: SEARCH (by sender + date), FETCH of attachment parts, and
    * STORE \Seen. */
  trait Mailbox {

    /** Message uids matching the query, oldest first. */
    def search(q: MailQuery): Either[String, Seq[String]]

    /** Attachment filenames of one message. */
    def attachments(uid: String): Either[String, Seq[String]]

    /** One attachment's bytes. */
    def attachment(uid: String, filename: String): Either[String, Array[Byte]]

    /** Mark a message seen (the reference's optional `mark_seen`). */
    def markSeen(uid: String): Unit

    /** The reference's whole extract loop (`product_data.py:40-55`):
      * search, save every attachment into `destDir`, then mark the hit
      * seen; a failing attachment is alerted and skipped (the
      * reference's bare `except: print`), a failing search is alerted
      * and yields nothing. Returns saved paths in message order.
      *
      * \Seen is stored only AFTER every attachment of the message
      * saved successfully — a transient fetch failure leaves the
      * message unseen so an unseen-scoped re-run retries it instead of
      * permanently skipping. Local names are uid-prefixed
      * (`<uid>-<name>`) so same-named attachments across messages
      * never silently overwrite each other. */
    def downloadAttachments(q: MailQuery, destDir: Path,
                            alert: Alert = _ => ()): Seq[Path] =
      search(q) match {
        case Left(err) =>
          alert(s"mailbox search failed: $err"); Seq.empty
        case Right(uids) =>
          Files.createDirectories(destDir)
          uids.flatMap { uid =>
            attachments(uid) match {
              case Left(err) =>
                alert(s"message $uid attachment list failed: $err"); Seq.empty
              case Right(names) =>
                val saved = names.flatMap { fn =>
                  attachment(uid, fn) match {
                    case Left(err) =>
                      alert(s"attachment $fn of $uid failed: $err"); None
                    case Right(bytes) =>
                      Some(Files.write(destDir.resolve(
                        s"$uid-${Fetchers.safeLocalName(fn)}"), bytes))
                  }
                }
                if (saved.length == names.length) markSeen(uid)
                saved
            }
          }
      }
  }

  /** Mailbox behind an HTTP gateway, one endpoint per IMAP verb:
    * `GET <base>/search?from=<addr>&date=<yyyy-MM-dd>` → newline-
    * delimited uids; `GET <base>/message/<uid>/attachments` → newline-
    * delimited filenames; `GET <base>/message/<uid>/attachment/<name>`
    * → raw bytes; `POST <base>/message/<uid>/seen`. */
  final case class HttpMailbox(
      baseUrl: String,
      authToken: Option[String] = None,
      timeout: Duration = Duration.ofSeconds(30),
      client: HttpClient = Fetchers.defaultClient) extends Mailbox {

    private def get(url: String): Either[String, Array[Byte]] =
      Fetchers.get(client, url, authToken, timeout)
    private def lines(bytes: Array[Byte]): Seq[String] =
      new String(bytes, "UTF-8").linesIterator.filter(_.nonEmpty).toSeq

    override def search(q: MailQuery): Either[String, Seq[String]] =
      get(s"$baseUrl/search?from=" +
          java.net.URLEncoder.encode(q.from, "UTF-8") +
          s"&date=${q.onDate}")
        .map(lines)

    override def attachments(uid: String): Either[String, Seq[String]] =
      get(s"$baseUrl/message/$uid/attachments").map(lines)

    override def attachment(uid: String,
                            filename: String): Either[String, Array[Byte]] =
      get(s"$baseUrl/message/$uid/attachment/" +
        Fetchers.pathSegment(filename))

    override def markSeen(uid: String): Unit =
      try {
        val req = HttpRequest.newBuilder(URI.create(
            s"$baseUrl/message/$uid/seen"))
          .timeout(timeout)
          .POST(HttpRequest.BodyPublishers.noBody())
        client.send(
          authToken.fold(req)(t => req.header("Authorization", s"Bearer $t"))
            .build(),
          HttpResponse.BodyHandlers.discarding())
        ()
      } catch { case scala.util.control.NonFatal(_) => () }
  }

  private lazy val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** One GET with Bearer auth: non-200 → Left("HTTP <code>"), transport
    * failure → Left(exception) — never throws (the reference alerts and
    * continues on fetch failures). */
  private def get(client: HttpClient, url: String, authToken: Option[String],
                  timeout: Duration): Either[String, Array[Byte]] =
    try {
      val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET()
      val req = authToken
        .fold(b)(t => b.header("Authorization", s"Bearer $t")).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() == 200) Right(resp.body())
      else Left(s"HTTP ${resp.statusCode()}")
    } catch {
      case scala.util.control.NonFatal(e) => Left(e.toString)
    }
}
