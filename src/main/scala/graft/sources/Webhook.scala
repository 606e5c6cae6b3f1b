package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** K4: concrete webhook alert sink (reference: Audisto/audisto.py:38-59
  * posts a JSON "message card" to a chat webhook and checks for HTTP 200).
  *
  * The engine boundary stays the `Pipelines.Alert` hook — pipelines never
  * know HTTP exists. This adapter turns the hook into a webhook poster:
  * `Pipelines.sfHtml(raw, runDate, alert = Webhook(url).alert("title"))`.
  *
  * Driver-side only by design (alerts fire from the driver on validation
  * gates, never inside executors), so no serialization concerns.
  */
final case class Webhook(
    url: String,
    themeColor: String = "000000",
    timeout: Duration = Duration.ofSeconds(10),
    client: HttpClient = Webhook.defaultClient) {

  /** Post one message card; returns the HTTP status (reference returns
    * response.status_code and expects 200). Network failures return -1
    * rather than throwing — alerting must never kill the run it is
    * reporting on (the reference's alert-and-continue behavior). */
  def send(title: String, content: String): Int =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(timeout)
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          Webhook.messageCard(title, content, themeColor)))
        .build()
      client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[webhook] post failed: $e")
        -1
    }

  /** Adapt to the `Pipelines.Alert` hook with a fixed title. */
  def alert(title: String): String => Unit =
    content => { send(title, content); () }
}

object Webhook {

  private lazy val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** The reference's message-card payload shape (audisto.py:48-58):
    * themeColor + summary + one section carrying title and content. */
  private[sources] def messageCard(title: String, content: String,
                                   themeColor: String): String = {
    import graft.Json.{quote => q}
    s"""{"themeColor":${q(themeColor)},"summary":${q(title)},""" +
      s""""sections":[{"activityTitle":${q(title)},""" +
      s""""activitySubtitle":${q(content)}}]}"""
  }
}
