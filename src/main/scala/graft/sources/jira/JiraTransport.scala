package graft.sources.jira

import java.nio.file.{Files, Paths}

/** Transport abstraction for the Jira REST source: one method, the
  * paginated search call (scraper.py:147-169 — JQL
  * `project = {P} ORDER BY created ASC`, startAt/maxResults paging,
  * projected `fields` list).
  *
  * Implementations:
  *  - [[FileStubTransport]] — reads page files from a directory
  *    (zero-egress dev/test path; SURVEY §7.5 risk 4). Page file
  *    protocol: `search_{startAt}.json` holding the REST response
  *    body `{"startAt":N,"maxResults":M,"total":T,"issues":[...]}`.
  *  - A live HTTPS transport would implement the same method with
  *    connection reuse per executor (scraper.py:44-66 pooling) — not
  *    constructible in this offline environment, by design.
  */
trait JiraTransport extends Serializable {

  /** Fetch one page of the project's issues. `fields` is the
    * server-side projection (column pruning pushed to the source —
    * config.py:68-85).
    */
  def fetch(startAt: Int, maxResults: Int, fields: Seq[String]): String

  /** Single-issue point read (`GET /issue/{key}` —
    * scraper.py:171-188). Returns the issue JSON, or None for an
    * unknown key (HTTP 404 analogue). `expand` is the REST `expand=`
    * parameter the reference sends (`renderedFields`, scraper.py:176)
    * — a request shape for a live transport; the file stub has
    * nothing to expand and ignores it.
    */
  def fetchIssue(
      key: String,
      fields: Seq[String],
      expand: Seq[String] = Seq("renderedFields")
  ): Option[String]
}

/** Retryable transport failure (HTTP 429/5xx analogue).
  * `retryAfterSec` carries the server's `Retry-After` header when the
  * failure is a rate limit (scraper.py:123-127) — honored over the
  * exponential backoff.
  */
class JiraTransientError(
    msg: String,
    val retryAfterSec: Option[Double] = None
) extends RuntimeException(msg)

final class FileStubTransport(dir: String) extends JiraTransport {
  override def fetch(
      startAt: Int,
      maxResults: Int,
      fields: Seq[String]
  ): String = {
    val p = Paths.get(dir, s"search_$startAt.json")
    if (!Files.exists(p))
      throw new JiraTransientError(s"stub page missing: $p")
    new String(Files.readAllBytes(p), "UTF-8")
  }

  override def fetchIssue(
      key: String,
      fields: Seq[String],
      expand: Seq[String]
  ): Option[String] = {
    val p = Paths.get(dir, s"issue_$key.json")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8"))
    else None
  }
}

/** Wraps a transport with the reference's failure mode for tests:
  * the first `failures` calls throw a retryable error
  * (test_scrapper.py:103-113's 429 path); `retryAfterSec` simulates
  * the 429 response's `Retry-After` header.
  */
final class FlakyTransport(
    inner: JiraTransport,
    failures: Int,
    retryAfterSec: Option[Double] = None
) extends JiraTransport {
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  override def fetch(
      startAt: Int,
      maxResults: Int,
      fields: Seq[String]
  ): String =
    if (counter.getAndIncrement() < failures)
      throw new JiraTransientError("simulated 429", retryAfterSec)
    else inner.fetch(startAt, maxResults, fields)

  override def fetchIssue(
      key: String,
      fields: Seq[String],
      expand: Seq[String]
  ): Option[String] =
    inner.fetchIssue(key, fields, expand)
}

object JiraRetry {

  /** Pre-jitter wait for the n-th retry: the server's `Retry-After`
    * when present (scraper.py:123-127), else exponential backoff
    * min(2^attempt, 60)s (utils.py:144-156, config.py:34-35).
    */
  def backoffSeconds(attempt: Int, retryAfterSec: Option[Double]): Double =
    retryAfterSec.getOrElse(math.min(math.pow(2.0, attempt), 60.0))

  /** Reference retry policy: up to 5 attempts; wait =
    * [[backoffSeconds]] plus up to 10% random jitter — at 1000
    * concurrent partition readers a 429 storm must not re-arrive in
    * lockstep. The sleep is scaled by `sleepScale` so tests don't
    * wait.
    */
  def withRetry[T](maxRetries: Int = 5, sleepScale: Double = 1.0)(
      f: => T
  ): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: JiraTransientError =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          val base = backoffSeconds(attempt, e.retryAfterSec)
          val jitter = 1.0 +
            java.util.concurrent.ThreadLocalRandom.current().nextDouble(0.1)
          Thread.sleep((base * jitter * 1000 * sleepScale).toLong)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
