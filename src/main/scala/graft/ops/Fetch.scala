package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Per-item fetch with the reference's retry policy (tmdb_index.py:369-402),
  * split into a pure decision function (unit-testable offline) and a thin
  * transport. The pipeline consumes fetch results as an injected
  * DataFrame (Pipeline.insertExternalIds); a deployment produces that
  * frame from a live REST API via `Pipeline.liveExternalIdsFetcher` — a
  * `mapPartitions` over the queue with one [[HttpJsonFetcher]] per
  * partition and per-partition request pacing, so the loop distributes
  * instead of collecting the queue to the driver.
  */
object FetchPolicy {
  sealed trait Decision
  /** 2xx — use the body. */
  case object Succeed extends Decision
  /** 404 — emit a null row for the id (the entity is recorded as
    * fetched-and-absent; reference :377-378). */
  case object EmitNullRow extends Decision
  /** Transient — sleep `seconds` then retry (429 honoring Retry-After,
    * else exponential backoff clamped [1, 60]; reference :379-400). */
  case class RetryIn(seconds: Long) extends Decision
  /** Permanent or out of attempts — propagate the error. */
  case object GiveUp extends Decision

  /** `outcome`: Right(status) for an HTTP response, Left(error) for a
    * network/timeout failure. `attempt` is 0-based. */
  def decide(outcome: Either[Throwable, Int], attempt: Int,
      retryAfterHeader: Option[Long] = None): Decision = outcome match {
    case Right(s) if s / 100 == 2 => Succeed
    case Right(404) => EmitNullRow
    case Right(429) if attempt < Pipeline.MaxAttempts - 1 =>
      RetryIn(Pipeline.backoffSeconds(attempt, retryAfterHeader))
    case Right(429) => GiveUp
    case Right(_) => GiveUp // other HTTP errors re-raise immediately (:393)
    case Left(_) if attempt < Pipeline.MaxAttempts - 1 =>
      RetryIn(Pipeline.backoffSeconds(attempt)) // URLError/timeout (:395-400)
    case Left(_) => GiveUp
  }
}

/** Blocking JSON fetcher over java.net.http implementing [[FetchPolicy]].
  * Untestable in this zero-egress environment; the policy it drives is
  * fully covered by FetchSpec via injected outcomes.
  */
class HttpJsonFetcher(timeout: Duration = Duration.ofSeconds(10),
    sleep: Long => Unit = s => Thread.sleep(s * 1000)) {
  private lazy val client =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  /** Fetch one URL: Some(body) on 2xx, None on 404, throws after the
    * policy gives up. */
  def fetch(url: String): Option[String] = {
    var attempt = 0
    while (true) {
      val outcome: Either[Throwable, HttpResponse[String]] =
        try Right(client.send(
          HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET().build(),
          HttpResponse.BodyHandlers.ofString()))
        catch { case e: java.io.IOException => Left(e) }
      val retryAfter = outcome.toOption.flatMap(r =>
        r.headers().firstValue("Retry-After").map(_.toLong).toScala)
      FetchPolicy.decide(outcome.map(_.statusCode()), attempt, retryAfter) match {
        case FetchPolicy.Succeed => return Some(outcome.toOption.get.body())
        case FetchPolicy.EmitNullRow => return None
        case FetchPolicy.RetryIn(s) => sleep(s); attempt += 1
        case FetchPolicy.GiveUp =>
          outcome match {
            case Left(e) => throw e
            case Right(r) => throw new RuntimeException(
              s"fetch failed: HTTP ${r.statusCode()} for $url")
          }
      }
    }
    None // unreachable
  }

  private implicit class OptConv[T](o: java.util.Optional[T]) {
    def toScala: Option[T] = if (o.isPresent) Some(o.get) else None
  }
}
