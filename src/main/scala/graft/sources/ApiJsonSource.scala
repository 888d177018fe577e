package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: REST-API JSON source (reference `extract.py:81-132`): driver-side
  * HTTP GET with date-range params, status check, newline scrub, then
  * parallelize into a DataFrame. The reference scrubs newlines by walking
  * the parsed JSON recursively in Python (`extract.py:110-120`); here the
  * payload is parsed by Spark's JSON reader and scrubbed as a narrow
  * column projection — same result, stays distributed and codegen'd. */
object ApiJsonSource {

  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  /** Bounded-retry policy for the driver-side fetch — the engine-level
    * analog of the reference's operational retry story (its Airflow DAG
    * declares `retries`/`retry_delay` per task, `dag.py`): transient
    * statuses (429 + 5xx) and connection failures retry with
    * exponential backoff, a 429/503 `Retry-After: <seconds>` header
    * overrides the computed delay, and any other non-200 fails
    * IMMEDIATELY (a 401 or 404 never heals by waiting). `sleeper` is
    * injectable so specs assert the schedule without wall-clock sleeps. */
  final case class RetryPolicy(maxAttempts: Int = 4,
                               initialBackoffMs: Long = 200L,
                               backoffMultiplier: Double = 2.0,
                               retryStatuses: Set[Int] = Set(429, 500, 502, 503, 504),
                               sleeper: Long => Unit = Thread.sleep) {
    require(maxAttempts >= 1, s"RetryPolicy: maxAttempts $maxAttempts < 1")
  }

  /** GET `uri`, honoring `policy`. Returns the 200 body; throws the
    * last failure once attempts are exhausted. */
  private[sources] def fetchUri(uri: URI, policy: RetryPolicy): String = {
    var backoff = policy.initialBackoffMs
    var attempt = 1
    while (true) {
      val outcome: Either[(String, Option[Long]), String] =
        try {
          val resp = client.send(
            HttpRequest.newBuilder(uri).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          val code = resp.statusCode()
          if (code == 200) Right(resp.body())
          else if (policy.retryStatuses.contains(code)) {
            val retryAfter = resp.headers().firstValue("Retry-After")
              .map[Option[Long]](v => v.toLongOption.map(_ * 1000L))
              .orElse(None)
            Left((s"API request failed with status $code", retryAfter))
          } else
            // non-retryable status: same contract as the reference's
            // status check — fail now, loudly
            throw new IllegalArgumentException(
              s"API request failed with status $code")
        } catch {
          case e: java.io.IOException =>
            Left((s"API request failed: ${e.getMessage}", None))
        }
      outcome match {
        case Right(body) => return body
        case Left((msg, retryAfter)) =>
          if (attempt >= policy.maxAttempts)
            throw new IllegalArgumentException(
              s"$msg (after ${policy.maxAttempts} attempts)")
          policy.sleeper(retryAfter.getOrElse(backoff))
          backoff = (backoff * policy.backoffMultiplier).toLong
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** GET `url?start_date=…&end_date=…`, fail on non-200 (reference raises
    * on status != 200), return the raw body. Retries per `policy`. */
  def fetch(url: String, startDate: String, endDate: String,
            policy: RetryPolicy = RetryPolicy()): String =
    fetchUri(URI.create(s"$url?start_date=$startDate&end_date=$endDate"),
      policy)

  /** Paged fetch: `url?start_date=…&end_date=…&<pageParam>=k` for
    * k = startPage, startPage+1, … until `isLastPage` says stop (default:
    * an empty JSON array / empty body — the till-exhausted REST paging
    * contract). Each page gets the full retry policy. Driver-side and
    * bounded by `maxPages` (a misbehaving API that echoes the same page
    * forever must not spin the driver). */
  def fetchPaged(url: String, startDate: String, endDate: String,
                 pageParam: String = "page", startPage: Int = 1,
                 maxPages: Int = 10000,
                 policy: RetryPolicy = RetryPolicy(),
                 isLastPage: String => Boolean = body => {
                   val t = body.trim; t.isEmpty || t == "[]"
                 }): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var page = startPage
    var done = false
    while (!done) {
      if (page - startPage >= maxPages)
        throw new IllegalStateException(
          s"fetchPaged: exceeded maxPages=$maxPages pages — endpoint never " +
            "reported a last page")
      val body = fetchUri(URI.create(
        s"$url?start_date=$startDate&end_date=$endDate&$pageParam=$page"),
        policy)
      if (isLastPage(body)) done = true
      else { pages += body; page += 1 }
    }
    pages.result()
  }

  /** Parse a JSON array/lines payload into a DataFrame and scrub embedded
    * newlines from every string column (P11). */
  def toDataFrame(spark: SparkSession, payload: String): DataFrame =
    graft.functions.Cleaning.scrubNewlines(Readers.jsonString(spark, payload))

  /** Full S6 path: fetch + parse + scrub. */
  def read(spark: SparkSession, url: String, startDate: String, endDate: String): DataFrame =
    toDataFrame(spark, fetch(url, startDate, endDate))

  /** Paged S6 path: all pages parse through ONE `spark.read.json` pass
    * (single schema inference over the union — per-page parses could
    * infer drifting schemas and fail the union). */
  def readPaged(spark: SparkSession, url: String, startDate: String,
                endDate: String, pageParam: String = "page",
                policy: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    val pages = fetchPaged(url, startDate, endDate, pageParam = pageParam,
      policy = policy)
    graft.functions.Cleaning.scrubNewlines(
      spark.read.json(pages.toDS()))
  }
}
