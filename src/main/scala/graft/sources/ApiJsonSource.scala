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

  /** GET `url?start_date=…&end_date=…`, fail on non-200 (reference raises
    * on status != 200), return the raw body. */
  def fetch(url: String, startDate: String, endDate: String): String = {
    val uri = URI.create(s"$url?start_date=$startDate&end_date=$endDate")
    val resp = client.send(
      HttpRequest.newBuilder(uri).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"API request failed with status ${resp.statusCode()}")
    resp.body()
  }

  /** Parse a JSON array/lines payload into a DataFrame and scrub embedded
    * newlines from every string column (P11). */
  def toDataFrame(spark: SparkSession, payload: String): DataFrame =
    graft.functions.Cleaning.scrubNewlines(Readers.jsonString(spark, payload))

  /** Full S6 path: fetch + parse + scrub. */
  def read(spark: SparkSession, url: String, startDate: String, endDate: String): DataFrame =
    toDataFrame(spark, fetch(url, startDate, endDate))
}
