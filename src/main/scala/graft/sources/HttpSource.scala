package graft.sources

import java.net.{HttpURLConnection, URI}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP-source semantics (reference: lib/rika/parser.rb:90-92 opens URIs
  * with redirect following; spec/integration/web_url_processing_spec.rb
  * pins 404 / unknown-host taxonomy against an in-process loopback
  * server).
  *
  * The fetcher is INJECTABLE so the zero-egress sandbox (and unit tests)
  * can exercise the full path against 127.0.0.1 only: the default
  * implementation is plain JDK HttpURLConnection — used exclusively
  * against loopback in this environment, never the public network.
  *
  * Scale shape: fetches run executor-side in mapPartitions (one connection
  * pool per partition, like the parser pools), so a 10^9-URL crawl list
  * partitions like any other table; failures become taxonomy rows, never
  * task failures.
  */
object HttpSource {

  final case class Fetched(
      url: String,
      status: String,       // "ok" | taxonomy entry
      httpCode: Int,        // -1 when transport failed
      bytesB64: String,     // "" on failure
      finalUrl: String)     // after redirects

  val IssueHttp404     = "http_404"
  val IssueHttpError   = "http_error"
  val IssueUnknownHost = "unknown_host"
  val IssueIoError     = "io_error"

  /** Body-size cap: a multi-GB response must become an io_error taxonomy
    * row, never an executor OOM (the "failures are rows" contract).
    */
  val MaxBodyBytes: Int = 64 << 20

  /** One fetch, following up to `maxRedirects` redirects (the reference
    * relies on OpenURI's redirect following). Pure function of the
    * injected opener — tests pass loopback URLs. Only true redirect codes
    * (301/302/303/307/308) are followed: 304 Not Modified and other 3xx
    * have no Location and fall through to the error taxonomy.
    */
  def fetchOne(url: String, maxRedirects: Int = 5,
      timeoutMs: Int = 10000, maxBytes: Int = MaxBodyBytes): Fetched = {
    var cur = url
    var hops = 0
    while (hops <= maxRedirects) {
      val conn =
        try new URI(cur).toURL.openConnection() match {
          case h: HttpURLConnection => h
          case _ => return Fetched(url, IssueIoError, -1, "", cur)
        }
        catch {
          case _: Exception => return Fetched(url, IssueIoError, -1, "", cur)
        }
      try {
        conn.setInstanceFollowRedirects(false) // manual: count hops
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        val code = conn.getResponseCode
        if (code == 301 || code == 302 || code == 303 || code == 307 || code == 308) {
          val loc = Option(conn.getHeaderField("Location"))
          conn.disconnect()
          loc match {
            case Some(l) =>
              cur = new URI(cur).resolve(l).toString
              hops += 1
            case None => return Fetched(url, IssueHttpError, code, "", cur)
          }
        } else if (code == 404) {
          return Fetched(url, IssueHttp404, code, "", cur)
        } else if (code >= 300) {
          return Fetched(url, IssueHttpError, code, "", cur)
        } else {
          // bounded read: readNBytes(max+1) lets an oversized body be
          // detected without buffering it all
          val bytes = try conn.getInputStream.readNBytes(maxBytes + 1)
            finally conn.disconnect()
          if (bytes.length > maxBytes)
            return Fetched(url, IssueIoError, code, "", cur)
          return Fetched(url, "ok", code,
            java.util.Base64.getEncoder.encodeToString(bytes), cur)
        }
      } catch {
        case _: java.net.UnknownHostException =>
          return Fetched(url, IssueUnknownHost, -1, "", cur)
        case _: java.io.IOException =>
          return Fetched(url, IssueIoError, -1, "", cur)
      }
    }
    Fetched(url, IssueHttpError, -1, "", cur) // redirect loop exhausted
  }

  /** Distributed fetch: `targets(url)` -> Fetched rows, executor-side.
    * `fetch` must be a serializable pure function (default fetchOne).
    */
  def fetchAll(spark: SparkSession, targets: DataFrame,
      fetch: String => Fetched = fetchOne(_)): DataFrame = {
    import spark.implicits._
    targets.select("url").as[String]
      .mapPartitions(_.map(fetch))
      .toDF()
  }

  /** Fetched rows -> (docs, media) in the pipeline's input shape: each ok
    * row becomes a one-span media doc (doc_id = url), so extraction,
    * taxonomy and metrics flow through Pipeline.extract unchanged; failed
    * fetches surface as issue rows via empty payloads' taxonomy.
    */
  def toPipelineInput(fetched: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val ok = fetched.filter(col("status") === "ok")
    val docs = ok.select(col("url").as("doc_id"),
      array(struct(
        lit("bin").as("kind"),
        lit(null).cast("string").as("text"),
        concat(lit("m-"), col("url")).as("media_ref"),
        lit(0).as("offset"))).as("spans"))
    val media = ok.select(concat(lit("m-"), col("url")).as("media_ref"),
      col("bytesB64").as("bytes_b64"),
      length(unbase64(col("bytesB64"))).cast("long").as("length"))
    (docs, media)
  }
}
