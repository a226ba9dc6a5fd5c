package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.HttpSource

/** HTTP-source semantics against an in-process loopback server — the same
  * pattern the reference uses (its specs run an in-process WEBrick on
  * localhost, spec/integration/web_url_processing_spec.rb:150-190). No
  * egress: the server binds 127.0.0.1 only.
  */
class HttpSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    try in.readAllBytes() finally in.close()
  }

  def withServer(f: String => Unit): Unit = {
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handle(path: String)(h: HttpExchange => Unit): Unit =
      server.createContext(path, (ex: HttpExchange) => try h(ex) finally ex.close())
    val pdf = fixture("document.pdf")
    handle("/document.pdf") { ex =>
      ex.sendResponseHeaders(200, pdf.length)
      ex.getResponseBody.write(pdf)
    }
    handle("/tiny.txt") { ex =>
      val b = fixture("tiny.txt")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
    }
    handle("/redirect") { ex =>
      ex.getResponseHeaders.add("Location", "/document.pdf")
      ex.sendResponseHeaders(302, -1)
    }
    handle("/loop") { ex =>
      ex.getResponseHeaders.add("Location", "/loop")
      ex.sendResponseHeaders(302, -1)
    }
    handle("/missing") { ex => ex.sendResponseHeaders(404, -1) }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("fetchOne: 200, redirect-follow, 404, redirect loop, unknown host") {
    withServer { base =>
      val ok = HttpSource.fetchOne(s"$base/tiny.txt")
      assert(ok.status == "ok" && ok.httpCode == 200)
      assert(new String(java.util.Base64.getDecoder.decode(ok.bytesB64),
        "UTF-8").nonEmpty)
      val red = HttpSource.fetchOne(s"$base/redirect")
      assert(red.status == "ok")
      assert(red.finalUrl.endsWith("/document.pdf")) // redirect followed
      val nf = HttpSource.fetchOne(s"$base/missing")
      assert(nf.status == HttpSource.IssueHttp404 && nf.httpCode == 404)
      val loop = HttpSource.fetchOne(s"$base/loop")
      assert(loop.status == HttpSource.IssueHttpError) // bounded redirects
      val uh = HttpSource.fetchOne(
        "http://no-such-host.invalid/x") // RFC 2606 reserved TLD: never resolves
      assert(uh.status == HttpSource.IssueUnknownHost ||
        uh.status == HttpSource.IssueIoError)
    }
  }

  test("distributed fetch -> pipeline extraction over loopback") {
    spark.sparkContext.setLogLevel("WARN")
    withServer { base =>
      import spark.implicits._
      val targets = Seq(
        s"$base/document.pdf", s"$base/tiny.txt", s"$base/redirect",
        s"$base/missing").toDF("url")
      val fetched = HttpSource.fetchAll(spark, targets).cache()
      assert(fetched.count() == 4)
      assert(fetched.filter(col("status") === "ok").count() == 3)
      assert(fetched.filter(col("status") === HttpSource.IssueHttp404).count() == 1)
      val (docs, media) = HttpSource.toPipelineInput(fetched)
      val out = graft.spark.Pipeline.extract(spark, docs, media).toDF()
      assert(out.count() == 3)
      val byType = out.groupBy("content_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType.keySet.exists(_.startsWith("application/pdf")))
      assert(byType.keySet.exists(_.startsWith("text/plain")))
      // extracted PDF text carries the fixture poem
      val pdfText = out.filter(col("content_type") === "application/pdf")
        .select(explode(col("spans")).as("s"))
        .select(col("s.text")).as[String].collect().mkString("\n")
      assert(pdfText.contains("Stopping"))
    }
  }
}
