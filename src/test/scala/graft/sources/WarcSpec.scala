package graft.sources

import java.nio.charset.StandardCharsets

import graft.SparkSpecBase

/** WARC source/sink: roundtrip, framing (Content-Length, not
  * delimiters), header handling, and FAILFAST on torn records.
  */
class WarcSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def rec(uri: String, payload: Array[Byte],
                  extraHeader: String = ""): Array[Byte] = {
    val h = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri" +
      s"\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" + extraHeader +
      s"Content-Length: ${payload.length}\r\n\r\n"
    h.getBytes(StandardCharsets.UTF_8) ++ payload ++
      "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
  }

  test("write → read roundtrip preserves uri, payload bytes, order-free set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val df = (0L until 20L).map(i =>
        (s"http://site.com/p/$i", s"body $i".getBytes("UTF-8")))
      .toDF("uri", "payload")
    Warc.write(df.repartition(3), dir)
    val back = Warc.read(spark, dir)
    assert(back.count() === 20L)
    assert(back.select("warc_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("response"))
    val got = back.select(col("target_uri"),
        col("payload").cast("string"), col("content_length"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === (0L until 20L)
      .map(i => (s"http://site.com/p/$i", s"body $i", ("body " + i).length.toLong))
      .toSet)
  }

  test("Content-Length frames the payload: CRLFs inside payload bytes survive") {
    val payload = "line1\r\n\r\nline2".getBytes("UTF-8")
    val bytes = rec("http://a/x", payload) ++ rec("http://a/y", "z".getBytes)
    val rows = Warc.parseFile("t", bytes).toList
    assert(rows.map(_._2) === List("http://a/x", "http://a/y"))
    assert(new String(rows.head._5, "UTF-8") === "line1\r\n\r\nline2")
  }

  test("unknown headers are skipped; names match case-insensitively") {
    val bytes = rec("http://a/x", "p".getBytes,
      extraHeader = "WARC-Record-ID: <urn:uuid:1>\r\nX-Custom: y\r\n")
    val lower = new String(bytes, "UTF-8")
      .replace("WARC-Target-URI", "warc-target-uri")
      .getBytes(StandardCharsets.UTF_8)
    val r = Warc.parseFile("t", lower).toList
    assert(r.map(_._2) === List("http://a/x"))
    assert(r.head._1 === "response" && r.head._4 === 1L)
  }

  test("torn records throw with offsets, not null-fill") {
    val good = rec("http://a/x", "abc".getBytes)
    // truncate mid-payload
    intercept[IllegalArgumentException] {
      Warc.parseFile("t", good.dropRight(5)).toList
    }
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    intercept[IllegalArgumentException] {
      Warc.parseFile("t", noLen).toList
    }
    // wrong terminator
    val bad = good.clone(); bad(good.length - 1) = 'x'.toByte
    intercept[IllegalArgumentException] {
      Warc.parseFile("t", bad).toList
    }
  }
}
