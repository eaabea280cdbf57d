package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) source/sink — the wire format crawl corpora
  * actually arrive in (Common Crawl ships ~millions of ~1 GB WARC
  * files). This is the ingestion seam in front of the crawl-curation
  * stack ([[graft.operators.WebCuration]] URL hygiene →
  * [[graft.operators.Html]] extraction → quality/dedup):
  * read (uri, payload) records out of WARC files, or write a frame
  * INTO WARC files for interchange.
  *
  * Subset of the spec implemented (the part a batch pipeline needs):
  * version line `WARC/1.0`, named headers (`WARC-Type`,
  * `WARC-Target-URI`, `WARC-Date`, `Content-Length` — names matched
  * case-insensitively per RFC-822 convention, unknown headers
  * skipped), `Content-Length`-delimited binary payload, `\r\n\r\n`
  * record terminator. No gzip member framing (Spark's codec layer or
  * an upstream unpack owns transport compression).
  *
  * Scale shape: the FILE is the parallel unit on both paths — the
  * reader maps one task per WARC file (`binaryFile` source, whole-file
  * rows) and parses records in one streaming pass; the writer emits
  * one WARC file per partition via the Hadoop FS API (the
  * [[graft.operators.AppendFileSink]] executor-write discipline). A
  * 100 TB crawl is wide in files, so both directions parallelize to
  * the cluster without any shuffle. Parsing is imperative byte work —
  * the documented `mapPartitions` justification class (byte-decode
  * layer, same as multimodal payload decode). Reads are FAILFAST: a
  * torn record throws with its file offset rather than null-filling.
  * Caveat inherited from `binaryFile`: single files over 2 GB are
  * rejected by Spark — crawl WARCs are rotated ~1 GB by convention.
  */
object Warc {

  /** Hadoop Configuration is not java-serializable; standard wrapper. */
  private final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false); value.readFields(in)
    }
  }

  private val Crlf = "\r\n".getBytes(StandardCharsets.UTF_8)

  /** Write `df` as WARC files under `dir`, one `part-NNNNN.warc` per
    * partition, one record per row: `uriCol` (string) →
    * `WARC-Target-URI`, `payloadCol` (binary) → the record block,
    * `Content-Length` = payload byte length. Records of one partition
    * keep partition order. */
  def write(df: DataFrame, dir: String, uriCol: String = "uri",
            payloadCol: String = "payload",
            warcType: String = "response",
            date: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = df.sparkSession
    val serConf =
      new SerializableConf(spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val driverFs = dirPath.getFileSystem(serConf.value)
    if (!driverFs.exists(dirPath)) driverFs.mkdirs(dirPath)
    val rdd = df.select(col(uriCol).cast("string"),
        col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY)).rdd
    rdd.foreachPartition { iter =>
      if (iter.hasNext) {
        val partId = TaskContext.getPartitionId()
        val fs = new Path(dir).getFileSystem(serConf.value)
        val out = fs.create(new Path(dir, f"part-$partId%05d.warc"), true)
        try iter.foreach { case (uri, payload) =>
          val header =
            s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: " +
              s"$uri\r\nWARC-Date: $date\r\nContent-Length: " +
              s"${payload.length}\r\n\r\n"
          out.write(header.getBytes(StandardCharsets.UTF_8))
          out.write(payload)
          out.write(Crlf); out.write(Crlf)
        } finally out.close()
      }
    }
  }

  private def fail(path: String, off: Int, msg: String): Nothing =
    throw new IllegalArgumentException(
      s"malformed WARC record in $path at byte $off: $msg")

  /** Parse one whole WARC file into records — a single streaming pass
    * over the byte array. */
  private[sources] def parseFile(path: String, bytes: Array[Byte])
      : Iterator[(String, String, String, Long, Array[Byte])] =
    new Iterator[(String, String, String, Long, Array[Byte])] {
      private var off = 0
      private def atEnd: Boolean = off >= bytes.length
      def hasNext: Boolean = !atEnd
      private def indexOfCrlf(from: Int): Int = {
        var i = from
        while (i + 1 < bytes.length &&
          !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
        if (i + 1 >= bytes.length) fail(path, from, "unterminated header line")
        i
      }
      def next(): (String, String, String, Long, Array[Byte]) = {
        val verEnd = indexOfCrlf(off)
        val version =
          new String(bytes, off, verEnd - off, StandardCharsets.UTF_8)
        if (!version.startsWith("WARC/"))
          fail(path, off, s"expected version line, got '$version'")
        var p = verEnd + 2
        var wtype = ""; var uri = ""; var wdate = ""; var clen = -1L
        var blank = false
        while (!blank) {
          val lineEnd = indexOfCrlf(p)
          if (lineEnd == p) blank = true
          else {
            val line =
              new String(bytes, p, lineEnd - p, StandardCharsets.UTF_8)
            val ci = line.indexOf(':')
            if (ci < 0) fail(path, p, s"header without ':': '$line'")
            val name = line.substring(0, ci).trim.toLowerCase
            val v = line.substring(ci + 1).trim
            name match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "warc-date" => wdate = v
              case "content-length" => clen = v.toLong
              case _ => () // unknown headers are legal; skip
            }
          }
          p = lineEnd + 2
        }
        if (clen < 0) fail(path, off, "missing Content-Length")
        if (p + clen + 4 > bytes.length)
          fail(path, p, s"payload of $clen bytes overruns the file")
        val payload = java.util.Arrays.copyOfRange(bytes, p, p + clen.toInt)
        p += clen.toInt
        if (!(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
            bytes(p + 2) == '\r' && bytes(p + 3) == '\n'))
          fail(path, p, "record not terminated by CRLF CRLF")
        off = p + 4
        (wtype, uri, wdate, clen, payload)
      }
    }

  /** Read every `*.warc` file under `dir` →
    * `(warc_type, target_uri, warc_date, content_length, payload)`.
    * One task per file; record order within a file is file order. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.warc")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseFile(path, bytes) }
      .toDF("warc_type", "target_uri", "warc_date", "content_length",
        "payload")
  }
}
