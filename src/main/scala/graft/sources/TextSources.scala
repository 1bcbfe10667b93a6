package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ad-hoc text formats (SURVEY §2.1 S6/S7) as Spark
  * scans, plus the small-summary sinks (S9-S12).
  */
object TextSources {

  /** S6: `key = value` result files (`interpixel_distance.txt` style,
    * reference `scripts/measurements.py:200-224`): one (key, value) row
    * per line; values stay strings (caller casts).
    */
  def readKeyValueTxt(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(col("value").contains("="))
      .select(
        trim(regexp_extract(col("value"), "^([^=]+)=", 1)).as("key"),
        trim(regexp_extract(col("value"), "=\\s*(.+)$", 1)).as("value"))

  /** S7: sub-measurement manifest (`README.txt` listing one name per
    * line after a header, reference `scripts/utils.py:23-49`).
    */
  def readManifest(spark: SparkSession, path: String, headerMarker: String): DataFrame =
    spark.read.text(path)
      .filter(!col("value").contains(headerMarker) && length(trim(col("value"))) > 0)
      .select(trim(col("value")).as("submeasurement_name"))

  /** S9: small-summary CSV sink — `coalesce(1)` is correct ONLY for
    * metadata-sized outputs (the reference's result tables are tens of
    * rows); fact tables must keep their partitioning.
    */
  def writeSummaryCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** S12: append-accumulate sink (bootstrap replicas CSV,
    * reference `scripts/time_resolution_beta_scan.py:327-336`) — append
    * mode replaces the reference's read-concat-rewrite cycle.
    */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode("append").option("header", "true").csv(path)

  /** S2 read-back for the CSV sinks (explicit schema — no inference
    * pass).
    */
  def readCsv(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSONL sink — the interchange format of training corpora (one JSON
    * object per line). Keeps the input partitioning: corpus-sized tables
    * must not coalesce.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL scan with an explicit schema (no inference pass over a 100 TB
    * corpus; malformed lines surface as nulls under the default
    * PERMISSIVE mode rather than killing the job).
    */
  def readJsonl(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S4: minimal XLSX sheet scan (reference reads device-info sheets,
    * `scripts/devices_info.py:3-9`). An .xlsx is a zip of XML; this reads
    * `xl/worksheets/sheet1.xml` + `xl/sharedStrings.xml` directly —
    * driver-side like the other metadata sources (device sheets are tens
    * of rows), no external Excel library (none exists on the offline
    * classpath). Handles shared strings (`t="s"`), inline strings
    * (`t="inlineStr"`), and numeric cells; first row = header; all
    * columns are strings (caller casts, matching `readKeyValueTxt`).
    */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val zf = new java.util.zip.ZipFile(path)
    try {
      def entryXml(name: String): Option[scala.xml.Elem] =
        Option(zf.getEntry(name)).map(e => scala.xml.XML.load(zf.getInputStream(e)))
      val shared: IndexedSeq[String] = entryXml("xl/sharedStrings.xml")
        .map(sst => (sst \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
        .getOrElse(IndexedSeq.empty)
      val sheet = entryXml("xl/worksheets/sheet1.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/worksheets/sheet1.xml"))
      def colIndex(ref: String): Int =
        ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1
      val rows: Seq[Map[Int, String]] = (sheet \\ "row").map { r =>
        (r \ "c").flatMap { c =>
          val idx = colIndex((c \@ "r"))
          val t = c \@ "t"
          val v =
            if (t == "inlineStr") Some((c \ "is" \ "t").text)
            else {
              val raw = (c \ "v").text
              if (raw.isEmpty) None
              else if (t == "s") Some(shared(raw.trim.toInt))
              else Some(raw)
            }
          v.map(idx -> _)
        }.toMap
      }
      require(rows.nonEmpty, s"$path: empty sheet")
      val width = rows.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
      val header = (0 until width).map(i => rows.head.getOrElse(i, s"col_$i"))
      val data = rows.tail.map(m =>
        org.apache.spark.sql.Row.fromSeq((0 until width).map(i => m.get(i).orNull)))
      val schema = org.apache.spark.sql.types.StructType(header.map(h =>
        org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
      spark.createDataFrame(data.asJava, schema)
    } finally zf.close()
  }

  /** S11: minimal XLSX sink for small summary tables (reference writes
    * result sheets for humans; fact tables stay parquet). Inline strings
    * only — every cell is written as `t="inlineStr"` so no shared-string
    * table is needed; the workbook carries one sheet. Driver-side
    * `collect()` like [[writeSummaryCsv]] — metadata-sized outputs only.
    */
  def writeXlsx(df: DataFrame, path: String): Unit = {
    def esc(s: String) = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // AA-style column letters (bijective base-26) — inverse of readXlsx's
    // colIndex, so frames wider than 26 columns get valid refs
    def colRef(ci: Int): String = {
      var n = ci + 1; val sb = new StringBuilder
      while (n > 0) { n -= 1; sb.insert(0, ('A' + n % 26).toChar); n /= 26 }
      sb.toString
    }
    val header = df.columns
    val rows = df.collect()
    val sheetRows = (header.map(h => (h, true)) +: rows.map(r =>
      header.indices.map(i =>
        (Option(r.get(i)).map(_.toString).getOrElse(""), true)).toArray))
      .zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.map { case ((v, _), ci) =>
          val ref = colRef(ci) + (ri + 1)
          s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/worksheets/sheet1.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>""")
    } finally zos.close()
  }

  /** S5: Clarius `run.xml` metadata → one-row DataFrame (driver-side
    * scala-xml parse; metadata files are not distributed scans —
    * reference `scripts/convert_probe_station_measurement_to_our_format
    * .py:17-48`).
    */
  def readRunXml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val x = scala.xml.XML.loadFile(path)
    Seq((
      (x \\ "runId").text,
      (x \\ "username").text,
      (x \\ "rating").text,
      (x \\ "dataPath").text,
      (x \\ "timestamp").text))
      .toDF("runId", "username", "rating", "dataPath", "timestamp")
  }
}
