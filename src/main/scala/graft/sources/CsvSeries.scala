package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2/S4 scans and K1-K3 sinks — the reference's ingest surface
  * (app.py:159-161, 1597-1650, 1835-1864).
  *
  * The reference reads path CSVs as euc-kr (app.py:159) and uploads as
  * utf-8 base64 (app.py:1616-1618); the value column is cast to float
  * on load (app.py:160). Its Excel branch (app.py:1620-1625 — any
  * filename containing "xls") is served here by pure-JDK parses of
  * BOTH container generations: `.xlsx` (OOXML zip + StAX) and legacy
  * BIFF8 `.xls` ([[XlsBiff]]: CFB sector walk + BIFF record scan),
  * dispatched on magic bytes (SURVEY.md §2.1 S2).
  */
object CsvSeries {

  /** S1: CSV path scan, header + schema inference, configurable
    * encoding (reference default euc-kr), value column cast to float
    * then compute in double (SURVEY.md §7.5 #5). */
  def readCsv(spark: SparkSession, path: String, valueCol: String,
      encoding: String = "euc-kr"): DataFrame = {
    // Spark 4 rejects charsets outside its canonical list (euc-kr
    // included) unless legacy java charsets are allowed.
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.read
      .option("header", "true")
      .option("encoding", encoding)
      .option("inferSchema", "true")
      .csv(path)
      .withColumn(valueCol, col(valueCol).cast("float").cast("double"))
  }

  /** S2: base64-upload decode → CSV parse (the Dash upload body,
    * app.py:1597-1625). The payload is parsed as an in-memory dataset
    * of lines — same schema path as the file scan. */
  def readUploadBase64(spark: SparkSession, b64Body: String, valueCol: String): DataFrame = {
    import spark.implicits._
    val text = new String(java.util.Base64.getDecoder.decode(b64Body),
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = spark.createDataset(text.split("\n").toSeq.filter(_.nonEmpty))
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(lines)
      .withColumn(valueCol, col(valueCol).cast("float").cast("double"))
  }

  /** S2b: Excel upload (the reference's `'xls' in filename` branch,
    * app.py:1620-1625 → pd.read_excel). Modern `.xlsx` is OOXML — a
    * zip of XML parts — so the parse is pure JDK (ZipInputStream +
    * StAX): shared strings + the first worksheet, first row as the
    * header, remaining cells as strings, value column cast
    * float→double exactly like the CSV path. The parse is driver-side
    * (uploads are single in-memory bodies by construction); the result
    * is a normal distributed DataFrame. */
  def readUploadXlsxBase64(spark: SparkSession, b64Body: String, valueCol: String): DataFrame = {
    val bytes = java.util.Base64.getDecoder.decode(b64Body)
    val (shared, sheetXml) = xlsxParts(bytes)
    rowsToDf(spark, xlsxRows(sheetXml, shared), valueCol, "xlsx")
  }

  /** S2c: legacy BIFF8 `.xls` upload (the same reference branch —
    * `'xls' in filename`, app.py:1620-1625 — covers pre-2007 files,
    * which pandas routes to xlrd). Pure JDK: [[XlsBiff]] walks the CFB
    * container to the Workbook stream and scans BIFF8 cell records.
    * Same header/row assembly and value cast as the other upload
    * paths. */
  def readUploadXlsBase64(spark: SparkSession, b64Body: String, valueCol: String): DataFrame = {
    val bytes = java.util.Base64.getDecoder.decode(b64Body)
    rowsToDf(spark, XlsBiff.rows(bytes), valueCol, "xls")
  }

  /** Upload dispatch on magic bytes — the reference's filename sniff
    * (`'xls' in filename`) can't distinguish the two Excel container
    * generations, but the first bytes can: `PK` (zip) → OOXML .xlsx,
    * `D0 CF 11 E0` (CFB) → BIFF8 .xls; anything else fails loudly
    * instead of mis-parsing. */
  def readUploadExcelBase64(spark: SparkSession, b64Body: String, valueCol: String): DataFrame = {
    val bytes = java.util.Base64.getDecoder.decode(b64Body)
    if (bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == 'K'.toByte)
      readUploadXlsxBase64(spark, b64Body, valueCol)
    else if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0xD0 &&
        (bytes(1) & 0xFF) == 0xCF && (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0)
      readUploadXlsBase64(spark, b64Body, valueCol)
    else throw new IllegalArgumentException(
      "upload is neither OOXML (.xlsx, zip magic) nor BIFF8 (.xls, CFB magic)")
  }

  /** Shared upload row assembly: first row is the header (blank cells
    * get positional _cN names), sparse rows pad with nulls, rows wider
    * than the header fail loudly, value column cast float→double like
    * the CSV path. */
  private def rowsToDf(spark: SparkSession, rows: Vector[Array[String]],
      valueCol: String, what: String): DataFrame = {
    require(rows.nonEmpty, "empty worksheet")
    val header = rows.head.zipWithIndex.map { case (h, i) =>
      if (h == null || h.isEmpty) s"_c$i" else h
    }
    val width = header.length
    val wide = rows.tail.indexWhere(_.length > width)
    require(wide < 0, s"$what: data row ${wide + 2} has ${
      if (wide >= 0) rows.tail(wide).length else 0} cells but the header row has $width")
    val data = rows.tail.map(r =>
      org.apache.spark.sql.Row.fromSeq(r.padTo(width, null).take(width).toSeq))
    val schema = org.apache.spark.sql.types.StructType(header.map(h =>
      org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq), schema)
      .withColumn(valueCol, col(valueCol).cast("float").cast("double"))
  }

  /** Extract sharedStrings + the workbook's FIRST worksheet (by
    * xl/workbook.xml sheet order resolved through the relationships
    * part — zip part names like sheet3.xml don't track tab order when
    * sheets have been deleted/reordered; lexicographic part name is
    * only the fallback when either part is absent). */
  private def xlsxParts(bytes: Array[Byte]): (IndexedSeq[String], Array[Byte]) = {
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var shared: Array[Byte] = null
    var workbook: Array[Byte] = null
    var rels: Array[Byte] = null
    val sheets = scala.collection.mutable.TreeMap.empty[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      val name = e.getName
      if (name == "xl/sharedStrings.xml" || name == "xl/workbook.xml" ||
          name == "xl/_rels/workbook.xml.rels" ||
          (name.startsWith("xl/worksheets/") && name.endsWith(".xml"))) {
        val buf = new java.io.ByteArrayOutputStream()
        zis.transferTo(buf)
        name match {
          case "xl/sharedStrings.xml" => shared = buf.toByteArray
          case "xl/workbook.xml" => workbook = buf.toByteArray
          case "xl/_rels/workbook.xml.rels" => rels = buf.toByteArray
          case _ => sheets(name) = buf.toByteArray
        }
      }
      e = zis.getNextEntry
    }
    require(sheets.nonEmpty, "no worksheet part in xlsx body")
    val sst =
      if (shared == null) IndexedSeq.empty[String]
      else {
        val r = xmlReader(shared)
        val out = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
        var rphDepth = 0 // skip phonetic-run annotations (<rPh><t>…)
        while (r.hasNext) {
          r.next()
          if (r.isStartElement) r.getLocalName match {
            case "si" => out += new StringBuilder
            case "rPh" => rphDepth += 1
            case "t" if rphDepth == 0 && out.nonEmpty => out.last ++= r.getElementText
            case _ => ()
          }
          else if (r.isEndElement && r.getLocalName == "rPh") rphDepth -= 1
        }
        out.map(_.toString).toIndexedSeq
      }
    val part = firstSheetPart(workbook, rels).flatMap(sheets.get)
      .getOrElse(sheets.head._2)
    (sst, part)
  }

  /** Resolve the first <sheet> of xl/workbook.xml through the
    * workbook relationships to its zip part name. */
  private def firstSheetPart(workbook: Array[Byte],
      rels: Array[Byte]): Option[String] = {
    if (workbook == null || rels == null) return None
    var firstRid: String = null
    val wr = xmlReader(workbook)
    while (wr.hasNext && firstRid == null) {
      wr.next()
      if (wr.isStartElement && wr.getLocalName == "sheet") {
        // r:id is namespaced; scan attributes by local name
        var i = 0
        while (i < wr.getAttributeCount && firstRid == null) {
          if (wr.getAttributeLocalName(i) == "id")
            firstRid = wr.getAttributeValue(i)
          i += 1
        }
      }
    }
    if (firstRid == null) return None
    val rr = xmlReader(rels)
    while (rr.hasNext) {
      rr.next()
      if (rr.isStartElement && rr.getLocalName == "Relationship" &&
          rr.getAttributeValue(null, "Id") == firstRid) {
        val target = rr.getAttributeValue(null, "Target")
        if (target != null) {
          val norm =
            if (target.startsWith("/")) target.drop(1)
            else if (target.startsWith("xl/")) target
            else s"xl/$target"
          return Some(norm)
        }
      }
    }
    None
  }

  /** Worksheet XML → rows of cell strings, column-aligned via the A1
    * references (sparse cells land in the right slot, gaps are null). */
  private def xlsxRows(sheetXml: Array[Byte],
      shared: IndexedSeq[String]): Vector[Array[String]] = {
    def colIdx(ref: String): Int =
      ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1
    val r = xmlReader(sheetXml)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    var cells: scala.collection.mutable.TreeMap[Int, String] = null
    var cellCol = -1
    var cellType = ""
    var inValue = false
    var inInline = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next()
      if (r.isStartElement) r.getLocalName match {
        case "row" => cells = scala.collection.mutable.TreeMap.empty
        case "c" =>
          val ref = Option(r.getAttributeValue(null, "r"))
          cellCol = ref.map(colIdx).getOrElse(if (cells.isEmpty) 0 else cells.lastKey + 1)
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
        case "is" => inInline = true; sb.clear()
        case "v" => inValue = true; sb.clear()
        case "t" if inInline => sb ++= r.getElementText
        case _ => ()
      }
      else if (r.hasText && inValue) sb ++= r.getText
      else if (r.isEndElement) r.getLocalName match {
        case "v" =>
          inValue = false
          val raw = sb.toString
          cells(cellCol) =
            if (cellType == "s") {
              // a corrupt workbook must fail with a description, not a
              // bare IndexOutOfBounds/NumberFormat from the decoder
              val idx =
                try raw.trim.toInt
                catch { case _: NumberFormatException => throw new IllegalArgumentException(
                  s"xlsx: malformed shared-string index '$raw'") }
              require(idx >= 0 && idx < shared.length,
                s"xlsx: shared-string index $idx out of range (table has ${shared.length} entries)")
              shared(idx)
            } else raw
        case "is" =>
          inInline = false
          cells(cellCol) = sb.toString
          sb.clear()
        case "row" =>
          if (cells.nonEmpty) {
            val w = cells.lastKey + 1
            val arr = new Array[String](w)
            cells.foreach { case (i, v) => arr(i) = v }
            rows += arr
          }
          cells = null
        case _ => ()
      }
    }
    rows.toVector
  }

  /** Hardened StAX reader (no DTDs / external entities). */
  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes), "UTF-8")
  }

  /** S4: preview head (app.py:1634-1636). */
  def preview(df: DataFrame, n: Int = 5): DataFrame = df.limit(n)

  /** K1/K2: CSV sink with header (app.py:1835-1864). */
  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)

  /** K3: path-derived sink — write next to the source file
    * (app.py:915-920). */
  def writeBesideSource(df: DataFrame, sourcePath: String, name: String): Unit = {
    val parent = new java.io.File(sourcePath).getParent
    writeCsv(df, s"$parent/$name")
  }
}
