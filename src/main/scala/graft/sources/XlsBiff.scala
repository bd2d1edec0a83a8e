package graft.sources

/** Minimal legacy BIFF8 `.xls` reader — the pre-2007 half of the
  * reference's Excel-upload branch (app.py:1620-1625 accepts any
  * filename containing "xls"; pandas routes BIFF files to xlrd).
  * Pure JDK, built from the public container specs:
  *
  *  - MS-CFB: the compound-file sector walk — header DIFAT → FAT →
  *    directory stream → the "Workbook"/"Book" stream, including the
  *    mini-FAT path (streams under the 4096-byte cutoff live in 64-byte
  *    mini sectors inside the root entry's stream — which is where a
  *    typical small upload actually lands).
  *  - MS-XLS: a BIFF8 record scan — globals substream (SST shared
  *    strings, first BOUNDSHEET) then that sheet's substream, reading
  *    the cell records LABELSST / LABEL / NUMBER / RK / MULRK.
  *
  * Scope is deliberately the upload shape: one sheet of strings and
  * numbers. Anything outside it fails LOUDLY rather than mis-parsing:
  * encrypted workbooks (FILEPASS), SST tables spilling into CONTINUE
  * records (>8 KB of unique strings), and non-CFB bytes all raise with
  * a message naming the limitation. Formula results, dates-as-formats,
  * and rich-text runs beyond plain extraction are ignored by design —
  * the reference's own path reads values, not formatting. */
private[sources] object XlsBiff {

  private val FreeSect = 0xFFFFFFFFL
  private val EndOfChain = 0xFFFFFFFEL

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** CFB walk to the Workbook stream bytes. */
  private def workbookStream(b: Array[Byte]): Array[Byte] = {
    require(b.length >= 512 &&
      le32(b, 0) == 0xE011CFD0L && le32(b, 4) == 0xE11AB1A1L,
      "not a CFB container (bad magic) — is this really a .xls file?")
    val secSize = 1 << le16(b, 30)
    val miniSize = 1 << le16(b, 32)
    val miniCutoff = le32(b, 56)
    def secOff(s: Long): Int = ((s + 1) * secSize).toInt
    // FAT sector list: 109 header DIFAT slots, then the DIFAT chain
    val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0 until 109).foreach { i =>
      val v = le32(b, 76 + 4 * i)
      if (v != FreeSect) fatSectors += v
    }
    var difat = le32(b, 68)
    var guard = 0
    while (difat != EndOfChain && difat != FreeSect) {
      val off = secOff(difat)
      require(off + secSize <= b.length, "truncated DIFAT sector")
      (0 until secSize / 4 - 1).foreach { i =>
        val v = le32(b, off + 4 * i)
        if (v != FreeSect) fatSectors += v
      }
      difat = le32(b, off + secSize - 4)
      guard += 1
      require(guard <= b.length / secSize + 1, "DIFAT cycle")
    }
    val perFat = secSize / 4
    def fatAt(sect: Long): Long = {
      val idx = (sect / perFat).toInt
      require(idx < fatSectors.length, s"FAT lookup past table (sector $sect)")
      le32(b, secOff(fatSectors(idx)) + 4 * (sect % perFat).toInt)
    }
    def chain(start: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var n = 0
      while (s != EndOfChain) {
        require(s < 0xFFFFFFFAL, s"corrupt FAT chain (sector $s)")
        require(secOff(s) + secSize <= b.length, "chain runs past end of file")
        out.write(b, secOff(s), secSize)
        s = fatAt(s)
        n += 1
        require(n <= b.length / secSize + 1, "FAT chain cycle")
      }
      out.toByteArray
    }
    // directory entries: 128 bytes each (UTF-16LE name, type, start, size)
    val dir = chain(le32(b, 48))
    case class Ent(name: String, typ: Int, start: Long, size: Long)
    val ents = (0 until dir.length by 128).flatMap { off =>
      val typ = dir(off + 66) & 0xFF
      if (typ == 0) None
      else {
        val nameLen = le16(dir, off + 64)
        val name = if (nameLen >= 2)
          new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
        Some(Ent(name, typ, le32(dir, off + 116), le32(dir, off + 120)))
      }
    }
    val root = ents.find(_.typ == 5)
      .getOrElse(throw new IllegalArgumentException("CFB has no root entry"))
    val wb = ents.find(e => e.typ == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException(
        s"CFB has no Workbook/Book stream (streams: ${ents.filter(_.typ == 2).map(_.name).mkString(", ")})"))
    if (wb.size >= miniCutoff) chain(wb.start).take(wb.size.toInt)
    else {
      // mini-stream path: the root entry's chain holds the 64-byte mini
      // sectors; the mini FAT (its own FAT chain) links them
      val mini = chain(root.start)
      val mf = chain(le32(b, 60))
      val out = new java.io.ByteArrayOutputStream()
      var s = wb.start
      var n = 0
      while (s != EndOfChain) {
        require(s < 0xFFFFFFFAL, s"corrupt mini-FAT chain (mini sector $s)")
        val off = (s * miniSize).toInt
        require(off + miniSize <= mini.length, "mini chain past mini stream")
        out.write(mini, off, miniSize)
        require(4 * s + 4 <= mf.length, "mini-FAT lookup past table")
        s = le32(mf, 4 * s.toInt)
        n += 1
        require(n <= mini.length / miniSize + 1, "mini-FAT cycle")
      }
      out.toByteArray.take(wb.size.toInt)
    }
  }

  /** SST (0x00FC): cstTotal, cstUnique, then XLUnicodeRichExtendedString
    * entries. The minimal reader requires the table to fit one record —
    * CONTINUE spill (0x003C) fails loudly. */
  private def parseSst(wb: Array[Byte], body: Int, len: Int): IndexedSeq[String] = {
    val unique = le32(wb, body + 4).toInt
    val end = body + len
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = body + 8
    (0 until unique).foreach { _ =>
      require(p + 3 <= end,
        "SST spills into CONTINUE records — unsupported by the minimal BIFF8 reader")
      val cch = le16(wb, p)
      val flags = wb(p + 2) & 0xFF
      p += 3
      val high = (flags & 0x01) != 0
      val ext = (flags & 0x04) != 0
      val rich = (flags & 0x08) != 0
      var cRun = 0
      var cbExt = 0L
      if (rich) { cRun = le16(wb, p); p += 2 }
      if (ext) { cbExt = le32(wb, p); p += 4 }
      val nb = if (high) 2 * cch else cch
      require(p + nb + 4 * cRun + cbExt <= end,
        "SST spills into CONTINUE records — unsupported by the minimal BIFF8 reader")
      out += (if (high)
        new String(wb, p, nb, java.nio.charset.StandardCharsets.UTF_16LE)
      else new String(wb, p, nb, java.nio.charset.StandardCharsets.ISO_8859_1))
      p += nb + 4 * cRun + cbExt.toInt
    }
    out.toIndexedSeq
  }

  /** Render a BIFF number the way the string-typed upload schema
    * expects: integral values without the trailing ".0". */
  private def fmtNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** RK-packed number: bit0 = ÷100, bit1 = 30-bit int vs truncated
    * IEEE double in the high 30 bits. */
  private def rkValue(v: Long): String = {
    val num =
      if ((v & 2L) != 0) (v.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((v & 0xFFFFFFFCL) << 32)
    fmtNum(if ((v & 1L) != 0) num / 100 else num)
  }

  /** Parse the workbook: globals substream (SST + first BOUNDSHEET),
    * then that worksheet substream's cell records, assembled into
    * header-first rows like [[CsvSeries.xlsxRows]]. */
  def rows(bytes: Array[Byte]): Vector[Array[String]] = {
    val wb = workbookStream(bytes)
    require(wb.length >= 4 && le16(wb, 0) == 0x0809,
      "Workbook stream does not start with a BOF record")
    // pass 1: globals
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var sheetPos = -1
    var pos = 0
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val typ = le16(wb, pos)
      val len = le16(wb, pos + 2)
      val body = pos + 4
      require(body + len <= wb.length, "truncated BIFF record in globals")
      typ match {
        case 0x002F => throw new IllegalArgumentException(
          "encrypted .xls (FILEPASS) — unsupported")
        case 0x00FC => sst = parseSst(wb, body, len)
        case 0x0085 => if (sheetPos < 0) sheetPos = le32(wb, body).toInt
        case 0x000A => done = true
        case _ => ()
      }
      pos = body + len
    }
    require(sheetPos >= 0, "no BOUNDSHEET record — workbook has no sheets")
    require(sheetPos + 4 <= wb.length && le16(wb, sheetPos) == 0x0809,
      "first BOUNDSHEET does not point at a worksheet BOF")
    // pass 2: the first worksheet substream
    val cells = scala.collection.mutable.TreeMap.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(r: Int, c: Int, v: String): Unit = {
      cells((r, c)) = v
      if (r > maxRow) maxRow = r
      if (c > maxCol) maxCol = c
    }
    pos = sheetPos
    done = false
    while (!done && pos + 4 <= wb.length) {
      val typ = le16(wb, pos)
      val len = le16(wb, pos + 2)
      val body = pos + 4
      require(body + len <= wb.length, "truncated BIFF record in worksheet")
      typ match {
        case 0x00FD if len >= 10 => // LABELSST
          val isst = le32(wb, body + 6).toInt
          require(isst < sst.length, s"LABELSST index $isst outside SST (${sst.length})")
          put(le16(wb, body), le16(wb, body + 2), sst(isst))
        case 0x0204 if len >= 9 => // LABEL (inline string)
          val cch = le16(wb, body + 6)
          val high = (wb(body + 8) & 0x01) != 0
          val nb = if (high) 2 * cch else cch
          require(body + 9 + nb <= body + len, "truncated LABEL string")
          put(le16(wb, body), le16(wb, body + 2),
            if (high) new String(wb, body + 9, nb, java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(wb, body + 9, nb, java.nio.charset.StandardCharsets.ISO_8859_1))
        case 0x0203 if len >= 14 => // NUMBER (IEEE double)
          var bits = 0L
          var i = 0
          while (i < 8) { bits |= (wb(body + 6 + i) & 0xFFL) << (8 * i); i += 1 }
          put(le16(wb, body), le16(wb, body + 2),
            fmtNum(java.lang.Double.longBitsToDouble(bits)))
        case 0x027E if len >= 10 => // RK
          put(le16(wb, body), le16(wb, body + 2), rkValue(le32(wb, body + 6)))
        case 0x00BD if len >= 12 => // MULRK: row, colFirst, (ixfe+rk)×n, colLast
          val row = le16(wb, body)
          val colFirst = le16(wb, body + 2)
          val n = (len - 6) / 6
          (0 until n).foreach { i =>
            put(row, colFirst + i, rkValue(le32(wb, body + 4 + 6 * i + 2)))
          }
        case 0x000A => done = true
        case _ => ()
      }
      pos = body + len
    }
    require(maxRow >= 0, "worksheet has no cell records")
    (0 to maxRow).map { r =>
      val width = maxCol + 1
      val arr = new Array[String](width)
      (0 until width).foreach(c => arr(c) = cells.getOrElse((r, c), null))
      arr
    }.toVector
  }
}
