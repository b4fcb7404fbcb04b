package graft.tools

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Minimal pure-JVM .xlsx reader (an xlsx is a zip of XML parts; this uses
  * only `java.util.zip` + the JDK's StAX parser — no external dependency,
  * which is the constraint that forced SURVEY §2.1's offline-conversion
  * design in the first place).
  *
  * Supports what the reference's annotation workbooks need: sheet names in
  * workbook order, shared strings, inline strings, and numeric cells. Cell
  * values come back as raw strings exactly as stored (numbers unformatted;
  * date cells are Excel serial numbers — the CONVERTER decides which
  * columns are dates, mirroring `pd.read_excel(header=None)` + per-column
  * coercion in `/root/reference/src/data/loader.py:125-176`).
  */
object XlsxReader {

  /** name → dense row grid (None = empty cell), sheets in workbook order. */
  def readSheets(path: String): Seq[(String, Vector[Vector[Option[String]]])] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip, e.getName)).getOrElse(Vector.empty)
      val sheets = workbookSheets(zip) // (name, rId)
      val targets = relTargets(zip) // rId → worksheets/sheetN.xml
      sheets.map { case (name, rId) =>
        val target = targets.getOrElse(rId,
          sys.error(s"no workbook rel for sheet '$name' ($rId)"))
        val entry = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        name -> parseSheet(zip, entry, shared)
      }
    } finally zip.close()
  }

  private def xml(zip: ZipFile, entry: String): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(zip.getInputStream(zip.getEntry(entry)))
  }

  private def parseSharedStrings(zip: ZipFile, entry: String): Vector[String] = {
    val r = xml(zip, entry)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** (sheet name, relationship id) in workbook order. */
  private def workbookSheets(zip: ZipFile): Seq[(String, String)] = {
    val r = xml(zip, "xl/workbook.xml")
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
        val name = r.getAttributeValue(null, "name")
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).getOrElse("")
        out += name -> rid
      }
    }
    r.close()
    out.result()
  }

  private def relTargets(zip: ZipFile): Map[String, String] = {
    val r = xml(zip, "xl/_rels/workbook.xml.rels")
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
        out += r.getAttributeValue(null, "Id") ->
          r.getAttributeValue(null, "Target")
      }
    }
    r.close()
    out.result()
  }

  /** "C7" → 0-based column 2. */
  private def colOf(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def parseSheet(zip: ZipFile, entry: String,
      shared: Vector[String]): Vector[Vector[Option[String]]] = {
    val r = xml(zip, entry)
    val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Option[String]]]
    var row: mutable.ArrayBuffer[Option[String]] = null
    var nextCol = 0
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    def put(row: mutable.ArrayBuffer[Option[String]], i: Int, v: Option[String]): Unit = {
      while (row.size <= i) row += None
      row(i) = v
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              // r attribute is 1-based; rows may be sparse
              val rIdx = Option(r.getAttributeValue(null, "r"))
                .map(_.toInt - 1).getOrElse(rows.size)
              while (rows.size <= rIdx) rows += mutable.ArrayBuffer.empty
              row = rows(rIdx)
              nextCol = 0
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colOf).getOrElse(nextCol)
              nextCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text.clear()
            case "v" => inV = true
            case "t" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if row != null =>
              val v = cellType match {
                case "s" => text.toString.trim.toIntOption.flatMap(shared.lift)
                case _ if text.isEmpty => None
                case _ => Some(text.toString)
              }
              if (v.isDefined) put(row, cellCol, v)
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.map(_.toVector).toVector
  }
}
