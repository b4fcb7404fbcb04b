package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.tools.{XlsxFixtureConverter, XlsxReader}

/** The offline Excel→parquet fixture converter (SURVEY §2.1 S3–S5) against
  * a synthetic workbook written by the spec itself: sheet-name predicate,
  * positional parse, null-key drops, zero-frame drops, leading-zero ids,
  * shared + inline strings, serial + ISO dates.
  */
class XlsxConverterSpec extends SparkSpec {

  /** cell: (type, value) where type ∈ n (numeric <v>), s (sharedStrings
    * index in <v>), inline (<is><t>).
    */
  private def sheetXml(rows: Seq[Seq[Option[(String, String)]]]): String = {
    val body = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.collect { case (Some((t, v)), c) =>
        val ref = s"${('A' + c).toChar}${r + 1}"
        t match {
          case "n" => s"""<c r="$ref"><v>$v</v></c>"""
          case "s" => s"""<c r="$ref" t="s"><v>$v</v></c>"""
          case "inline" => s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
        }
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    s"""<?xml version="1.0"?><worksheet><sheetData>$body</sheetData></worksheet>"""
  }

  private def writeXlsx(path: String, shared: Seq[String],
      sheets: Seq[(String, String)]): Unit = {
    val z = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns:r="http://r"><sheets>$sheetTags</sheets></workbook>""")
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="ws" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships>$rels</Relationships>""")
    val sis = shared.map(s => s"<si><t>$s</t></si>").mkString
    put("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?><sst count="${shared.size}">$sis</sst>""")
    sheets.zipWithIndex.foreach { case ((_, xml), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    z.close()
  }

  private val n = (v: Any) => Some(("n", v.toString))
  private val str = (i: Int) => Some(("s", i.toString)) // sharedStrings ref
  private val inl = (v: String) => Some(("inline", v))

  private lazy val d1Path: String = {
    val dir = Files.createTempDirectory("graft_xlsx").toString
    val p = s"$dir/d1.xlsx"
    // shared strings: 0="North ", 1="2020-08-15"
    val eval = sheetXml(Seq(
      // row 0: sub-headers (skipped by the parser)
      Seq(inl("Dates"), inl("Yard"), inl("Hive ID"), inl("Boxes"),
        inl("BC1"), inl("BC2"), inl("HS1"), inl("HS2"), inl("HS3"), inl("HS4")),
      // serial date 44013 = 2020-07-01; frames 10.5 + 5 (others blank)
      Seq(n(44013), str(0), n(2056), n(2), n(10.5), n(5), None, None, None, None),
      // missing hive id → dropped
      Seq(n(44013), str(0), None, n(1), n(9), None, None, None, None, None),
      // all-blank frames → total 0 → dropped
      Seq(n(44013), str(0), n("2058.0"), n(1), None, None, None, None, None, None),
      // ISO string date via shared string; missing yard → "Unknown"
      Seq(str(1), None, n(2060), n(1), n(7), None, None, None, None, None)))
    val pheno = sheetXml(Seq(
      Seq(inl("Category")), // row 0 header
      Seq(inl("Names")), // row 1 header
      // row 2: leading-zero hive id, mixed blanks
      Seq(None, str(0), None, inl("02056"), n(1.5), None, n(3.0), None,
        n(0.5), None, None, None, n(2), None, n(3), None, None, None,
        n(0.9), None, n(12.5)),
      // row 3: non-integer hive id → dropped
      Seq(None, str(0), None, inl("ABC"), n(1)),
      // row 4
      Seq(None, inl("South"), None, inl("2060"), n(2.5))))
    val notes = sheetXml(Seq(Seq(inl("ignore me"))))
    writeXlsx(p, Seq("North ", "2020-08-15"), Seq(
      "Evaluation June 2020" -> eval,
      "Notes" -> notes,
      "Phenotypic measurements" -> pheno))
    p
  }

  test("XlsxReader resolves shared strings, inline strings and sparse cells") {
    val sheets = XlsxReader.readSheets(d1Path)
    assert(sheets.map(_._1) ==
      Seq("Evaluation June 2020", "Notes", "Phenotypic measurements"))
    val eval = sheets.head._2
    assert(eval(1)(1).contains("North ")) // shared string, untrimmed
    assert(eval(0)(0).contains("Dates")) // inline string
    assert(eval(1).lift(6).flatten.isEmpty) // blank cell absent/None
  }

  test("population: sheet predicate, null-key drop, zero-frame drop, dates") {
    val (pop, _) = XlsxFixtureConverter.convertD1(spark, d1Path)
    assert(pop.columns.toSeq ==
      Seq("hive_id", "date", "frames_of_bees", "apiary", "evaluation"))
    val rows = pop.orderBy("hive_id").collect()
    assert(rows.length == 2) // null-hive and zero-frame rows dropped
    assert(rows(0).getLong(0) == 2056L)
    assert(rows(0).getTimestamp(1).toString.startsWith("2020-07-01"))
    assert(rows(0).getDouble(2) == 15.5) // null-skipping sum 10.5 + 5
    assert(rows(0).getString(3) == "North") // trimmed
    assert(rows(0).getString(4) == "Evaluation June 2020")
    assert(rows(1).getLong(0) == 2060L)
    assert(rows(1).getTimestamp(1).toString.startsWith("2020-08-15"))
    assert(rows(1).getString(3) == "Unknown") // missing yard
  }

  test("phenotypic: positional parse, leading-zero ids, nullable measures") {
    val (_, phe) = XlsxFixtureConverter.convertD1(spark, d1Path)
    assert(phe.columns.toSeq == Seq("hive_id", "apiary", "capped_brood",
      "uncapped_brood", "total_brood", "varroa_may", "varroa_aug",
      "defensive_1", "defensive_2", "hygienic_1", "hygienic_2",
      "honey_yield_kg"))
    val rows = phe.orderBy("hive_id").collect()
    assert(rows.length == 2) // "ABC" id dropped
    val r = rows(0)
    assert(r.getLong(0) == 2056L) // "02056" → 2056
    assert(r.getDouble(2) == 1.5 && r.isNullAt(3) && r.getDouble(4) == 3.0)
    assert(r.getDouble(5) == 0.5 && r.isNullAt(6))
    assert(r.getDouble(11) == 12.5)
  }

  test("winter: named header lookup, survived := mortality cause is null") {
    val dir = Files.createTempDirectory("graft_xlsx_d2").toString
    val p = s"$dir/d2.xlsx"
    val sheet1 = sheetXml(Seq(
      Seq(inl("Hive ID"), inl("Apiary"), inl("Mortality cause"),
        inl("weight (kg) Nov 4 2020"), inl("weight (kg) Apr 5 2021"),
        inl("winter syrup consuption (kg)"), inl("Bees frames Oct 20"),
        inl("Bees frames Apr 2021")),
      Seq(n(2056), inl("North"), None, n(40.5), n(35.0), n(8.0), n(12), n(10)),
      Seq(n(2057), inl("North"), inl("varroa"), n(38.0), None, n(7.5), n(11), None)))
    writeXlsx(p, Nil, Seq("Sheet1" -> sheet1))
    val w = XlsxFixtureConverter.convertD2(spark, p).orderBy("hive_id").collect()
    assert(w.length == 2)
    assert(w(0).getAs[Boolean]("survived"))
    assert(w(0).isNullAt(3)) // no mortality cause
    assert(!w(1).getAs[Boolean]("survived"))
    assert(w(1).getAs[String]("mortality_cause") == "varroa")
    assert(w(1).isNullAt(5)) // missing weight_after stays null
  }
}
