package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline xlsx → parquet fixture converter (SURVEY §2.1, S3–S5): the messy
  * positional Excel parsing of the reference's annotation workbooks happens
  * HERE, once, at fixture-prep time — runtime queries see clean relational
  * parquet (FIXTURES.md A.2–A.4 schemas).
  *
  * Parse semantics mirror the reference exactly:
  *  - population: every sheet whose name starts with "Evaluation"
  *    (`/root/reference/src/data/loader.py:125-176`) — skip the sub-header
  *    row, positional columns (0=date, 1=yard, 2=hive id, 4..9=per-box
  *    frame counts), drop rows missing date or hive id, total frames =
  *    null-skipping sum of the box columns, keep only totals > 0,
  *    hive_id = int(float(...)), apiary = trimmed yard or "Unknown".
  *  - phenotypic: the "Phenotypic measurements" sheet
  *    (`loader.py:204-247`) — data from row 2, hive id at column 3 with
  *    leading zeros stripped (unparseable → row dropped), named measures at
  *    fixed positions (4,5,6,8,10,12,14,16,18,20), blanks stay null.
  *  - winter: "Sheet1" of the D2 workbook (`loader.py:259-295`) — header
  *    row 0 drives NAMED column lookup, survived := mortality cause is null.
  *
  * Usage: `runMain graft.tools.XlsxFixtureConverter <d1.xlsx> <out-dir>
  * [<d2.xlsx>]`.
  */
object XlsxFixtureConverter {

  type Grid = Vector[Vector[Option[String]]]

  private def cell(row: Vector[Option[String]], i: Int): Option[String] =
    if (i < row.size) row(i).map(_.trim).filter(_.nonEmpty) else None

  private def num(row: Vector[Option[String]], i: Int): Option[Double] =
    cell(row, i).flatMap(_.toDoubleOption)

  /** Excel stores dates as day serials from 1899-12-30; fixtures may also
    * carry ISO strings. Mirrors pd.to_datetime on the loader's date column.
    */
  private[tools] def toTimestamp(s: String): Option[Timestamp] =
    s.toDoubleOption match {
      case Some(serial) =>
        Some(new Timestamp(math.round((serial - 25569.0) * 86400.0) * 1000L))
      case None =>
        val iso = if (s.length == 10) s"$s 00:00:00" else s.replace('T', ' ')
        scala.util.Try(Timestamp.valueOf(iso)).toOption
    }

  case class PopulationRow(hive_id: Long, date: Timestamp,
      frames_of_bees: Double, apiary: String, evaluation: String)

  /** Evaluation* sheets → population rows (loader.py:125-176 semantics). */
  def population(sheets: Seq[(String, Grid)]): Seq[PopulationRow] =
    for {
      (name, grid) <- sheets
      if name.startsWith("Evaluation")
      row <- grid.drop(1) // row 0 = per-box sub-headers
      date <- cell(row, 0).flatMap(toTimestamp)
      // int(float(id)): "2056.0" and "2056" parse; text ids drop the row
      hive <- cell(row, 2).flatMap(_.toDoubleOption).map(_.toLong)
      frames = (4 to 9).flatMap(num(row, _)).sum
      if frames > 0
    } yield PopulationRow(hive, date, frames,
      cell(row, 1).getOrElse("Unknown"), name)

  case class PhenotypicRow(hive_id: Long, apiary: Option[String],
      capped_brood: Option[Double], uncapped_brood: Option[Double],
      total_brood: Option[Double], varroa_may: Option[Double],
      varroa_aug: Option[Double], defensive_1: Option[Double],
      defensive_2: Option[Double], hygienic_1: Option[Double],
      hygienic_2: Option[Double], honey_yield_kg: Option[Double])

  /** "Phenotypic measurements" sheet → rows (loader.py:204-247 semantics). */
  def phenotypic(grid: Grid): Seq[PhenotypicRow] =
    for {
      row <- grid.drop(2) // rows 0-1 = two-level headers
      // int(str.lstrip('0')): leading zeros stripped, non-integers dropped
      hive <- cell(row, 3).map(_.dropWhile(_ == '0')).flatMap(_.toLongOption)
    } yield PhenotypicRow(hive, cell(row, 1),
      num(row, 4), num(row, 5), num(row, 6),
      num(row, 8), num(row, 10),
      num(row, 12), num(row, 14),
      num(row, 16), num(row, 18),
      num(row, 20))

  case class WinterRow(hive_id: Long, apiary: Option[String],
      survived: Boolean, mortality_cause: Option[String],
      weight_before_kg: Option[Double], weight_after_kg: Option[Double],
      syrup_consumption_kg: Option[Double], frames_before: Option[Double],
      frames_after: Option[Double])

  /** D2 "Sheet1" → winter survival rows (loader.py:259-295: NAMED header
    * lookup on row 0; survived := mortality cause is null).
    */
  def winter(grid: Grid): Seq[WinterRow] = {
    val header = grid.headOption.getOrElse(Vector.empty)
      .zipWithIndex.collect { case (Some(h), i) => h.trim -> i }.toMap
    def at(row: Vector[Option[String]], name: String): Option[String] =
      header.get(name).flatMap(cell(row, _))
    for {
      row <- grid.drop(1)
      hive <- at(row, "Hive ID").flatMap(_.toDoubleOption).map(_.toLong)
    } yield WinterRow(hive, at(row, "Apiary"),
      at(row, "Mortality cause").isEmpty,
      at(row, "Mortality cause"),
      at(row, "weight (kg) Nov 4 2020").flatMap(_.toDoubleOption),
      at(row, "weight (kg) Apr 5 2021").flatMap(_.toDoubleOption),
      at(row, "winter syrup consuption (kg)").flatMap(_.toDoubleOption),
      at(row, "Bees frames Oct 20").flatMap(_.toDoubleOption),
      at(row, "Bees frames Apr 2021").flatMap(_.toDoubleOption))
  }

  def convertD1(spark: SparkSession, xlsxPath: String):
      (DataFrame, DataFrame) = {
    import spark.implicits._
    val sheets = XlsxReader.readSheets(xlsxPath)
    val pheno = sheets.collectFirst {
      case ("Phenotypic measurements", g) => g
    }.getOrElse(Vector.empty)
    (population(sheets).toDF(), phenotypic(pheno).toDF())
  }

  def convertD2(spark: SparkSession, xlsxPath: String): DataFrame = {
    import spark.implicits._
    val grid = XlsxReader.readSheets(xlsxPath).collectFirst {
      case ("Sheet1", g) => g
    }.getOrElse(Vector.empty)
    winter(grid).toDF()
  }

  def main(args: Array[String]): Unit = {
    val (d1, outDir, d2) = args match {
      case Array(a, b) => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c))
      case _ => sys.error(
        "usage: XlsxFixtureConverter <d1.xlsx> <out-dir> [<d2.xlsx>]")
    }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (pop, phe) = convertD1(spark, d1)
    pop.coalesce(1).write.mode("overwrite").parquet(s"$outDir/population.parquet")
    phe.coalesce(1).write.mode("overwrite").parquet(s"$outDir/phenotypic.parquet")
    d2.foreach { p =>
      convertD2(spark, p).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/winter.parquet")
    }
    spark.stop()
  }
}
