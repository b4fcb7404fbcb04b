package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** One-pass writer for the streaming replay fixtures: N single-file
  * parquet "waves" with strictly ascending mtimes (mtime order pins the
  * file-source micro-batch order under maxFilesPerTrigger=1).
  *
  * Previously each wave was its own filter+coalesce(1)+write job — three
  * scans of the source per query (q230/q254/q265). `partitionBy` on the
  * wave tag writes every wave in ONE job; a repartition on the tag keeps
  * each wave in a single task, so each partition directory holds exactly
  * one part file. The tag column is excluded from the data files by
  * partitionBy, matching the old `.drop(tag)` schema. Waves that hold no
  * rows (possible at tiny SFs) get an explicit empty single-file write —
  * the old per-wave path guaranteed a file per wave and the stream's
  * batch count is part of the declared replay semantics.
  */
object WaveFiles {

  def writeStamped(tagged: DataFrame, waveCol: String, nWaves: Int,
      wavesDir: String, scratch: String): Unit = {
    new java.io.File(wavesDir).mkdirs()
    val tmp = s"$scratch/__waves_tmp"
    tagged.repartition(nWaves, col(waveCol))
      .write.mode("overwrite").partitionBy(waveCol).parquet(tmp)
    (0 until nWaves).foreach { w =>
      val dir = new java.io.File(s"$tmp/$waveCol=$w")
      val part = Option(dir.listFiles())
        .getOrElse(Array.empty[java.io.File])
        .find(_.getName.endsWith(".parquet"))
        .getOrElse {
          // empty wave: write the single empty file the old path produced
          val etmp = s"$scratch/__wave_empty_$w"
          tagged.filter(col(waveCol) === w).drop(waveCol)
            .coalesce(1).write.mode("overwrite").parquet(etmp)
          new java.io.File(etmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
        }
      val dst = new java.io.File(wavesDir, f"wave$w%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // distinct ascending mtimes pin micro-batch order = wave order
      require(dst.setLastModified(1000000L * (w + 1)),
        s"could not stamp $dst")
    }
  }
}
