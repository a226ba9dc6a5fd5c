package graft.spark

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style table emulation over Parquet (SURVEY.md §7.0: no Iceberg
  * runtime jar ships in this environment, so the pieces the north rule
  * uses — append snapshots, atomic commits, exact resumability, partition
  * metadata — are provided by this ~100-line catalog; swapping in real
  * Iceberg is a config change since all access goes through here).
  *
  * Layout:
  *   table/
  *     data/snap-<id>/   parquet files of one append
  *     snapshots/<id>.json  {"id":N,"parent":N-1,"dir":"data/snap-N","rows":R}
  *     VERSION           latest snapshot id (atomic rename commit)
  *
  * A snapshot becomes visible only when VERSION is renamed into place —
  * torn writes leave the previous snapshot current (manifest-last
  * protocol), which is what makes resume exactly-once.
  */
object IcebergLite {

  def currentSnapshot(tableDir: String): Long = {
    val v = new File(tableDir, "VERSION")
    if (!v.exists()) -1L
    else new String(Files.readAllBytes(v.toPath)).trim.toLong
  }

  /** Append `df` as a new snapshot; returns the committed snapshot id.
    *
    * Crash-safe (single writer): if a previous run died AFTER writing
    * data/manifest for this id but BEFORE the VERSION rename, that
    * snapshot is invisible (manifest-last protocol) — so this attempt may
    * legitimately reuse the id. Overwrite semantics on the data dir and
    * REPLACE_EXISTING on the manifest make the retry automatic instead of
    * failing on the orphaned leftovers.
    */
  def append(df: DataFrame, tableDir: String): Long = {
    val parent = currentSnapshot(tableDir)
    val id = parent + 1
    val dataDir = s"$tableDir/data/snap-$id"
    df.write.mode("overwrite").parquet(dataDir)
    val rows = 0L // row count is informational; avoid an extra job here
    Files.createDirectories(Paths.get(s"$tableDir/snapshots"))
    val manifest =
      s"""{"id":$id,"parent":$parent,"dir":"data/snap-$id","rows":$rows}"""
    val tmpM = Paths.get(s"$tableDir/snapshots/.$id.json.tmp")
    Files.write(tmpM, manifest.getBytes("UTF-8"))
    Files.move(tmpM, Paths.get(s"$tableDir/snapshots/$id.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val tmpV = Paths.get(s"$tableDir/.VERSION.tmp")
    Files.write(tmpV, id.toString.getBytes("UTF-8"))
    Files.move(tmpV, Paths.get(s"$tableDir/VERSION"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /** Read the union of all snapshots up to the current one; None if the
    * table has no committed snapshot.
    */
  def readAll(spark: SparkSession, tableDir: String): Option[DataFrame] = {
    val cur = currentSnapshot(tableDir)
    if (cur < 0) None
    else {
      val dirs = (0L to cur).map(i => s"$tableDir/data/snap-$i")
        .filter(d => new File(d).exists())
      Some(spark.read.parquet(dirs: _*))
    }
  }

  /** Read one snapshot's data only. */
  def readSnapshot(spark: SparkSession, tableDir: String, id: Long): DataFrame =
    spark.read.parquet(s"$tableDir/data/snap-$id")
}
