package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for parquet table directories.
  *
  * A pipeline that appends per-run (the reference's APPEND strategy,
  * batch_writer.py:306, or the streaming upsert sink's per-micro-batch
  * files) accretes files far smaller than a scan split. At 100 TB the
  * damage is real: a 10 KB file still costs one task, one footer read,
  * one scheduler round-trip — a million-file table spends more time on
  * task overhead than on data. Compaction rewrites the directory into
  * files near `targetFileBytes` (one scan, one optionally-sorted write,
  * staged + atomically swapped like UPSERT), after which scans run at
  * file-split granularity again.
  *
  * `sortCols` additionally range-clusters rows across the rewritten
  * files, so min/max row-group statistics become selective for
  * predicates on those columns — poor-man's clustering keys. */
object Compaction {

  case class CompactionStats(filesBefore: Long, filesAfter: Long,
                             bytes: Long, targetFiles: Int)

  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil): CompactionStats = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(target).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.parquet(path)
    val arranged =
      if (sortCols.nonEmpty)
        // repartitionByRange + local sort: global range clustering
        // without a single-task global sort
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)

    val staging = new Path(path + ".compacting")
    fs.delete(staging, true)
    arranged.write.mode("overwrite").parquet(staging.toString)
    val backup = new Path(path + ".old")
    fs.delete(backup, true)
    fs.rename(target, backup)
    fs.rename(staging, target)
    fs.delete(backup, true)

    val after = fs.listStatus(target).count(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    CompactionStats(files.length.toLong, after.toLong, bytes, nOut)
  }
}
