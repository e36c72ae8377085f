package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction for parquet datasets — the maintenance pass every
  * long-running ingest needs: streaming sinks and fine-grained partitioned
  * writes accumulate thousands of KB-sized files, and at 100 TB the
  * per-file open/footer cost dominates scans long before the bytes do.
  *
  * The rewrite sizes its output from the INPUT's actual bytes
  * (ceil(totalBytes / targetBytes) files) and uses `coalesce` — a NARROW
  * dependency that merges existing partitions without a shuffle — so
  * compaction costs one read + one write and no exchange. That keeps it
  * cheap but inherits the input's row distribution; for skewed inputs pass
  * `shuffle = true` to rebalance with a round-robin `repartition` at the
  * price of one exchange.
  *
  * Output goes to a NEW directory (write-then-swap is the caller's
  * publish step) — compaction never rewrites a dataset in place, so a
  * concurrent reader of the old directory is never broken.
  */
object Compact {

  private def parquetFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[Long] = {
    // RECURSIVE: hive-partitioned layouts keep their files in key=value
    // subdirectories — a flat listing would size the rewrite from 0 bytes
    val it = fs.listFiles(dir, true)
    val sizes = Seq.newBuilder[Long]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) sizes += st.getLen
    }
    sizes.result()
  }

  /** Returns (inputFiles, outputFiles, rows). Note the rewrite flattens a
    * hive-partitioned input: partition columns become plain columns in the
    * compacted files (re-`partitionBy` at the write site if the layout
    * must survive).
    */
  def parquet(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 512L << 20,
              shuffle: Boolean = false): (Int, Int, Long) = {
    val in = new Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = parquetFiles(fs, in)
    val totalBytes = parts.sum
    val nOut = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val sized = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode("overwrite").parquet(outDir)
    val outParts = parquetFiles(fs, new Path(outDir)).length
    (parts.length, outParts, spark.read.parquet(outDir).count())
  }
}
