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

  /** Returns (inputFiles, outputFiles, rows). */
  def parquet(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 512L << 20,
              shuffle: Boolean = false): (Int, Int, Long) = {
    val in = new Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(in).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val sized = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode("overwrite").parquet(outDir)
    val outParts = fs.listStatus(new Path(outDir)).count { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    (parts.length, outParts, spark.read.parquet(outDir).count())
  }
}
