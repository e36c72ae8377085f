package graft.bgzf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed BGZF block inventory — the reference's BgzfBlockSource
  * (impl/formats/bgzf/BgzfBlockSource.java:38-88) as a DataFrame: one row
  * per block with its compressed offset/size and uncompressed size.
  * Diagnostic / index-building utility; each split enumerates only blocks
  * that *start* inside it, so the union over splits is exact.
  */
object BgzfBlocks {

  case class BgzfBlock(file: String, pos: Long, compressedSize: Int, uncompressedSize: Int)

  def scan(spark: SparkSession, path: String,
           splitSize: Long = 64L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val conf = new graft.sources.SerializableConf(spark.sessionState.newHadoopConf())
    val splits = graft.sources.HadoopIO.listInputFiles(path, spark.sessionState.newHadoopConf())
      .filterNot(_.getName.endsWith(".sbi"))
      .flatMap { file =>
        val fs = file.getFileSystem(conf.conf)
        val size = fs.getFileStatus(file).getLen
        val n = math.max(1L, (size + splitSize - 1) / splitSize)
        (0L until n).map(i => (file.toString, i * splitSize, math.min(size, (i + 1) * splitSize)))
      }
    spark.createDataset(splits).repartition(math.max(1, splits.size))
      .mapPartitions { it =>
        it.flatMap { case (file, start, end) =>
          val in = graft.sources.HadoopIO.open(new org.apache.hadoop.fs.Path(file), conf.conf)
          val first =
            if (start == 0L) 0L
            else BgzfBlockGuesser.nextBlockOffset(in, start)
          val out = Seq.newBuilder[BgzfBlock]
          var off = first
          val hdr = new Array[Byte](Bgzf.HeaderLength)
          val ucomp = new Array[Byte](Bgzf.MaxBlockSize)
          while (off >= 0 && off < end) {
            val got = in.preadFully(off, hdr, 0, hdr.length)
            val len = if (got >= 12) Bgzf.parseBlockLength(hdr, 0, got) else -1
            if (len < 0) { off = -1 }
            else {
              val comp = new Array[Byte](len)
              in.preadFully(off, comp, 0, len)
              val un = Bgzf.inflateBlock(comp, 0, len, ucomp)
              out += BgzfBlock(file, off, len, un)
              off += len
            }
          }
          in.close()
          out.result()
        }
      }.toDF()
  }
}
