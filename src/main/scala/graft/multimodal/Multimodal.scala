package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition.
  *
  * UNCOMPRESSED formats decode for REAL, no external libraries: [[Wav]]
  * parses genuine RIFF/WAVE PCM containers (chunk walking, 8/16-bit,
  * multi-channel; `q_audio_features`) and [[Bmp]] parses 24-bit BMP rasters
  * (BGR order, bottom-up/top-down rows, row padding; `q_image_features`).
  * Only COMPRESSED codecs (JPEG/PNG/video) remain stubbed — those genuinely
  * need libraries this container lacks: [[FakeCodec]] is their
  * deterministic stand-in with the same shape a real decoder would have.
  * Everything around the stubs — schema, partition-batched execution via
  * `mapPartitions` (the Scala-side analogue of `mapInPandas`), feature
  * schema, downstream similarity compatibility — is real and tested.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the storage schema a
    * 100 TB multimodal corpus would use (payload column stays unread unless
    * selected — parquet column pruning does the heavy lifting).
    */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, format: String)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("payload", BinaryType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("format", StringType)))

  /** STUB decoder — a real implementation would call an image/audio codec
    * here (???-equivalent). Deterministic: 16 features, feature k = mean of
    * bytes congruent to k mod 16, scaled to [0,1]; plus byte count. Shape,
    * determinism, and batch-iteration contract match a real decoder.
    */
  object FakeCodec {
    val FeatureDim = 16
    def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](FeatureDim)
      val counts = new Array[Long](FeatureDim)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sums(b % FeatureDim) += b
        counts(b % FeatureDim) += 1
        i += 1
      }
      Array.tabulate(FeatureDim)(k =>
        if (counts(k) == 0) 0f else (sums(k).toDouble / counts(k) / 255.0).toFloat)
    }
  }

  /** Batched feature extraction: one decoder instantiation per partition,
    * records streamed through it — the execution shape that amortizes model
    * or codec setup at scale (mapInPandas semantics, Scala-typed).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would happen here (codec/model init)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          FakeCodec.decodeToFeatures(r.payload))
      }
    }
  }

  case class FrameRow(media_id: Long, frame_idx: Int, frame_len: Int, frame_sum: Long)

  /** STUB resize — a real implementation would decode, scale, re-encode.
    * The fake is nearest-neighbor byte striding: output byte j of an
    * outW×outH "image" is input byte (j·len)/(outW·outH). Deterministic,
    * oracle-reproducible, and the plumbing (batched per-partition transform
    * returning a re-usable MediaRow) is exactly a real resizer's shape.
    */
  def resize(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val outLen = outW * outH
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val out = new Array[Byte](if (n == 0) 0 else outLen)
        var j = 0
        while (j < out.length) { out(j) = r.payload((j.toLong * n / outLen).toInt); j += 1 }
        r.copy(payload = out, width = outW, height = outH)
      }
    }
  }

  /** STUB frame sampling — video payloads as fixed-size frame chunks, every
    * `everyNth` frame emitted as its own row (the explode shape a video
    * pipeline feeds downstream models with; last partial frame kept).
    * Frame content is summarized (len + byte sum) so the result is
    * DuckDB-verifiable per frame.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   everyNth: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.filter(_ % everyNth == 0).map { fi =>
          val off = fi * frameBytes
          val len = math.min(frameBytes, n - off)
          var sum = 0L
          var i = off
          while (i < off + len) { sum += r.payload(i) & 0xff; i += 1 }
          FrameRow(r.media_id, fi, len, sum)
        }
      }
    }
  }

  /** Deterministic synthetic media derived from the documents table — stands
    * in for real payloads so the plumbing is exercised end-to-end on the
    * driver's data (doc text bytes as the "payload").
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".as("media_id"),
        when($"doc_id" % 2 === 0, "image").otherwise("audio").as("kind"),
        encode($"text", "UTF-8").as("payload"),
        lit(64).as("width"), lit(64).as("height"), lit("fake").as("format"))
      .as[MediaRow]
  }

  /** Per-kind feature summary — the query-shaped surface over the stub.
    * Deterministic AND oracle-exact: the float32 feature is widened to
    * double BEFORE the ×1000 (float×int would multiply in float32, whose
    * rounding DuckDB can't portably mirror; double(float) is exact), so
    * DuckDB reproduces the value bit-for-bit via CAST(… AS REAL) → DOUBLE.
    */
  def featureSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(syntheticMedia(spark, sfDir))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_media"),
        sum($"n_bytes".cast("long")).as("total_bytes"),
        sum(round(element_at($"features", 1).cast("double") * 1000).cast("long"))
          .as("f0_milli_sum"))
      .orderBy($"kind")
  }
}
