package graft.multimodal

import java.io.IOException

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition.
  *
  * Every format claimed here decodes for REAL, no external libraries:
  * [[Wav]] parses genuine RIFF/WAVE PCM containers (chunk walking, 8/16-bit,
  * multi-channel), [[Bmp]] parses 24-bit BMP rasters (BGR order,
  * bottom-up/top-down rows, row padding), and [[Png]] parses genuine
  * zlib-compressed PNGs (chunk CRCs, multi-IDAT, all five scanline filters,
  * RGB + RGBA). [[extractFeatures]] dispatches on the format column and
  * computes features from DECODED pixels/samples — a mislaid byte anywhere
  * in the container or the filter reconstruction moves the result. Video is
  * real too since round 14: [[Avi]] walks genuine MJPEG-in-AVI RIFF
  * containers and [[Jpeg]] decodes every frame (T.81 baseline), so frame
  * sampling operates on decoded pixels, not byte chunks.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the storage schema a
    * 100 TB multimodal corpus would use (payload column stays unread unless
    * selected — parquet column pruning does the heavy lifting).
    */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, format: String)

  /** `n_units` is DECODED size — pixels for images, samples for audio —
    * so downstream rollups are about content, not container overhead.
    */
  case class MediaFeatures(media_id: Long, kind: String, n_units: Long,
                           features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("payload", BinaryType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("format", StringType)))

  /** Deterministic raster for doc `id` — the generator the DuckDB oracles
    * mirror. Channel c (0=R,1=G,2=B,3=A) at (x,y) is
    * `(id*7 + x*3 + y*5 + c*11) % 256`; geometry `(16+id%17) x (8+id%11)`;
    * every 4th image carries an alpha channel so both PNG color types are
    * exercised at corpus scale.
    */
  def rasterFor(id: Long): Png.Image = {
    val w = (16 + id % 17).toInt
    val h = (8 + id % 11).toInt
    val hasAlpha = id % 4 == 0
    val px = Array.tabulate(w * h) { g =>
      val x = g % w; val y = g / w
      def ch(c: Int) = ((id * 7 + x * 3 + y * 5 + c * 11) % 256).toInt
      val a = if (hasAlpha) ch(3) else 0xff
      (a << 24) | (ch(0) << 16) | (ch(1) << 8) | ch(2)
    }
    Png.Image(w, h, px, hasAlpha)
  }

  /** Deterministic PCM wave for doc `id` (mirrors q_audio_features):
    * `n = 64 + id%193` samples of `((id*31 + t*7919) % 4096) - 2048`.
    */
  def waveFor(id: Long): Array[Int] = {
    val n = (64 + id % 193).toInt
    Array.tabulate(n)(t => (((id * 31 + t.toLong * 7919) % 4096) - 2048).toInt)
  }

  /** Real decode, dispatched on the format column: PNG payloads yield
    * per-channel means over decoded pixels, WAV payloads yield
    * peak / zero-crossing-rate / mean-abs over decoded samples. One decoder
    * instantiation per partition, records streamed through it — the
    * execution shape that amortizes codec setup at scale. Unknown formats
    * fail loudly: there is no fake path left.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        r.format match {
          case "png" =>
            val img = Png.decode(r.payload)
            val n = img.pixels.length
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < n) {
              val p = img.pixels(i)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              i += 1
            }
            // widen BEFORE dividing so DuckDB reproduces the float32 exactly
            def mean(s: Long) = (s.toDouble / n / 255.0).toFloat
            MediaFeatures(r.media_id, r.kind, n.toLong,
              Array(mean(sr), mean(sg), mean(sb)))
          case "wav" =>
            val pcm = Wav.decode(r.payload)
            val ss = pcm.samples
            var peak = 0L; var zc = 0L; var sumAbs = 0L
            var t = 0
            while (t < ss.length) {
              val v = ss(t)
              if (math.abs(v) > peak) peak = math.abs(v)
              sumAbs += math.abs(v)
              if (t >= 1 && ((v < 0) != (ss(t - 1) < 0))) zc += 1
              t += 1
            }
            val n = ss.length
            MediaFeatures(r.media_id, r.kind, n.toLong, Array(
              (peak.toDouble / 2048.0).toFloat,
              (zc.toDouble / n).toFloat,
              (sumAbs.toDouble / n / 2048.0).toFloat))
          case other =>
            throw new IOException(s"no decoder for format '$other' (media ${r.media_id})")
        }
      }
    }
  }

  /** Opaque-payload byte subsample (nearest-neighbor stride): output byte j
    * of an outLen-byte digest is input byte (j*len)/outLen. This is NOT an
    * image resize — it is the fixed-width digest the perceptual-hash dedup
    * (`q_multimodal_dedup`) runs over payloads it does not decode, the
    * content-defined-sampling trick a 100 TB blob dedup uses before paying
    * for a real decode. For pixel-space resize see [[resizeImage]].
    */
  def strideBytes(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[MediaRow] = {
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

  /** REAL image resize: decode the PNG, nearest-neighbor sample the pixel
    * grid (src x = x*w/outW, src y = y*h/outH, floor), re-encode as PNG.
    * Batched per partition; output rows are themselves valid PNGs so the
    * result feeds any downstream decode.
    */
  def resizeImage(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.format != "png")
          throw new IOException(s"resizeImage: format '${r.format}' (media ${r.media_id})")
        val img = Png.decode(r.payload)
        val out = Array.tabulate(outW * outH) { j =>
          val x = j % outW; val y = j / outW
          img.pixels((y * img.height / outH) * img.width + (x * img.width / outW))
        }
        r.copy(payload = Png.encode(Png.Image(outW, outH, out, img.hasAlpha)),
          width = outW, height = outH)
      }
    }
  }

  /** Opaque synthetic media derived from the documents table — doc text
    * bytes as the payload. This is the corpus for the ops that treat
    * payloads as opaque blobs (phash dedup, frame chunking); for decodable
    * media see [[syntheticPixelMedia]].
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // no spread here (unlike [[syntheticPixelMedia]]): consumers treat the
    // payload as opaque bytes (stride digests), work too cheap to repay an
    // exchange — the pixel-media path is the one with real codec CPU
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".as("media_id"),
        when($"doc_id" % 2 === 0, "image").otherwise("audio").as("kind"),
        encode($"text", "UTF-8").as("payload"),
        lit(64).as("width"), lit(64).as("height"), lit("opaque").as("format"))
      .as[MediaRow]
  }

  /** REAL decodable synthetic media: even doc_ids become genuine PNG files
    * (deterministic raster, per-row filter type cycling through all five,
    * RGBA every 4th), odd doc_ids become genuine RIFF/WAV files (16-bit PCM
    * with a JUNK chunk so the parser must walk chunks). Payload bytes are
    * produced by the same encoders the sinks would use; everything
    * downstream decodes them for real.
    */
  def syntheticPixelMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // The id scan is one task on a one-row-group parquet input, and
    // everything downstream of it is heavy per-row codec work (PNG/WAV
    // encode, then a real decode in every consumer). Spread the 8-byte ids
    // across the cluster BEFORE the codec stage: the exchange carries ids
    // only, and the CPU-bound encode/decode runs at full parallelism
    // (guide §2.5 input skew / §8 move small rows first).
    spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id").as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.map { id =>
          if (id % 2 == 0) {
            val img = rasterFor(id)
            MediaRow(id, "image", Png.encode(img, filterFor = row => ((row + id) % 5).toInt),
              img.width, img.height, "png")
          } else {
            val wave = waveFor(id)
            MediaRow(id, "audio",
              Wav.encode(16000, 1, 16, wave, junkBytes = (id % 13).toInt),
              0, 0, "wav")
          }
        }
      }
  }

  /** Per-kind feature summary over REAL decoded media. Deterministic AND
    * oracle-exact: each float32 feature is widened to double BEFORE the
    * ×1000 (float×int would multiply in float32, whose rounding DuckDB
    * can't portably mirror; double(float) is exact), so DuckDB reproduces
    * the value bit-for-bit via CAST(… AS REAL) → DOUBLE.
    */
  def featureSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def milli(k: Int) =
      sum(round(element_at($"features", k).cast("double") * 1000).cast("long"))
    extractFeatures(syntheticPixelMedia(spark, sfDir))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_media"),
        sum($"n_units").as("total_units"),
        milli(1).as("f0_milli_sum"),
        milli(2).as("f1_milli_sum"))
      .orderBy($"kind")
  }
}
