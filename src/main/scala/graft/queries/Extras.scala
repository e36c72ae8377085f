package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal feature extraction, oracled against REAL codecs: media
  * payloads are genuine PNG (zlib, per-row filters, RGB+RGBA) and RIFF/WAV
  * containers built by the in-house encoders, decoded back by the in-house
  * decoders, and the features come from DECODED pixels/samples. The oracles
  * re-derive the same statistics from the deterministic raster/wave
  * generators (Multimodal.rasterFor / waveFor) — a byte mislaid anywhere in
  * the container, the zlib stream, or the filter reconstruction moves the
  * rollup. Float32 features are widened to double before scaling so DuckDB
  * mirrors them bit-for-bit.
  */
object Extras {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> { (s, d) => graft.multimodal.Multimodal.featureSummary(s, d) },

    // REAL resize: decode the synthetic PNGs, nearest-neighbor resample to
    // 8x8 in pixel space, re-encode as PNG — then decode the RESIZED file
    // back and roll up per-channel sums, so the oracle pins the NN index
    // math AND the round-trip through the second PNG encode/decode.
    "q_multimodal_resize" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val m = graft.multimodal.Multimodal.syntheticPixelMedia(s, d)
        .filter(_.kind == "image")
      graft.multimodal.Multimodal.resizeImage(m, 8, 8).toDF()
        .select($"media_id", $"payload").as[(Long, Array[Byte])]
        .map { case (id, p) =>
          val img = graft.multimodal.Png.decode(p)
          var sr = 0L; var sg = 0L; var sb = 0L
          img.pixels.foreach { px =>
            sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
          }
          (id % 8, img.pixels.length.toLong, sr, sg, sb)
        }.toDF("bucket", "n_px", "sr", "sg", "sb")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_media"), sum($"n_px").as("total_px"),
          sum($"sr").as("sum_r"), sum($"sg").as("sum_g"), sum($"sb").as("sum_b"))
        .orderBy($"bucket")
    },

    // multimodal NEAR-DUP: a 60-bit perceptual hash over a 64-byte
    // nearest-neighbor stride digest of the OPAQUE payload (bit k set when
    // byte k exceeds the digest mean — the aHash family) bucketed per
    // (kind, phash) — narrow per-item hash, ONE bucket shuffle, no pair
    // space: the exact-dedup contract applied to blobs a 100 TB pipeline
    // would not pay to decode. The synthetic corpus has no
    // same-kind byte-identical media, so the oracled report is the
    // HASH PROFILE (count, distinct hashes, dup mass, xor-fold of every
    // hash) — the fold pins each row's 60-bit value, so any phash drift
    // hash-mismatches even at zero duplicate families.
    "q_multimodal_dedup" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val m = graft.multimodal.Multimodal.syntheticMedia(s, d)
      graft.multimodal.Multimodal.strideBytes(m, 8, 8).toDF()
        .select($"media_id", $"kind", $"payload")
        .as[(Long, String, Array[Byte])]
        .map { case (id, kind, p) =>
          val n = p.length
          val sum = p.map(b => (b & 0xff).toLong).sum
          var bits = 0L
          var k = 0
          while (k < math.min(60, n)) {
            if ((p(k) & 0xff).toLong * n > sum) bits |= 1L << k
            k += 1
          }
          (id, kind, bits)
        }.toDF("media_id", "kind", "phash")
        .groupBy($"kind", $"phash")
        .agg(count(lit(1)).as("nb"))
        .groupBy($"kind")
        .agg(sum($"nb").as("n_media"),
          count(lit(1)).as("n_phash"),
          sum($"nb" - 1).as("n_dup_media"),
          sum($"phash" % 1000003L).as("hash_fold"))
        .orderBy($"kind")
    },

    // PIXEL-SPACE perceptual near-dup (the real-decode upgrade of
    // q_multimodal_dedup's opaque-byte aHash): decode each PNG, NN-resize
    // to 8x8 in pixel space, aHash over LUMA (bit k set when pixel k's
    // luma exceeds the image mean — the standard average-hash), then the
    // same bucketed profile contract: narrow decode+hash per item, ONE
    // phash-keyed shuffle, no pair space. The hash_fold pins every 60-bit
    // value, so a drift anywhere in zlib/filters/NN/luma hash-mismatches
    // even at zero duplicate families.
    "q_image_phash_dedup" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val m = graft.multimodal.Multimodal.syntheticPixelMedia(s, d)
        .filter(_.kind == "image")
      graft.multimodal.Multimodal.resizeImage(m, 8, 8).toDF()
        .select($"media_id", $"payload").as[(Long, Array[Byte])]
        .map { case (id, p) =>
          val img = graft.multimodal.Png.decode(p)
          val lum = img.pixels.map(px =>
            ((px >> 16) & 0xff) * 299L + ((px >> 8) & 0xff) * 587L + (px & 0xff) * 114L)
          val total = lum.sum
          var bits = 0L
          var k = 0
          while (k < 60) { if (lum(k) * 64 > total) bits |= 1L << k; k += 1 }
          (id, bits)
        }.toDF("media_id", "phash")
        .groupBy($"phash").agg(count(lit(1)).as("nb"))
        .agg(sum($"nb").as("n_media"), count(lit(1)).as("n_phash"),
          sum($"nb" - 1).as("n_dup_media"),
          sum($"phash" % 1000003L).as("hash_fold"))
    },

    // REAL video decode (no stub, no model): per-doc MJPEG-in-AVI files are
    // built frame-by-frame (each frame a genuine baseline JPEG in a RIFF
    // '00dc' chunk), then the container is RIFF-walked and every sampled
    // frame's pixels come from a genuine T.81 decode. Frames are 8x8-block-
    // constant gray at q75 — the integer-exact JPEG corner — so the oracle
    // reproduces the DECODED luma sums analytically: a byte mislaid in the
    // container walk, the Huffman stream, or the IDCT moves a row. One row
    // per sampled frame (every 2nd); narrow per-partition encode+decode,
    // volume-linear at 100 TB.
    "q_multimodal_frames" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$d/documents.parquet").select($"doc_id").as[Long]
        .repartition(s.sparkContext.defaultParallelism) // one-task scan feeding per-row codec work: spread the 8-byte ids first
      docs.mapPartitions { ids =>
        ids.flatMap { id =>
          val nf = (3 + id % 5).toInt
          val avi = graft.multimodal.Avi.encodeGrayFrames(16, 16, 10,
            (fi, b) => ((id * 31 + fi.toLong * 7 + b.toLong * 13) % 256).toInt, nf)
          val (_, frames) = graft.multimodal.Avi.decodePixels(avi)
          frames.iterator.zipWithIndex.filter(_._2 % 2 == 0).map { case (img, fi) =>
            var lum = 0L
            var k = 0
            while (k < img.pixels.length) { lum += (img.pixels(k) >> 16) & 0xff; k += 1 }
            (id, fi, img.pixels.length, lum)
          }
        }
      }.toDF("media_id", "frame_idx", "n_pixels", "lum_sum")
        .orderBy($"media_id", $"frame_idx")
    },

    // REAL audio decode (no stub): per-doc PCM waveforms are packaged as
    // genuine RIFF/WAV bytes (JUNK chunk included so the parser must walk
    // chunks) and decoded back by the pure-JVM Wav codec; audio features
    // (peak, zero crossings, energy) come from the DECODED samples, so a
    // byte mislaid anywhere in the container or the 16-bit LE decode moves
    // the rollup. Narrow per-partition encode+decode, one 8-key rollup
    // shuffle — 100 TB of audio costs exactly the decode pass.
    "q_audio_features" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      // no spread here (unlike the image/video queries): the WAV encode+
      // decode is ~100 int ops per row, cheaper than the exchange it would
      // ride behind — measured 0.50 s unspread vs 0.63 s spread at sf0.1
      val docs = s.read.parquet(s"$d/documents.parquet").select($"doc_id").as[Long]
      docs.mapPartitions { ids =>
        ids.map { id =>
          val n = (64 + id % 193).toInt
          val wave = Array.tabulate(n)(t =>
            (((id * 31 + t.toLong * 7919) % 4096) - 2048).toInt)
          val pcm = graft.multimodal.Wav.decode(
            graft.multimodal.Wav.encode(16000, 1, 16, wave, junkBytes = 11))
          val ss = pcm.samples
          var peak = 0L; var zc = 0L; var sq = 0L
          var t = 0
          while (t < ss.length) {
            val v = ss(t)
            if (math.abs(v) > peak) peak = math.abs(v)
            sq += v.toLong * v
            if (t >= 1 && ((v < 0) != (ss(t - 1) < 0))) zc += 1
            t += 1
          }
          (id % 8, ss.length.toLong, peak, zc, sq)
        }
      }.toDF("bucket", "n_samples", "peak", "zc", "sumsq")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_samples").as("sum_samples"),
          sum($"peak").as("sum_peak"),
          sum($"zc").as("sum_zc"),
          sum($"sumsq").as("sum_sumsq"))
        .orderBy($"bucket")
    },

    // REAL image decode (no stub): per-doc RGB rasters round-trip through
    // a genuine codec ALTERNATING by doc parity — even docs through PNG
    // (zlib, per-row filter cycle over all five types, RGBA every 4th doc),
    // odd docs through 24-bit BMP (row padding, bottom-up/top-down) — then
    // luma and horizontal-gradient (sharpness) features come from the
    // DECODED pixels. A swapped channel byte, a mis-padded row, a flipped
    // raster, or a bad filter reconstruction moves the rollup; the oracle
    // is codec-independent because decode(encode(x)) == x for both.
    "q_image_features" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$d/documents.parquet").select($"doc_id").as[Long]
        .repartition(s.sparkContext.defaultParallelism) // one-task scan feeding per-row codec work: spread the 8-byte ids first
      docs.mapPartitions { ids =>
        ids.map { id =>
          val w = (16 + id % 17).toInt
          val h = (8 + id % 11).toInt
          val hasAlpha = id % 4 == 0
          val px = Array.tabulate(w * h) { g =>
            val x = g % w; val y = g / w
            def ch(c: Int) = ((id * 7 + x * 3 + y * 5 + c * 11) % 256).toInt
            val a = if (hasAlpha) ch(3) else 0xff
            (a << 24) | (ch(0) << 16) | (ch(1) << 8) | ch(2)
          }
          val (iw, ih, pixels) =
            if (id % 2 == 0) {
              val back = graft.multimodal.Png.decode(graft.multimodal.Png.encode(
                graft.multimodal.Png.Image(w, h, px, hasAlpha),
                filterFor = row => ((row + id) % 5).toInt))
              (back.width, back.height, back.pixels)
            } else {
              val back = graft.multimodal.Bmp.decode(graft.multimodal.Bmp.encode(
                graft.multimodal.Bmp.Image(w, h, px.map(_ & 0xffffff)), topDown = true))
              (back.width, back.height, back.pixels)
            }
          var sumLum = 0L; var grad = 0L
          var y = 0
          while (y < ih) {
            var prev = -1L
            var x = 0
            while (x < iw) {
              val p = pixels(y * iw + x)
              val lum = ((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L +
                (p & 0xff) * 114L
              sumLum += lum
              if (prev >= 0) grad += math.abs(lum - prev)
              prev = lum
              x += 1
            }
            y += 1
          }
          (id % 8, (w * h).toLong, sumLum, grad)
        }
      }.toDF("bucket", "n_px", "sum_lum", "grad")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_px").as("sum_px"),
          sum($"sum_lum").as("sum_lum"),
          sum($"grad").as("sum_grad"))
        .orderBy($"bucket")
    },

    // REAL JPEG decode under the hash-equality oracle: JPEG is lossy, so
    // the fixture exploits the one integer-exact corner of the codec —
    // block-constant GRAY 8x8 tiles at quality 75, where the scaled luma
    // DC quantizer is exactly 8 and the whole DC-only path (level shift,
    // FDCT DC, floor(x/q+0.5) quantize, dequant, IDCT, floor(x+0.5))
    // round-trips every block value EXACTLY (JpegSpec pins the property;
    // chroma of gray is 128 and quantizes to 0 under any table). Docs
    // alternate 4:2:0 / 4:4:4 so both MCU layouts, the DC prediction
    // chain, byte stuffing, and the marker plumbing all sit under the
    // oracle; AC coding is exercised with bounded error in JpegSpec.
    // Narrow per-partition encode+decode, one 8-key rollup shuffle.
    "q_jpeg_features" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$d/documents.parquet").select($"doc_id").as[Long]
        .repartition(s.sparkContext.defaultParallelism) // one-task scan feeding per-row codec work: spread the 8-byte ids first
      docs.mapPartitions { ids =>
        ids.map { id =>
          val wb = (4 + 2 * (id % 3)).toInt // block columns (even: 4:2:0-safe)
          val hb = (2 + 2 * (id % 2)).toInt // block rows
          val w = wb * 8; val h = hb * 8
          val px = Array.tabulate(w * h) { i =>
            val g = ((id * 7 + (i % w / 8) * 13 + (i / w / 8) * 29) % 256).toInt
            (g << 16) | (g << 8) | g
          }
          val back = graft.multimodal.Jpeg.decode(graft.multimodal.Jpeg.encode(
            graft.multimodal.Jpeg.Image(w, h, px),
            quality = 75, subsample420 = id % 2 == 0))
          var sumLum = 0L; var grad = 0L
          var y = 0
          while (y < back.height) {
            var prev = -1L
            var x = 0
            while (x < back.width) {
              val p = back.pixels(y * back.width + x)
              val lum = ((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L +
                (p & 0xff) * 114L
              sumLum += lum
              if (prev >= 0) grad += math.abs(lum - prev)
              prev = lum
              x += 1
            }
            y += 1
          }
          (id % 8, (w * h).toLong, sumLum, grad)
        }
      }.toDF("bucket", "n_px", "sum_lum", "grad")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_px").as("sum_px"),
          sum($"sum_lum").as("sum_lum"),
          sum($"grad").as("sum_grad"))
        .orderBy($"bucket")
    }
  )

  def oracles: Map[String, String] = Map(
    "q_audio_features" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents),
        |s AS (SELECT doc_id, n, g,
        |    ((doc_id * 31 + g * 7919) % 4096) - 2048 AS v,
        |    CASE WHEN g >= 1
        |      THEN ((doc_id * 31 + (g - 1) * 7919) % 4096) - 2048 END AS prev
        |  FROM d, UNNEST(range(0, n)) AS t(g)),
        |p AS (SELECT doc_id, MAX(n) AS n, MAX(ABS(v)) AS peak,
        |    SUM(CASE WHEN g >= 1 AND ((v < 0) <> (prev < 0)) THEN 1 ELSE 0 END) AS zc,
        |    SUM(v * v) AS sumsq
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id % 8 AS bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS sum_samples,
        |  CAST(SUM(peak) AS BIGINT) AS sum_peak,
        |  CAST(SUM(zc) AS BIGINT) AS sum_zc,
        |  CAST(SUM(sumsq) AS BIGINT) AS sum_sumsq
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_image_features" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w, 8 + doc_id % 11 AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, g % w AS x, g // w AS y
        |  FROM d, UNNEST(range(0, w * h)) AS t(g)),
        |l AS (SELECT doc_id, w, x,
        |    ((doc_id*7 + x*3 + y*5) % 256) * 299
        |  + ((doc_id*7 + x*3 + y*5 + 11) % 256) * 587
        |  + ((doc_id*7 + x*3 + y*5 + 22) % 256) * 114 AS lum,
        |    ((doc_id*7 + (x+1)*3 + y*5) % 256) * 299
        |  + ((doc_id*7 + (x+1)*3 + y*5 + 11) % 256) * 587
        |  + ((doc_id*7 + (x+1)*3 + y*5 + 22) % 256) * 114 AS lumn
        |  FROM px),
        |p AS (SELECT doc_id, COUNT(*) AS n_px, SUM(lum) AS sum_lum,
        |    SUM(CASE WHEN x < w - 1 THEN ABS(lumn - lum) ELSE 0 END) AS grad
        |  FROM l GROUP BY doc_id)
        |SELECT doc_id % 8 AS bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n_px) AS BIGINT) AS sum_px,
        |  CAST(SUM(sum_lum) AS BIGINT) AS sum_lum,
        |  CAST(SUM(grad) AS BIGINT) AS sum_grad
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // block-constant gray tiles decode EXACTLY (DC-only path, luma q00=8 at
    // quality 75 — JpegSpec), so the oracle re-derives each 8x8 block's
    // value: luma = 1000*v per pixel, horizontal gradient only at block
    // boundaries (8 rows per block-row)
    "q_jpeg_features" ->
      """WITH d AS (SELECT doc_id, 4 + 2*(doc_id % 3) AS wb, 2 + 2*(doc_id % 2) AS hb
        |  FROM documents),
        |blk AS (SELECT doc_id, wb, hb,
        |    (doc_id*7 + (g % wb)*13 + (g // wb)*29) % 256 AS v,
        |    CASE WHEN g % wb >= 1
        |      THEN (doc_id*7 + (g % wb - 1)*13 + (g // wb)*29) % 256 END AS vprev,
        |    g % wb AS bx
        |  FROM d, UNNEST(range(0, wb * hb)) AS t(g)),
        |p AS (SELECT doc_id, MAX(wb * 8 * hb * 8) AS n_px,
        |    SUM(64 * 1000 * v) AS sum_lum,
        |    SUM(CASE WHEN bx >= 1 THEN 8 * 1000 * ABS(v - vprev) ELSE 0 END) AS grad
        |  FROM blk GROUP BY doc_id)
        |SELECT doc_id % 8 AS bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n_px) AS BIGINT) AS sum_px,
        |  CAST(SUM(sum_lum) AS BIGINT) AS sum_lum,
        |  CAST(SUM(grad) AS BIGINT) AS sum_grad
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // nearest-neighbor in pixel space: out pixel (x,y) of the 8x8 result is
    // source pixel (x*w//8, y*h//8) of the deterministic raster
    "q_multimodal_resize" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w, 8 + doc_id % 11 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |o AS (SELECT doc_id, (g % 8) * w // 8 AS sx, (g // 8) * h // 8 AS sy
        |  FROM d, UNNEST(range(0, 64)) AS t(g)),
        |p AS (SELECT doc_id,
        |    SUM((doc_id*7 + sx*3 + sy*5) % 256) AS sr,
        |    SUM((doc_id*7 + sx*3 + sy*5 + 11) % 256) AS sg,
        |    SUM((doc_id*7 + sx*3 + sy*5 + 22) % 256) AS sb
        |  FROM o GROUP BY doc_id)
        |SELECT doc_id % 8 AS bucket, COUNT(*) AS n_media,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS total_px,
        |  CAST(SUM(sr) AS BIGINT) AS sum_r, CAST(SUM(sg) AS BIGINT) AS sum_g,
        |  CAST(SUM(sb) AS BIGINT) AS sum_b
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_multimodal_dedup" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |    encode(text) AS payload FROM documents),
        |b AS (SELECT media_id, kind, octet_length(payload) AS n,
        |    list_transform(range(0, octet_length(payload)),
        |      i -> CAST('0x' || substr(hex(payload), CAST(2 * i + 1 AS INTEGER), 2) AS INTEGER)) AS bytes
        |  FROM m),
        |r AS (SELECT media_id, kind,
        |    CASE WHEN n = 0 THEN [] ELSE list_transform(range(0, 64),
        |      j -> bytes[CAST(j * n // 64 + 1 AS INTEGER)]) END AS rb
        |  FROM b),
        |h AS (SELECT media_id, kind,
        |    CASE WHEN len(rb) = 0 THEN 0 ELSE
        |      CAST(list_sum(list_transform(range(0, 60),
        |        k -> CASE WHEN rb[CAST(k + 1 AS INTEGER)] * 64 > list_sum(rb)
        |             THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT)
        |    END AS phash
        |  FROM r),
        |g AS (SELECT kind, phash, COUNT(*) AS nb FROM h GROUP BY 1, 2)
        |SELECT kind, CAST(SUM(nb) AS BIGINT) AS n_media, COUNT(*) AS n_phash,
        |  CAST(SUM(nb - 1) AS BIGINT) AS n_dup_media,
        |  CAST(SUM(phash % 1000003) AS BIGINT) AS hash_fold
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // analytic mirror of the MJPEG frames: 16x16 gray frames of four
    // 8x8-constant blocks, value (id*31 + fi*7 + b*13) % 256 — DC-exact at
    // q75, so decoded luma sums equal the closed form
    "q_multimodal_frames" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 5 AS nf FROM documents),
        |f AS (SELECT doc_id, CAST(u.fi AS INTEGER) AS frame_idx
        |  FROM d, UNNEST(range(0, nf)) AS u(fi) WHERE u.fi % 2 = 0),
        |v AS (SELECT doc_id, frame_idx,
        |    (doc_id * 31 + frame_idx * 7 + t.b * 13) % 256 AS val
        |  FROM f, UNNEST(range(0, 4)) AS t(b))
        |SELECT doc_id AS media_id, frame_idx, CAST(256 AS INTEGER) AS n_pixels,
        |  CAST(64 * SUM(val) AS BIGINT) AS lum_sum
        |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // NN indices as in q_multimodal_resize; luma from the raster generator;
    // bit k (< 60) set when lum(k)*64 > image total — mirrors the aHash
    "q_image_phash_dedup" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w, 8 + doc_id % 11 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |o AS (SELECT doc_id, g, (g % 8) * w // 8 AS sx, (g // 8) * h // 8 AS sy
        |  FROM d, UNNEST(range(0, 64)) AS t(g)),
        |l AS (SELECT doc_id, g,
        |    ((doc_id*7 + sx*3 + sy*5) % 256) * 299
        |  + ((doc_id*7 + sx*3 + sy*5 + 11) % 256) * 587
        |  + ((doc_id*7 + sx*3 + sy*5 + 22) % 256) * 114 AS lum
        |  FROM o),
        |t AS (SELECT doc_id, SUM(lum) AS total FROM l GROUP BY doc_id),
        |hb AS (SELECT l.doc_id,
        |    CAST(SUM(CASE WHEN g < 60 AND lum * 64 > total
        |      THEN CAST(1 AS BIGINT) << CAST(g AS INTEGER) ELSE 0 END) AS BIGINT) AS phash
        |  FROM l JOIN t ON l.doc_id = t.doc_id GROUP BY l.doc_id),
        |g2 AS (SELECT phash, COUNT(*) AS nb FROM hb GROUP BY phash)
        |SELECT CAST(SUM(nb) AS BIGINT) AS n_media, COUNT(*) AS n_phash,
        |  CAST(SUM(nb - 1) AS BIGINT) AS n_dup_media,
        |  CAST(SUM(phash % 1000003) AS BIGINT) AS hash_fold
        |FROM g2""".stripMargin,

    // re-derives the decoded-content statistics from the deterministic
    // generators: image f0/f1 = mean R / mean G over the raster (float32),
    // audio f0/f1 = peak/2048 and zero-crossing rate over the wave
    "q_multimodal_features" ->
      """WITH di AS (SELECT doc_id, 16 + doc_id % 17 AS w, 8 + doc_id % 11 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |ipx AS (SELECT doc_id, w, h, g % w AS x, g // w AS y
        |  FROM di, UNNEST(range(0, w * h)) AS t(g)),
        |isum AS (SELECT doc_id, MAX(w * h) AS n,
        |    SUM((doc_id*7 + x*3 + y*5) % 256) AS sr,
        |    SUM((doc_id*7 + x*3 + y*5 + 11) % 256) AS sg
        |  FROM ipx GROUP BY doc_id),
        |img AS (SELECT 'image' AS kind, COUNT(*) AS n_media,
        |    CAST(SUM(n) AS BIGINT) AS total_units,
        |    CAST(SUM(CAST(round(CAST(CAST(CAST(sr AS DOUBLE)/n/255.0 AS REAL) AS DOUBLE)*1000) AS BIGINT)) AS BIGINT) AS f0_milli_sum,
        |    CAST(SUM(CAST(round(CAST(CAST(CAST(sg AS DOUBLE)/n/255.0 AS REAL) AS DOUBLE)*1000) AS BIGINT)) AS BIGINT) AS f1_milli_sum
        |  FROM isum),
        |da AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents WHERE doc_id % 2 = 1),
        |s AS (SELECT doc_id, n, g, ((doc_id*31 + g*7919) % 4096) - 2048 AS v,
        |    CASE WHEN g >= 1 THEN ((doc_id*31 + (g-1)*7919) % 4096) - 2048 END AS prev
        |  FROM da, UNNEST(range(0, n)) AS t(g)),
        |asum AS (SELECT doc_id, MAX(n) AS n, MAX(ABS(v)) AS peak,
        |    SUM(CASE WHEN g >= 1 AND ((v < 0) <> (prev < 0)) THEN 1 ELSE 0 END) AS zc
        |  FROM s GROUP BY doc_id),
        |aud AS (SELECT 'audio' AS kind, COUNT(*) AS n_media,
        |    CAST(SUM(n) AS BIGINT) AS total_units,
        |    CAST(SUM(CAST(round(CAST(CAST(CAST(peak AS DOUBLE)/2048.0 AS REAL) AS DOUBLE)*1000) AS BIGINT)) AS BIGINT) AS f0_milli_sum,
        |    CAST(SUM(CAST(round(CAST(CAST(CAST(zc AS DOUBLE)/n AS REAL) AS DOUBLE)*1000) AS BIGINT)) AS BIGINT) AS f1_milli_sum
        |  FROM asum)
        |SELECT * FROM aud UNION ALL SELECT * FROM img ORDER BY kind""".stripMargin
  )
}
