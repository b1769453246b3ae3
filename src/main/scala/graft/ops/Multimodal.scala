package graft.ops

import org.apache.spark.sql.Dataset

/** Opaque media payload: id + raw bytes. In production the binary column
  * holds image/audio/video blobs (or object-store pointers); here the
  * fixtures provide text bytes, which is irrelevant to the plumbing. */
final case class MediaIn(doc_id: Long, media: Array[Byte])

/** [[MediaIn]] with its event time — the TTL'd streaming detector's
  * input shape (typed maps drop passenger columns, so the time rides
  * the case class). */
final case class MediaInT(doc_id: Long, media: Array[Byte],
                          eventTime: java.sql.Timestamp)

/** Typed metadata extracted per media record. */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    checksum: String,
    width: Int,
    height: Int,
    format: String)

/** Multimodal-column plumbing (SURVEY.md north-star extension).
  *
  * The engine treats media as opaque `binary` columns and runs
  * decode/feature-extract as a partition-local batch pipeline:
  * `mapPartitions` keeps per-partition setup (a real decoder would
  * initialize codecs / an ONNX session once per partition, not per row)
  * and streams records through without materializing the partition.
  *
  * The decode itself is a STUB — this container has no image/audio
  * libraries — replaced by a deterministic fake so the pipeline stays
  * testable end-to-end: real schema, real batching, fake pixels.
  */
object Multimodal {

  /** STUB decoder: deterministic fake dimensions derived from the byte
    * length; a real build swaps this body for e.g. an ImageIO/ffmpeg
    * call and keeps the signature. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    (16 + n % 64, 16 + (n / 64) % 64, "fake/rgb8")
  }

  private def sha256Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** Per-partition batched metadata extraction. Partition-parallel, no
    * shuffle; at 100 TB the input would be size-partitioned parquet with
    * the binary column pruned everywhere it isn't needed. */
  def extractMeta(ds: Dataset[MediaIn]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (once, not per record)
      it.map { r =>
        val (w, h, fmt) = decodeStub(r.media)
        MediaMeta(r.doc_id, r.media.length.toLong, sha256Hex(r.media), w, h, fmt)
      }
    }
  }

  /** STUB "decode + downscale to a fixed luminance plane" for the
    * perceptual-hash path ([[PHash]]): a real build decodes the blob
    * and resizes to an 8×8 grayscale plane (the classic aHash/pHash
    * input); the stub produces a deterministic fake with the same
    * shape — a `bins`-cell histogram of a polynomial byte-trigram hash
    * `(b0·31² + b1·31 + b2) mod bins` over the raw payload (unsigned
    * bytes). Like a real luminance plane it captures GLOBAL content
    * structure (robust to local reordering, divergent across unrelated
    * payloads) — the property the downstream mean-threshold hash
    * needs — and unlike a positional sample it is reproducible in the
    * SQL oracle. Partition-local, no shuffle; `n` is the trigram count
    * (the plane's mass) used by the threshold. */
  def luminancePlane(ds: Dataset[MediaIn], bins: Int = 64): Dataset[MediaPlane] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder/scaler setup would go here
      it.map { r =>
        val g = trigramHistogram(r.media, bins)
        MediaPlane(r.doc_id, g, math.max(r.media.length - 2, 0).toLong)
      }
    }
  }

  /** [[luminancePlane]] with the record's event time carried through —
    * the input shape the TTL'd streaming media detector needs
    * ([[graft.streaming.StreamingMediaNearDup.imageWithTtl]]); the
    * typed map would otherwise drop every passenger column. Same
    * histogram function, so the timed and untimed planes are
    * bit-identical for the same blob. */
  def luminancePlaneT(ds: Dataset[MediaInT],
                      bins: Int = 64): Dataset[MediaPlaneT] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder/scaler setup would go here
      it.map { r =>
        val g = trigramHistogram(r.media, bins)
        MediaPlaneT(r.doc_id, g, math.max(r.media.length - 2, 0).toLong,
          r.eventTime)
      }
    }
  }

  /** The stub "decode": the byte-trigram histogram shared by the timed
    * and untimed plane variants. */
  private def trigramHistogram(m: Array[Byte], bins: Int): Array[Int] = {
    val g = new Array[Int](bins)
    var i = 0
    while (i + 2 < m.length) {
      val v = ((m(i) & 0xFF) * 961 + (m(i + 1) & 0xFF) * 31 +
        (m(i + 2) & 0xFF)) % bins
      g(v) += 1
      i += 1
    }
    g
  }

  /** Per-FRAME luminance planes for the video near-dup path: each
    * consecutive `frameBytes`-byte window of the blob becomes one
    * [[FramePlane]] (STUB decode, same byte-trigram histogram as
    * [[luminancePlane]] but scoped to the frame's bytes — a real build
    * decodes each video frame and downscales it to the 8×8 grayscale
    * plane). One row in, O(frames) rows out, partition-local, no
    * shuffle; trailing partial frames are dropped (their plane mass
    * differs, so their hashes would never be comparable). */
  def framePlanes(ds: Dataset[MediaIn], frameBytes: Int = 100,
                  bins: Int = 64): Dataset[FramePlane] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (once, not per row)
      it.flatMap { r =>
        frameHists(r.media, frameBytes, bins).map { case (idx, g) =>
          FramePlane(r.doc_id, idx, g, (frameBytes - 2).toLong)
        }
      }
    }
  }

  /** [[framePlanes]] with each record's event time carried onto every
    * frame row — the TTL'd streaming VIDEO detector's input shape
    * ([[graft.streaming.StreamingMediaNearDup.videoWithTtl]]). Same
    * [[frameHists]] stub decode, so timed and untimed frame planes are
    * bit-identical for the same blob. */
  def framePlanesT(ds: Dataset[MediaInT], frameBytes: Int = 100,
                   bins: Int = 64): Dataset[FramePlaneT] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (once, not per row)
      it.flatMap { r =>
        frameHists(r.media, frameBytes, bins).map { case (idx, g) =>
          FramePlaneT(r.doc_id, idx, g, (frameBytes - 2).toLong, r.eventTime)
        }
      }
    }
  }

  /** The per-frame stub "decode": one byte-trigram histogram per full
    * `frameBytes` window — ONE definition shared by the timed and
    * untimed frame-plane routes so they cannot drift. Trailing partial
    * frames are dropped (their plane mass differs, so their hashes
    * would never be comparable). */
  private def frameHists(m: Array[Byte], frameBytes: Int,
                         bins: Int): Iterator[(Int, Array[Int])] = {
    val nFrames = m.length / frameBytes
    (0 until nFrames).iterator.map { idx =>
      val g = new Array[Int](bins)
      var i = idx * frameBytes
      val end = (idx + 1) * frameBytes - 2
      while (i < end) {
        val v = ((m(i) & 0xFF) * 961 + (m(i + 1) & 0xFF) * 31 +
          (m(i + 2) & 0xFF)) % bins
        g(v) += 1
        i += 1
      }
      (idx, g)
    }
  }

  /** Frame sampling: each media blob fans out to every `stride`-th
    * "frame" (STUB: a frame is a fixed-size byte window — a real build
    * swaps the windowing for codec frame extraction and keeps the
    * one-to-many iterator shape). One row in, O(frames) rows out, no
    * shuffle; the per-frame checksum stands in for decoded pixels. */
  def sampleFrames(ds: Dataset[MediaIn], frameBytes: Int = 100,
                   stride: Int = 4): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = r.media.length / frameBytes
        (0 until nFrames by stride).iterator.map { idx =>
          val frame = java.util.Arrays.copyOfRange(
            r.media, idx * frameBytes, (idx + 1) * frameBytes)
          MediaFrame(r.doc_id, idx, frame.length, sha256Hex(frame))
        }
      }
    }
  }
}

/** A media record's fixed-size luminance plane (stub: byte-trigram
  * histogram) + its mass `n` (Σ g). */
final case class MediaPlane(doc_id: Long, g: Array[Int], n: Long)

/** [[MediaPlane]] carrying its record's event time. */
final case class MediaPlaneT(doc_id: Long, g: Array[Int], n: Long,
                             eventTime: java.sql.Timestamp)

/** One frame's fixed-size luminance plane (stub: byte-trigram histogram
  * over the frame's bytes) + its mass `n`. */
final case class FramePlane(doc_id: Long, frame_idx: Int, g: Array[Int], n: Long)

/** [[FramePlane]] carrying its record's event time. */
final case class FramePlaneT(doc_id: Long, frame_idx: Int, g: Array[Int],
                             n: Long, eventTime: java.sql.Timestamp)

/** One sampled frame of a media blob. */
final case class MediaFrame(
    doc_id: Long,
    frame_idx: Int,
    n_bytes: Int,
    checksum: String)

/** A media record after resize: same id, transformed payload + dims. */
final case class MediaResized(
    doc_id: Long, media: Array[Byte], width: Int, height: Int)

/** A media embedding ready for the ANN path (x05/x06/x12). */
final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

object MultimodalTransforms {
  import org.apache.spark.sql.Dataset

  /** STUB resize: deterministic byte subsampling to a target budget (a
    * real build swaps in a pixel-space scaler and keeps the shape:
    * binary in, smaller binary + new dims out, partition-local). */
  def resize(ds: Dataset[MediaIn], targetBytes: Int = 256): Dataset[MediaResized] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        // ceil division: floor would leave payloads in
        // [targetBytes, 2*targetBytes) completely unshrunk
        val stride = math.max(1,
          (r.media.length + targetBytes - 1) / targetBytes)
        val out = r.media.indices.by(stride).map(r.media).toArray
        val (w, h, _) = Multimodal.decodeStub(out)
        MediaResized(r.doc_id, out, w, h)
      }
    }
  }

  /** STUB feature extraction: bytes → deterministic pseudo-embedding
    * (a real build runs a per-partition ONNX/vision session here). The
    * output feeds the SAME similarity-search operators as text
    * embeddings — brute-force/LSH/IVF top-k and vec_cosine — which is
    * the point: multimodal rows join the corpus-wide ANN path with no
    * special-casing. */
  def embed(ds: Dataset[MediaIn], dim: Int = 64): Dataset[MediaEmbedding] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val seed = java.nio.ByteBuffer.wrap(md.digest(r.media).take(8)).getLong
        val rnd = new java.util.Random(seed)
        val v = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat max 1e-6f
        MediaEmbedding(r.doc_id, v.map(_ / norm))
      }
    }
  }
}
