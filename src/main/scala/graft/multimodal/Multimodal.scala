package graft.multimodal

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque media payload + typed metadata.
  * Image/audio/video payloads are just `binary` columns to the engine —
  * schema, partitioning and shuffle treat them as sized byte bags.
  */
case class MediaBlob(doc_id: Long, payload: Array[Byte], mime: String)

/** Decoded (fake) feature vector + provenance. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Float])

/** Multimodal column plumbing (north star): treat media as opaque
  * `binary` with typed metadata; decode / feature-extract / frame-sample
  * as batched per-partition transforms.
  *
  * The DECODE step is a deterministic stand-in (byte-window means) —
  * this container has no image/audio codecs. Everything around it is
  * real and tested: the binary schema, the `mapPartitions` iterator
  * shape (one JVM-side batch per partition, the Scala analog of a
  * `mapInPandas` batch), partition-preserving execution, and the
  * metadata/chunking column ops with DuckDB oracles (mm01/mm02).
  */
object Multimodal {

  /** Stand-in payload: UTF-8 bytes of a text column. A real pipeline
    * reads `binary` straight from parquet. */
  def blobOf(text: Column): Column = text.cast("binary")

  def byteLength(blob: Column): Column = length(blob).cast("long")

  /** Content digest over the raw bytes (dedup/id key for media). */
  def contentMd5(blob: Column): Column = md5(blob)

  /** Number of fixed-size chunks (frames) the payload splits into. */
  def chunkCount(blob: Column, chunkBytes: Int): Column =
    ceil(byteLength(blob) / lit(chunkBytes.toDouble)).cast("long")

  /** Decode seam: per-partition batched transform producing a
    * fixed-dimension feature vector per blob. Feature d is the mean of
    * the d-th of `dim` equal byte windows — deterministic, so tests and
    * oracles can pin it. Swap the window-mean body for a real codec
    * (JNI/ONNX/whatever) without touching the plumbing: the signature,
    * batching, and schema stay identical.
    *
    * Scale notes: runs partition-local (no shuffle), streams the
    * iterator (no partition materialization), and the output carries
    * only (id, size, dim floats) — the heavy payload is dropped as
    * early as possible.
    */
  def decodeFeatures(blobs: Dataset[MediaBlob], dim: Int)
      : Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val bytes = b.payload
        val n = bytes.length
        val feats = Array.tabulate(dim) { d =>
          val from = (d.toLong * n / dim).toInt
          val until = ((d + 1).toLong * n / dim).toInt
          if (until <= from) 0f
          else {
            var s = 0L
            var i = from
            while (i < until) { s += bytes(i) & 0xff; i += 1 }
            (s.toDouble / (until - from)).toFloat
          }
        }
        MediaFeatures(b.doc_id, n.toLong, feats)
      }
    }
  }

  /** Resize seam (the spatial twin of mm06's temporal frame sampling):
    * shrink each payload to at most `outBytes` by box-averaging equal
    * byte windows — window d of the output is the rounded mean of the
    * d-th of `outBytes` equal input windows (the byte-level analog of
    * area-averaging image downscale, deterministic so tests pin it).
    * Payloads already at or under `outBytes` pass through verbatim.
    * Same plumbing contract as [[decodeFeatures]]: partition-local,
    * iterator-streamed, heavy payload shrunk as early as possible —
    * swap the body for a real image resampler without touching the
    * signature, batching or schema. */
  def resize(blobs: Dataset[MediaBlob], outBytes: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val bytes = b.payload
        val n = bytes.length
        if (n <= outBytes) b
        else {
          val out = Array.tabulate(outBytes) { d =>
            val from = (d.toLong * n / outBytes).toInt
            val until = ((d + 1).toLong * n / outBytes).toInt
            var s = 0L
            var i = from
            while (i < until) { s += bytes(i) & 0xff; i += 1 }
            ((s + (until - from) / 2) / (until - from)).toByte // rounded mean
          }
          MediaBlob(b.doc_id, out, b.mime)
        }
      }
    }
  }
}
