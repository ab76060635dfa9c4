package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video travel
  * as opaque BINARY columns with typed metadata (plain Spark types — no
  * custom UserDefinedType needed, SURVEY §2.2 multimodal cap).
  *
  * The decode/feature kernels run per-partition over iterators
  * (`Dataset.mapPartitions` — the JVM analogue of arrow-batched python
  * UDFs): one codec instance per partition, streaming through rows without
  * materializing the partition. The codec itself is STUBBED — this container
  * ships no image/audio library — behind `MediaCodec`; the Spark-side
  * plumbing (schema, batch shape, partitioning, lazy iterators) is real and
  * is what MultimodalSpec tests.
  */
object Multimodal {

  /** One media object: bytes + typed metadata. */
  final case class MediaRow(
      path: String, kind: String, length: Long, content: Array[Byte])

  final case class ImageFeatures(
      path: String, width: Int, height: Int, channels: Int,
      meanLuma: Double, phash: Long)

  final case class FrameSample(path: String, frameIdx: Int, offsetMs: Long,
                               frame: Array[Byte])

  /** Pluggable decoder — implementations must be Serializable (executor-side).
    * A real deployment plugs in an imageio/ffmpeg-backed codec; the
    * container stub is [[FakeCodec]].
    */
  trait MediaCodec extends Serializable {
    def imageFeatures(bytes: Array[Byte]): ImageFeatures0
    def sampleFrames(bytes: Array[Byte], everyMs: Long): Seq[(Long, Array[Byte])]
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  }
  final case class ImageFeatures0(width: Int, height: Int, channels: Int,
                                  meanLuma: Double, phash: Long)

  /** Deterministic fake codec (SURVEY §7.4-style stub): derives stable
    * pseudo-features from the byte content so tests are reproducible and the
    * dataflow is end-to-end real. Clearly NOT a decoder — swap for a real
    * codec outside this container.
    */
  object FakeCodec extends MediaCodec {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    private def hash(bytes: Array[Byte]): Long =
      bytes.foldLeft(1125899906842597L)((h, b) => mix(h ^ (b & 0xffL)))

    def imageFeatures(bytes: Array[Byte]): ImageFeatures0 = {
      val h = hash(bytes)
      ImageFeatures0(
        width = 64 + (Math.floorMod(h, 1920)).toInt,
        height = 64 + (Math.floorMod(h >>> 11, 1080)).toInt,
        channels = 1 + Math.floorMod(h >>> 22, 4).toInt,
        meanLuma = Math.floorMod(h >>> 24, 256).toDouble,
        phash = mix(h))
    }
    def sampleFrames(bytes: Array[Byte], everyMs: Long): Seq[(Long, Array[Byte])] = {
      val n = 1 + Math.floorMod(hash(bytes), 5).toInt
      (0 until n).map(i => (i * everyMs, bytes.take(16)))
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.take(math.max(1, math.min(bytes.length, w * h / 64)))
  }

  /** Text-bearing document decode — the codec face of the ETL extractor
    * family (PDF today; same seam for epub/docx). Unlike [[MediaCodec]]
    * this one has a REAL in-container implementation: [[FlatePdfCodec]].
    */
  trait DocumentCodec extends Serializable {
    /** Decoded pages, in document order; Nil for undecodable bytes. */
    def extractPages(bytes: Array[Byte]): Seq[String]
  }

  /** Real PDF codec — the pure-JVM FlateDecode/CID extractor that decodes
    * the reference corpus's own Amharic volumes (graft.etl.FlatePdfExtractor,
    * PipelineSpec). This retires the fake-codec stub for the PDF case: the
    * multimodal decode path is end-to-end real for text-bearing documents.
    */
  object FlatePdfCodec extends DocumentCodec {
    def extractPages(bytes: Array[Byte]): Seq[String] =
      graft.etl.FlatePdfExtractor.extractPages(bytes)
  }

  /** PDF codec carrying a caller-supplied document password (r15) — the
    * multimodal face of `FlatePdfExtractor.withPassword`: a corpus of
    * uniformly-passworded volumes decodes through the same
    * [[extractText]] plumbing, one Serializable codec per partition.
    * Documents the password doesn't open degrade to Nil like any other
    * undecodable bytes.
    */
  final case class PasswordedPdfCodec(password: String) extends DocumentCodec {
    private val inner = graft.etl.FlatePdfExtractor.withPassword(password)
    def extractPages(bytes: Array[Byte]): Seq[String] =
      inner.extractPages(bytes)
  }

  /** Real DOCX codec (VERDICT r10 #3) — the zero-dependency zip +
    * word/document.xml extractor behind the same seam, closing the
    * reference's statute-ingestion path (auto_ingest.yml:27-29). Pages
    * split on explicit/rendered page breaks; garbage degrades to Nil.
    */
  object DocxCodec extends DocumentCodec {
    def extractPages(bytes: Array[Byte]): Seq[String] =
      graft.etl.DocxExtractor.extractPages(bytes)
  }

  /** Legacy binary `.doc` codec (r17) — the Word-97–2003 FIB +
    * piece-table extractor behind the same seam, closing the
    * old-cassation-volume population that used to decode to Nil.
    */
  object DocCodec extends DocumentCodec {
    def extractPages(bytes: Array[Byte]): Seq[String] =
      graft.etl.DocExtractor.extractPages(bytes)
  }

  /** `.doc` codec carrying a caller-supplied document password (r17) —
    * binary RC4 v1.1 / RC4 CryptoAPI documents decrypt through the same
    * [[extractText]] plumbing; wrong passwords degrade to Nil.
    */
  final case class PasswordedDocCodec(password: String) extends DocumentCodec {
    private val inner = graft.etl.DocExtractor.withPassword(password)
    def extractPages(bytes: Array[Byte]): Seq[String] =
      inner.extractPages(bytes)
  }

  final case class DocText(path: String, nPages: Int, text: String)

  /** Per-partition document text extraction via a [[DocumentCodec]] — same
    * iterator-to-iterator shape as [[imageFeatures]], one codec per
    * partition, binary in / (path, page count, joined text) out.
    */
  def extractText(media: Dataset[MediaRow], codec: DocumentCodec): Dataset[DocText] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val pages = codec.extractPages(r.content)
        DocText(r.path, pages.size, pages.mkString("\n"))
      }
    }
  }

  /** Ingest a directory of media blobs via the binaryFile source —
    * (path, modificationTime, length, content) — the S8 binary source at
    * cluster scale (splittable listing, no driver-side file walks).
    */
  def ingest(spark: SparkSession, dir: String, kind: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), lit(kind).as("kind"), col("length"), col("content"))
      .as[MediaRow]
  }

  /** Per-partition image feature extraction. One codec per partition,
    * iterator-to-iterator (never materializes the partition) — the shape
    * that keeps executor memory flat when a partition holds thousands of
    * multi-MB blobs.
    */
  def imageFeatures(media: Dataset[MediaRow], codec: MediaCodec): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val f = codec.imageFeatures(r.content)
        ImageFeatures(r.path, f.width, f.height, f.channels, f.meanLuma, f.phash)
      }
    }
  }

  /** Frame sampling: one media row → many frame rows (flatMap keeps it a
    * narrow op; downstream repartition decides frame placement).
    */
  def sampleFrames(media: Dataset[MediaRow], codec: MediaCodec,
                   everyMs: Long): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        codec.sampleFrames(r.content, everyMs).zipWithIndex.map {
          case ((off, frame), i) => FrameSample(r.path, i, off, frame)
        }
      }
    }
  }

  /** Resize passthrough — binary in, binary out, metadata preserved. */
  def resizeAll(media: Dataset[MediaRow], codec: MediaCodec,
                w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val resized = codec.resize(r.content, w, h)
        r.copy(content = resized, length = resized.length.toLong)
      }
    }
  }

  /** Near-dup over perceptual hashes: hamming distance ≤ maxDist via
    * banded equality on phash nibbles (same LSH idea as MinHashLsh — the
    * candidate join shuffles (band, key) pairs only).
    */
  def phashNearDups(features: DataFrame, maxDist: Int = 4): DataFrame = {
    val bands = 16 // 4-bit bands of the 64-bit phash
    val banded = features.select(col("path"), col("phash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
               shiftright(col("phash"), b * 4).bitwiseAND(0xfL).as("key"))): _*))
        .as("bk"))
      .select(col("path"), col("phash"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("path").as("p1"), col("phash").as("h1"),
                          col("band"), col("key"))
    val r = banded.select(col("path").as("p2"), col("phash").as("h2"),
                          col("band"), col("key"))
    l.join(r, Seq("band", "key")).filter(col("p1") < col("p2"))
      .select("p1", "p2", "h1", "h2").distinct()
      .withColumn("dist", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("dist") <= maxDist)
      .select("p1", "p2", "dist")
  }
}
