package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 I): treat media payloads
  * as opaque binary columns + typed metadata, with the decode /
  * feature-extract step as a per-partition batch transform — the Scala
  * analog of `mapInPandas` (iterator of batches in, iterator of
  * batches out; the decoder touches each partition's rows in one pass,
  * so a real codec would amortize model/codec init per partition, not
  * per row).
  *
  * The actual media codec is STUBBED (no image/audio libs in this
  * container) with a deterministic fake decode; the Spark-side
  * contract — schema, binary payload handling, partition-batch shape —
  * is real and unit-tested.
  */
object Multimodal {

  /** Decoded-media metadata record produced by the stub decoder. */
  final case class MediaMeta(doc_id: Long, byte_len: Int, checksum: Long,
      fake_width: Int, fake_height: Int, source: String)

  /** STUB codec: deterministic pseudo-decode of a binary payload.
    * A real implementation would load the native codec/model in the
    * constructor (per partition) and hand `payload` to it per row;
    * everything around it — batching, schema, partition-amortized
    * init — is production-shaped. The fake features derive from the
    * payload's MD5 leading word, so the whole decode is reproducible
    * in the DuckDB oracle (unlike a real codec, which would get a
    * rows-only check).
    */
  private final class StubCodec extends Serializable {
    def decode(docId: Long, payload: Array[Byte], source: String): MediaMeta = {
      val (h1, _) = graft.functions.Md5Words.firstTwoWords(payload)
      MediaMeta(docId, payload.length, h1,
        fake_width = 16 + (h1 % 1024).toInt,
        fake_height = 16 + ((h1 / 1024) % 1024).toInt,
        source)
    }
  }

  /** Binary payload table + per-partition batch "decode" →
    * typed metadata, value-checked against the MD5-derived oracle.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // null payloads carry nothing to decode — drop them BEFORE the
    // codec (a real decoder would NPE); mirrored in the oracle, so
    // parity holds whether or not the corpus has them
    val media = Tables(spark, dir).documents
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        col("source"))
    media.as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        // per-PARTITION codec init (the expensive step a real media
        // codec amortizes over the whole batch — the reason this is
        // mapPartitions and not a per-row UDF)
        val codec = new StubCodec()
        batch.map { case (id, payload, src) => codec.decode(id, payload, src) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val multimodalMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(strlen(text) AS INTEGER) AS byte_len,
      |         ('0x' || substr(md5(text), 1, 8))::BIGINT AS checksum, source
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, byte_len, checksum,
      |  CAST(16 + checksum % 1024 AS INTEGER) AS fake_width,
      |  CAST(16 + (checksum // 1024) % 1024 AS INTEGER) AS fake_height,
      |  source
      |FROM m ORDER BY doc_id""".stripMargin

  /** One sampled frame of a media payload (stub decode). */
  final case class FrameMeta(doc_id: Long, frame_idx: Int, frame_ts_ms: Long,
      frame_checksum: Long)

  private val FrameStride = 4
  private val FpsDen = 24 // "video" fps for the frame-timestamp math

  /** Video-style frame sampling: each payload row fans out to every
    * `FrameStride`-th frame (index, timestamp, per-frame feature) via a
    * per-partition batch decode — the 1→N row shape of real frame
    * extraction (`mapInPandas` yielding multiple rows per input), with
    * the codec stubbed deterministically (MD5 word of payload#idx) so
    * the whole fan-out is value-checked in DuckDB. Frame count derives
    * from the payload's metadata (n_chars), not its bytes — the
    * decode-free metadata path a real pipeline uses to size work before
    * touching pixels. Map-only at any scale: no shuffle until the
    * (optional) downstream aggregation.
    */
  def multimodalFramesample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("text"), col("n_chars"))
    media.as[(Long, String, Long)]
      .mapPartitions { batch =>
        // per-partition "codec" init, then a flat 1→N frame fan-out
        // per row — mirrors a real frame sampler's batch contract
        batch.flatMap { case (id, payload, nChars) =>
          val nFrames = (4 + nChars % 28).toInt
          (0 until nFrames by FrameStride).iterator.map { fi =>
            val (h1, _) = graft.functions.Md5Words.firstTwoWords(
              (payload + "#" + fi).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            FrameMeta(id, fi, fi.toLong * 1000 / FpsDen, h1)
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  val multimodalFramesampleSql: String =
    s"""WITH m AS (
      |  SELECT doc_id, text, CAST(4 + n_chars % 28 AS INTEGER) AS n_frames
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |f AS (SELECT doc_id, text, unnest(range(0, n_frames)) AS fi FROM m)
      |SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
      |  CAST(fi * 1000 // $FpsDen AS BIGINT) AS frame_ts_ms,
      |  ('0x' || substr(md5(text || '#' || CAST(fi AS VARCHAR)), 1, 8))::BIGINT AS frame_checksum
      |FROM f WHERE fi % $FrameStride = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** One image patch of a media payload (stub decode). */
  final case class PatchMeta(doc_id: Long, patch_x: Int, patch_y: Int,
      patch_checksum: Long, intensity: Int)

  private val PatchGrid = 4 // 4×4 patches after the stub "resize"

  /** ViT-style patch extraction: each payload "resizes" to a fixed
    * square and fans out to a [[PatchGrid]]² patch grid with a
    * per-patch stub feature — the 1→N preprocessing shape of a vision
    * encoder's input pipeline (resize → patchify → per-patch embed),
    * with the pixel work stubbed deterministically (MD5 word of
    * payload#x#y) so the fan-out is value-checked in DuckDB. Same
    * per-partition batch-decode contract as the other multimodal ops:
    * a real implementation amortizes codec/model init per partition
    * and yields patch batches; map-only at any scale.
    */
  def multimodalPatches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    media.as[(Long, String)]
      .mapPartitions { batch =>
        batch.flatMap { case (id, payload) =>
          for {
            py <- (0 until PatchGrid).iterator
            px <- (0 until PatchGrid).iterator
          } yield {
            val (h1, _) = graft.functions.Md5Words.firstTwoWords(
              (payload + "#" + px + "#" + py)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            PatchMeta(id, px, py, h1, (h1 % 256).toInt)
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "patch_y", "patch_x")
  }

  val multimodalPatchesSql: String =
    s"""WITH m AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT doc_id, text, unnest(range(0, $PatchGrid)) AS py FROM m),
      |p AS (SELECT doc_id, text, py, unnest(range(0, $PatchGrid)) AS px FROM g),
      |h AS (SELECT doc_id, CAST(px AS INTEGER) AS patch_x, CAST(py AS INTEGER) AS patch_y,
      |        ('0x' || substr(md5(text || '#' || CAST(px AS VARCHAR) || '#' || CAST(py AS VARCHAR)), 1, 8))::BIGINT AS patch_checksum
      |      FROM p)
      |SELECT doc_id, patch_x, patch_y, patch_checksum,
      |  CAST(patch_checksum % 256 AS INTEGER) AS intensity
      |FROM h ORDER BY doc_id, patch_y, patch_x""".stripMargin

  // ---------------------------------------------------- multimodal_chunk_audio

  private val ChunkWin = 256 // bytes per analysis window
  private val ChunkHop = 128 // 50% overlap — the standard audio framing

  /** Audio-style windowed chunking of a binary payload: overlapping
    * [[ChunkWin]]-byte windows every [[ChunkHop]] bytes (the STFT
    * framing shape), each chunk carrying its offset, true byte count
    * (the tail window is short) and a checksum feature — the 1→N
    * byte-slicing plumbing a real audio featurizer runs before the
    * DSP, with the DSP stubbed to the md5 word (payloads are ASCII
    * text stand-ins, so byte slicing == DuckDB character slicing and
    * the whole fan-out is value-checked).
    *
    * Scale shape: sequence+explode is map-side (1→⌈len/hop⌉ rows, no
    * shuffle); windows slice with substr — no per-chunk copy of the
    * whole payload survives the projection. Real codecs swap the
    * md5 for the frame transform; the framing plan is unchanged.
    *
    * Empty payloads are excluded on BOTH engines: Spark's
    * `sequence(0, -1)` on a zero-length payload generates the
    * DESCENDING sequence [0, -1] (two spurious chunks, one at
    * negative offset) where DuckDB's `range(0, 0)` generates none —
    * the `length > 0` guard pins the convention "no payload → no
    * chunks" instead of leaving it to each engine's empty-range shape
    * (empty-payload fan-out is value-tested in Round10Spec).
    */
  def multimodalChunkAudio(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), col("payload"),
        explode(expr(s"sequence(0, CAST(floor((length(payload) - 1) / $ChunkHop) AS INT))")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkHop).as("byte_off"),
        expr(s"substr(payload, chunk_idx * $ChunkHop + 1, $ChunkWin)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("byte_off"),
        length(col("chunk")).cast("int").as("n_bytes"),
        expr("CAST(conv(substr(md5(chunk), 1, 8), 16, 10) AS BIGINT)").as("chunk_checksum"))
      .orderBy("doc_id", "chunk_idx")
  }

  val multimodalChunkAudioSql: String =
    s"""WITH m AS (
      |  SELECT doc_id, text AS payload, strlen(text) AS len
      |  FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
      |x AS (
      |  SELECT doc_id, payload,
      |    unnest(range(0, CAST(floor((len - 1) / $ChunkHop) AS BIGINT) + 1)) AS chunk_idx
      |  FROM m),
      |c AS (
      |  SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      |    CAST(chunk_idx * $ChunkHop AS INTEGER) AS byte_off,
      |    substr(payload, CAST(chunk_idx * $ChunkHop + 1 AS INTEGER), $ChunkWin) AS chunk
      |  FROM x)
      |SELECT doc_id, chunk_idx, byte_off,
      |  CAST(strlen(chunk) AS INTEGER) AS n_bytes,
      |  ('0x' || substr(md5(chunk), 1, 8))::BIGINT AS chunk_checksum
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------------------------ multimodal_dedup

  /** Content-hash (digest-identity) dedup — the FIRST curation step
    * of any media corpus (identical bytes under different doc ids:
    * re-crawls, mirror uploads): full-payload md5 identity groups
    * with a deterministic min-id canonical and the duplicate id
    * list. The driver corpus carries no binary media table, so the
    * payload here is the document's UTF-8 TEXT BYTES (`text` cast to
    * binary, md5'd byte-wise) — the identical plan applies unchanged
    * to an image/audio `binary` column, since only the 16-byte
    * digest ever leaves the scan. Map-side 16-byte keys; only hash
    * groups with >1 member survive the aggregate.
    *
    * Scale shape: the shuffle carries (hash, doc_id) pairs, never
    * payloads; at 100 TB of media this is the same
    * hash-then-group-by-digest plan every blob store dedup runs.
    *
    * Data note: the driver corpus has byte-identical payloads only
    * from sf0.1 up (8 groups); at sf0.01/0.001 the correct result is
    * empty — the planted-duplicate unit test pins the live path.
    */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents
      .filter(col("text").isNotNull)
      .select(md5(col("text").cast("binary")).as("content_md5"), col("doc_id"))
      .groupBy(col("content_md5"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("canonical_doc_id"),
        // id-sorted CSV, not an array — the listagg_export compare
        // convention (array element nullability never hashes cleanly)
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("doc_ids"))
      .filter(col("n_copies") > 1)
      .orderBy("content_md5")
  }

  val multimodalDedupSql: String =
    """WITH h AS (
      |  SELECT md5(text) AS content_md5, doc_id
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT content_md5, CAST(count(*) AS BIGINT) AS n_copies,
      |  min(doc_id) AS canonical_doc_id,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
      |FROM h GROUP BY content_md5
      |HAVING count(*) > 1
      |ORDER BY content_md5""".stripMargin
}
