package graft

import graft.ops.{Dedup, MediaDedup}
import org.apache.spark.sql.functions._

class MediaDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic LCG-noise image: high-entropy pixels so dHash is
    * non-degenerate; `brighten` lifts every channel uniformly, which
    * preserves ALL horizontal luminance comparisons → dHash identical,
    * byte + pixel hashes different.
    */
  private def noiseImage(seed: Long, w: Int, h: Int, brighten: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed * 6364136223846793005L + 1442695040888963407L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val v = math.min(((s >>> 40) & 0xFF).toInt, 205) + brighten
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def reencodeBmp(png: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  test("re-encoded image: bytes differ, pixel signature matches") {
    val png = noiseImage(1L, 40, 30)
    val bmp = reencodeBmp(png)
    assert(!java.util.Arrays.equals(png, bmp))
    assert(MediaDedup.decodePixelHash(png) == MediaDedup.decodePixelHash(bmp))
  }

  test("exactPixelDuplicatePairs finds exactly the planted re-encodes") {
    val rows = (0L until 20L).map(i => (i, noiseImage(i, 32, 24))) ++
      Seq((100L, reencodeBmp(noiseImage(3L, 32, 24))),
        (101L, reencodeBmp(noiseImage(7L, 32, 24))))
    val media = rows.toDF("doc_id", "payload")
    val pairs = MediaDedup.exactPixelDuplicatePairs(media)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 100L), (7L, 101L)))
  }

  test("corrupt payloads are dropped, not grouped together") {
    val media = Seq(
      (0L, noiseImage(0L, 16, 16)),
      (1L, Array[Byte](1, 2, 3)),
      (2L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    assert(MediaDedup.exactPixelDuplicatePairs(media).isEmpty)
    assert(MediaDedup.pixelSignatures(media).count() == 1)
  }

  test("dHash: brightness shift is near-identical, different noise is far") {
    val a = MediaDedup.decodeDHash(noiseImage(5L, 64, 48)).get
    val b = MediaDedup.decodeDHash(noiseImage(5L, 64, 48, brighten = 12)).get
    val c = MediaDedup.decodeDHash(noiseImage(99L, 64, 48)).get
    assert(java.lang.Long.bitCount(a ^ b) <= 3)
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }

  test("nearDuplicatePairs pairs the brightened twin and nothing else") {
    val rows = (0L until 12L).map(i => (i, noiseImage(i * 17L + 1L, 48, 36))) ++
      Seq((200L, noiseImage(5L * 17L + 1L, 48, 36, brighten = 10)))
    val pairs = MediaDedup.nearDuplicatePairs(rows.toDF("doc_id", "payload"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((5L, 200L)))
  }

  /** Canonical 44-byte-header mono 16-bit WAV; `padded` inserts a
    * benign LIST chunk between fmt and data — same sound, different
    * bytes (the metadata-stripped-duplicate scenario). */
  private def wav(samples: Array[Short], rate: Int, padded: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    def le32(v: Int): Unit = { d.write(v & 0xFF); d.write(v >> 8 & 0xFF); d.write(v >> 16 & 0xFF); d.write(v >> 24 & 0xFF) }
    def le16(v: Int): Unit = { d.write(v & 0xFF); d.write(v >> 8 & 0xFF) }
    val extra = if (padded) 12 else 0
    d.writeBytes("RIFF"); le32(36 + extra + samples.length * 2); d.writeBytes("WAVE")
    d.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
    if (padded) { d.writeBytes("LIST"); le32(4); d.writeBytes("INFO") }
    d.writeBytes("data"); le32(samples.length * 2)
    samples.foreach(s => le16(s & 0xFFFF))
    bos.toByteArray
  }

  test("audio: padded-chunk twin hashes equal; different samples differ") {
    val s1 = Array.tabulate(500)(i => ((i * 37) % 2000 - 1000).toShort)
    val plain = wav(s1, 16000, padded = false)
    val pad = wav(s1, 16000, padded = true)
    assert(!java.util.Arrays.equals(plain, pad))
    assert(MediaDedup.audioContentHash(plain).isDefined)
    assert(MediaDedup.audioContentHash(plain) == MediaDedup.audioContentHash(pad))
    val other = wav(s1.map(x => (x + 1).toShort), 16000, padded = false)
    assert(MediaDedup.audioContentHash(plain) != MediaDedup.audioContentHash(other))
  }

  test("video: trailing junk after the GIF trailer hashes equal") {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(noiseImage(11L, 24, 18)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val gif = bos.toByteArray
    val junked = gif ++ Array[Byte](9, 9, 9, 9)
    assert(MediaDedup.videoContentHash(gif).isDefined)
    assert(MediaDedup.videoContentHash(gif) == MediaDedup.videoContentHash(junked))
  }

  test("exactContentDuplicatePairs: all modalities in one pass, typed groups") {
    val s1 = Array.tabulate(300)(i => ((i * 13) % 1000 - 500).toShort)
    val rows = Seq(
      (0L, "image", noiseImage(3L, 32, 24)),
      (1L, "image", reencodeBmp(noiseImage(3L, 32, 24))),
      (2L, "audio", wav(s1, 16000, padded = false)),
      (3L, "audio", wav(s1, 16000, padded = true)),
      (4L, "image", noiseImage(9L, 32, 24)),
      (5L, "audio", wav(s1.map(x => (x + 5).toShort), 16000, padded = false)))
    val media = rows.toDF("doc_id", "media_type", "payload")
    val pairs = MediaDedup.exactContentDuplicatePairs(media)
      .select($"media_type", $"a", $"b").as[(String, Long, Long)].collect().toSet
    assert(pairs == Set(("image", 0L, 1L), ("audio", 2L, 3L)))
  }

  test("hammingNearDuplicates drops oversize buckets (cap respected)") {
    // 300 identical fingerprints: every segment bucket is size 300 >
    // maxBucket 256 → dropped, no quadratic pair explosion
    val fps = (0L until 300L).map(i => (i, 0x1234567890abcdefL)).toDF("doc_id", "fp")
    assert(Dedup.hammingNearDuplicates(fps).isEmpty)
    // at a roomier cap the same bucket yields all pairs
    val some = (0L until 5L).map(i => (i, 0x1234567890abcdefL)).toDF("doc_id", "fp")
    assert(Dedup.hammingNearDuplicates(some).count() == 10)
  }
}
