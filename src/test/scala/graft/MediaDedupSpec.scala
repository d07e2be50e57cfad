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
