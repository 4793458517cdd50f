package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** The multimodal pipeline's real parts: the javax.imageio decode path
  * (actual PNG codec round-trip on executors) and the ASCII invariant
  * the frame/resize oracles rely on.
  */
class MultimodalSpec extends SparkSpec {

  test("PNG encode->decode round-trip recovers the generating pixel formula") {
    implicit val s = spark
    val docs = Tables.documents(spark, sf).limit(20)
    val stats = Multimodal.decodeImages(Multimodal.syntheticImages(docs))
      .collect().map(st => st.doc_id -> st).toMap
    assert(stats.nonEmpty)
    stats.foreach { case (id, st) =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      assert(st.width === w)
      assert(st.height === h)
      // recompute the channel means straight from the formula (no codec)
      def mean(f: (Long, Long) => Long): Double = {
        var sum = 0L
        for (y <- 0L until h; x <- 0L until w) sum += f(x, y)
        math.floor(sum.toDouble / (w * h) * 1e4 + 0.5) / 1e4
      }
      assert(st.mean_r === mean((x, y) => (id * 31 + x * 7 + y * 13) % 256))
      assert(st.mean_g === mean((x, y) => (id * 17 + x * 11 + y * 5) % 256))
      assert(st.mean_b === mean((x, y) => (id * 29 + x * 3 + y * 19) % 256))
    }
  }

  test("decode really goes through the PNG codec (payload is a valid PNG)") {
    implicit val s = spark
    val row = Multimodal.syntheticImages(Tables.documents(spark, sf).limit(1))
      .head()
    // PNG magic bytes: the payload is codec output, not a formula dump
    assert(row.media.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(row.meta.kind === "image" && row.meta.encoding === "png")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.media))
    assert(img.getWidth === (4 + row.doc_id % 5).toInt)
  }

  test("WAV encode->decode round-trip recovers the generating sample formula") {
    implicit val s = spark
    val docs = Tables.documents(spark, sf).limit(20)
    val stats = Multimodal.decodeAudio(Multimodal.syntheticAudio(docs))
      .collect().map(st => st.doc_id -> st).toMap
    assert(stats.nonEmpty)
    stats.foreach { case (id, st) =>
      val n = (50 + id % 30).toInt
      val samples = (0 until n)
        .map(t => ((id * 131L + t.toLong * t * 7 + t * 13L) % 20001L - 10000L).toInt)
      assert(st.n_samples === n)
      assert(st.sample_rate === 8000)
      assert(st.peak === samples.map(math.abs).max)
      // half away from zero, the cross-engine round(x,4) convention
      def rnd4(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4
      assert(st.mean_amp === rnd4(samples.map(_.toLong).sum.toDouble / n))
      assert(st.rms === rnd4(math.sqrt(
        samples.map(v => v.toLong * v).sum.toDouble / n)))
    }
  }

  test("decode really goes through the WAV codec (payload is a valid RIFF/WAVE)") {
    implicit val s = spark
    val row = Multimodal.syntheticAudio(Tables.documents(spark, sf).limit(1)).head()
    assert(row.media.take(4).map(_.toChar).mkString === "RIFF")
    assert(row.media.slice(8, 12).map(_.toChar).mkString === "WAVE")
    assert(row.meta.kind === "audio" && row.meta.encoding === "wav")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(row.media))
    assert(ais.getFormat.getSampleRate === 8000f)
    assert(ais.getFormat.getChannels === 1)
    ais.close()
  }

  test("documents are ASCII — the invariant the byte-based frame/resize oracles need") {
    val nonAscii = Tables.documents(spark, sf)
      .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii === 0L,
      "mm_frames/mm_resize oracles mirror bytes with char-based substr/ascii; " +
        "that only holds for ASCII payloads")
  }
}
