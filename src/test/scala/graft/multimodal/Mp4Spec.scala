package graft.multimodal

/** Mp4 box walk: all three size encodings, v0/v1 mvhd, rejection. */
class Mp4Spec extends graft.SparkSpec {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("fixtures parse back to their generating arithmetic") {
    for (id <- 0L until 30L) {
      val i = Mp4.parse(Multimodal.mp4Fixture(id))
        .getOrElse(fail(s"fixture $id did not parse"))
      assert(i.brand === "isom")
      assert(i.timescale === 1000L * (id % 5 + 1))
      assert(i.duration === (id * 37) % 100000)
      assert(i.nTracks === (id % 3 + 1).toInt)
      assert(i.durationMs === i.duration * 1000 / i.timescale)
    }
  }

  test("version-1 mvhd (64-bit times) parses per spec") {
    // minimal file: ftyp + moov(mvhd v1)
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("mp42") ++ be32(0)
    val mvhdData = be32(0x01000000L) /* v1 */ ++
      Array.fill(16)(0.toByte) /* creation+modification, 8+8 */ ++
      be32(90000) /* timescale */ ++
      be32(0) ++ be32(123456789L) /* duration hi/lo */ ++
      new Array[Byte](80)
    val mvhd = be32(8L + mvhdData.length) ++ cc("mvhd") ++ mvhdData
    val moov = be32(8L + mvhd.length) ++ cc("moov") ++ mvhd
    val i = Mp4.parse(ftyp ++ moov).get
    assert(i.brand === "mp42")
    assert(i.timescale === 90000L)
    assert(i.duration === 123456789L)
    assert(i.nTracks === 0)
    assert(i.durationMs === 123456789L * 1000 / 90000)
  }

  test("malformed boxes reject: overrun size, missing moov, non-ftyp start") {
    val good = Multimodal.mp4Fixture(1L)
    // declared moov size overruns the buffer
    val overrun = good.clone()
    val moovOff = 24
    overrun(moovOff) = 0x7f // size high byte → way past end
    assert(Mp4.parse(overrun).isEmpty)
    // ftyp alone (no moov → no timescale)
    assert(Mp4.parse(good.take(24)).isEmpty)
    // plain bytes
    assert(Mp4.parse("not a container at all......".getBytes).isEmpty)
    assert(Mp4.parse(Array.empty[Byte]).isEmpty)
  }

  test("sample-table fixtures parse back to their generating arithmetic") {
    for (id <- 0L until 30L) {
      val t = Mp4.parseSamples(Multimodal.mp4SampleFixture(id))
        .getOrElse(fail(s"sample fixture $id did not parse"))
      val n = (id % 50 + 10).toInt
      val d1 = (id % 5 + 1) * 100
      assert(t.codec === "avc1")
      assert(t.mediaTimescale === 1000L * (id % 4 + 1))
      assert(t.sampleCount === n.toLong)
      assert(t.runs === Vector((n / 2.toLong, d1), (n - n / 2.toLong, d1 + 40)))
      if (id % 4 == 0) {
        assert(t.uniformSize === id % 200 + 100)
        assert(t.sizeOf(n - 1) === id % 200 + 100)
      } else {
        assert(t.uniformSize === 0L)
        assert(t.sizeOf(3) === (id * 13 + 21) % 991 + 1)
      }
      // dts prefix-sum across the run boundary
      assert(t.dtsOf(0) === 0L)
      assert(t.dtsOf(n / 2 + 1) === (n / 2) * d1 + (d1 + 40))
      // the parse-level walk still reads the movie header of this layout
      val i = Mp4.parse(Multimodal.mp4SampleFixture(id)).get
      assert(i.nTracks === 1 && i.timescale === t.mediaTimescale)
    }
  }

  test("golden hand-built stbl parses; truncated sample tables reject") {
    def fullBox(typ: String, data: Array[Byte]): Array[Byte] =
      be32(12L + data.length) ++ cc(typ) ++ be32(0) ++ data
    def box(typ: String, data: Array[Byte]): Array[Byte] =
      be32(8L + data.length) ++ cc(typ) ++ data
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("mp42") ++ be32(0)
    val mvhdData = be32(0) ++ be32(0) ++ be32(600) ++ be32(1200) ++
      new Array[Byte](80)
    val mdhdData = be32(0) ++ be32(0) ++ be32(600) ++ be32(1200) ++ be32(0)
    def stbl(sttsData: Array[Byte], stszData: Array[Byte]): Array[Byte] = {
      val entry = box("hvc1", new Array[Byte](8))
      box("stbl", fullBox("stsd", be32(1) ++ entry) ++
        fullBox("stts", sttsData) ++ fullBox("stsz", stszData))
    }
    def clip(sttsData: Array[Byte], stszData: Array[Byte]): Array[Byte] = {
      val mdia = box("mdia", (be32(32) ++ cc("mdhd") ++ be32(0) ++ mdhdData)
        ++ box("minf", stbl(sttsData, stszData)))
      ftyp ++ box("moov",
        (be32(108) ++ cc("mvhd") ++ be32(0) ++ mvhdData) ++ box("trak", mdia))
    }
    // 3 samples: runs (2×300, 1×600); sizes 10/20/30
    val good = clip(be32(2) ++ be32(2) ++ be32(300) ++ be32(1) ++ be32(600),
      be32(0) ++ be32(3) ++ be32(10) ++ be32(20) ++ be32(30))
    val t = Mp4.parseSamples(good).getOrElse(fail("golden clip rejected"))
    assert(t.codec === "hvc1" && t.mediaTimescale === 600L)
    assert(t.dtsOf(2) === 600L && t.sizeOf(2) === 30L)
    // stts declares more entries than its box holds → reject
    assert(Mp4.parseSamples(clip(
      be32(9) ++ be32(2) ++ be32(300) ++ be32(1) ++ be32(600),
      be32(0) ++ be32(3) ++ be32(10) ++ be32(20) ++ be32(30))).isEmpty)
    // stsz count disagrees with stts coverage → reject
    assert(Mp4.parseSamples(clip(
      be32(1) ++ be32(2) ++ be32(300),
      be32(0) ++ be32(3) ++ be32(10) ++ be32(20) ++ be32(30))).isEmpty)
    // per-sample stsz table truncated → reject
    assert(Mp4.parseSamples(clip(
      be32(2) ++ be32(2) ++ be32(300) ++ be32(1) ++ be32(600),
      be32(0) ++ be32(9))).isEmpty)
  }

  test("mp4Meta surfaces null fields for undecodable payloads") {
    // direct function check without a Spark job: the Dataset op is a thin
    // mapPartitions over Mp4.parse, exercised end-to-end by q_mp4_meta
    assert(Mp4.parse(Multimodal.MediaFixtures.payload(0L)).isEmpty) // a PNG
  }

  test("mjpeg clips: chunk-offset sample location + full T.81 frame decode") {
    for (id <- 0L until 12L) {
      val clip = Multimodal.mjpegFixture(id)
      val t = Mp4.parseSamples(clip)
        .getOrElse(fail(s"mjpeg clip $id did not parse"))
      assert(t.codec === "jpeg")
      assert(t.sampleCount === Multimodal.MjpegFrames.toLong)
      val offs = t.sampleOffsets
      assert(offs.length === Multimodal.MjpegFrames)
      // every located sample is a complete JPEG that decodes to the
      // exact closed-form pixels of its mjpegJid fixture id
      offs.zipWithIndex.foreach { case ((off, len), f) =>
        val payload = java.util.Arrays.copyOfRange(clip, off.toInt,
          (off + len).toInt)
        assert((payload(0) & 0xff) === 0xff && (payload(1) & 0xff) === 0xd8,
          s"sample $f of clip $id is not a JPEG stream")
        val img = JpegCodec.decode(payload)
          .getOrElse(fail(s"sample $f of clip $id did not decode"))
        assert(img.width === 16 && img.height === 16)
        // timestamps: uniform 100-tick run at timescale 1000
        assert(t.dtsOf(f.toLong) * 1000L / t.mediaTimescale === f * 100L)
      }
    }
  }

  test("sampleOffsets rejects inconsistent chunk tables instead of throwing") {
    val clip = Multimodal.mjpegFixture(3L)
    val t = Mp4.parseSamples(clip).get
    // samples_per_chunk = 0 is structural lying
    assert(t.copy(stsc = Vector((1L, 0L))).sampleOffsets === Vector.empty)
    // missing chunk table
    assert(t.copy(chunkOffsets = Vector.empty).sampleOffsets === Vector.empty)
    // too few chunks to cover the sample count
    assert(t.copy(stsc = Vector((1L, 1L))).sampleOffsets === Vector.empty)
  }

  test("hostile near-MaxValue sample offsets drop, never throw") {
    // a co64 offset near Long.MaxValue: off + len wraps negative, so a
    // sum-form guard passes and copyOfRange throws — the subtraction
    // form in mjpegSampleFrames must route it to drop instead
    val clip = Multimodal.mjpegFixture(3L)
    val t = Mp4.parseSamples(clip).get
    val huge = t.copy(chunkOffsets = t.chunkOffsets.map(_ =>
      Long.MaxValue - 8))
    assert(Multimodal.mjpegSampleFrames(clip, huge, Int.MaxValue) === Seq.empty)
    // negative offset (wrapped upstream) drops too
    val neg = t.copy(chunkOffsets = t.chunkOffsets.map(_ => -512L))
    assert(Multimodal.mjpegSampleFrames(clip, neg, Int.MaxValue) === Seq.empty)
  }

  test("mixed-container twins hash frame-identical across MP4 and GIF") {
    // member 0 (MJPEG) and member 1 (GIF) of one group differ only by
    // member 1's DC bump on one block of one frame: their OTHER frames
    // must produce byte-identical dHashes through two different codecs
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(8L, Multimodal.mixedVideoNearFixture(8L)),   // MJPEG
      MediaRecord(9L, Multimodal.mixedVideoNearFixture(9L))))  // GIF
    val rows = Multimodal.videoFrameHashes(ds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byDoc(8L).length === 3 && byDoc(9L).length === 3)
    // member 1 edits frame 1 % 3 = 1; frames 0 and 2 are pixel-identical
    assert(byDoc(8L)(0) === byDoc(9L)(0))
    assert(byDoc(8L)(2) === byDoc(9L)(2))
    val editedHamming = java.lang.Long.bitCount(byDoc(8L)(1) ^ byDoc(9L)(1))
    assert(editedHamming <= 3, s"edited-frame hamming $editedHamming > 3")
  }
}
