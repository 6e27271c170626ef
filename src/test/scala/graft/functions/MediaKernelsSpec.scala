package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dims(h: String): Option[(Long, Long)] =
    Option(MediaKernels.jpegDims(hex(h)))
      .map(a => (a.getLong(0), a.getLong(1)))

  // canonical stream: SOI, JFIF APP0, COM "test", SOF0 640x480
  private val app0 = "FFE0 0010 4A46494600 0101 00 0001 0001 00 00"
  private val sof0 = "FFC0 0011 08 01E0 0280 03 011100 021101 031101"

  test("jpegDims walks variable-length segments to the SOF frame header") {
    assert(dims(s"FFD8 $app0 FFFE 0006 74657374 $sof0") === Some((640L, 480L)))
    // fill bytes before a marker are legal padding
    assert(dims(s"FFD8 $app0 FF $sof0") === Some((640L, 480L)))
    // progressive SOF2 carries dims at the same offsets
    assert(dims(s"FFD8 ${sof0.replace("FFC0", "FFC2")}") === Some((640L, 480L)))
    // RSTn markers are standalone (no length field) and are skipped
    assert(dims(s"FFD8 FFD0 $sof0") === Some((640L, 480L)))
  }

  test("jpegDims flags malformed/frameless streams as NULL, never guesses") {
    assert(dims("FFD8FFE0") === None) // truncated mid-segment
    assert(dims("FFD8 FFDA 0008 4142") === None) // SOS before any SOF
    assert(dims("FFD8 FFD9") === None) // EOI without a frame
    assert(dims(s"FFD8 FFE0 0001 $sof0") === None) // segment length < 2
    assert(dims("89504E47") === None) // not a JPEG at all
    assert(dims(s"FFD8 41 $sof0") === None) // lost marker sync
    // DHT (C4) is NOT a frame marker: its payload must be skipped, and
    // a following SOF still parses
    assert(dims(s"FFD8 FFC4 0004 0000 $sof0") === Some((640L, 480L)))
  }

  test("charEntropy matches hand-computed values and the interpreted path") {
    import org.apache.spark.unsafe.types.UTF8String
    def e(s: String) = MediaKernels.charEntropy(UTF8String.fromString(s))
    assert(e("") === 0.0)
    assert(e("aaaa") === 0.0)
    assert(math.abs(e("ab") - math.log(2)) < 1e-12)
    // 'abcab': counts a=2 b=2 c=1, n=5 -> ln5 - (2ln2+2ln2+0)/5
    assert(math.abs(e("abcab") - (math.log(5) - 4 * math.log(2) / 5)) < 1e-12)
    // surrogate pair counts as ONE code point
    assert(e("😀😀") === 0.0)
  }

  test("bpeEncode applies merges lowest-rank-first and stays lossless") {
    import org.apache.spark.unsafe.types.UTF8String
    def enc(text: String, merges: Seq[(String, String)]): Seq[String] = {
      val ranks = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        ranks.put(l + " " + r, Int.box(i))
      }
      val a = MediaKernels.bpeEncode(UTF8String.fromString(text), ranks)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    // rank order decides: (e,s) then (es,t) on "test" -> t | est | </w>
    assert(enc("test", Seq("e" -> "s", "es" -> "t")) ==
      Seq("t", "est", "</w>"))
    assert(enc("test", Seq("e" -> "s", "es" -> "t", "est" -> "</w>")) ==
      Seq("t", "est</w>"))
    // all occurrences of the best pair merge in one step
    assert(enc("papa", Seq("p" -> "a")) == Seq("pa", "pa", "</w>"))
    // no applicable merge -> pure chars + sentinel; multi-word stream
    assert(enc("ab cd", Seq("x" -> "y")) ==
      Seq("a", "b", "</w>", "c", "d", "</w>"))
    // losslessness against the trainer, end to end: encode with
    // learned merges, re-join each word's subwords, strip sentinels ->
    // the normalized corpus words exactly
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val learned = graft.text.Text.bpeTrain(df, "text", numMerges = 6)
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toSeq
    val rebuilt = df
      .select(col("id"), col("text"),
        graft.text.Text.bpeEncode(col("text"), learned).as("sub"))
      .select(col("id"), col("text"),
        array_join(col("sub"), "").as("joined"))
      .as[(Long, String, String)]
      .collect()
    rebuilt.foreach { case (_, text, joined) =>
      assert(joined == text + "</w>", s"$text -> $joined")
    }
    // learned merges actually compress: fewer subwords than chars
    val n = df.select(
      sum(size(graft.text.Text.bpeEncode(col("text"), learned))).as("s"),
      sum(length(col("text"))).as("c")
    ).as[(Long, Long)].collect().head
    assert(n._1 < n._2 + texts.size, s"subwords ${n._1} vs chars ${n._2}")
  }

  test("expressions run inside whole-stage codegen and agree with the kernel") {
    // spark.range source: a local Seq would be constant-folded into a
    // LocalTableScan, leaving no codegen stage to inspect (same guard
    // pattern as InvariantsSpec's hash-expression fusion proof)
    val df = spark
      .range(2)
      .select(
        col("id"),
        when(col("id") === 0, "abcab").otherwise("zzzz").as("text")
      )
      .withColumn("h", mediaExpressions.charEntropy(col("text")))
    val got = df.orderBy("id").select("h").as[Double].collect()
    assert(math.abs(got(0) - (math.log(5) - 4 * math.log(2) / 5)) < 1e-12)
    assert(got(1) === 0.0)
    // codegen fusion: the projection stays inside WholeStageCodegen
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    val fused = wsc.exists(_.exists {
      case p: org.apache.spark.sql.execution.ProjectExec =>
        p.projectList.exists(_.exists(_.isInstanceOf[mediaExpressions.CharEntropy]))
      case _ => false
    })
    assert(fused, s"CharEntropy not inside WholeStageCodegen:\n${df.queryExecution.executedPlan}")

    val jp = Seq(Tuple1(hex(s"FFD8 $app0 $sof0")), Tuple1(hex("FFD8FFE0")))
      .toDF("b")
      .withColumn("d", mediaExpressions.jpegDims(col("b")))
      .select(element_at(col("d"), 1), element_at(col("d"), 2))
      .collect()
    assert(jp(0).getLong(0) == 640L && jp(0).getLong(1) == 480L)
    assert(jp(1).isNullAt(0) && jp(1).isNullAt(1))
  }

  private def mp4(h: String): Option[(Long, Long, Long)] =
    Option(MediaKernels.mp4Meta(hex(h)))
      .map(a => (a.getLong(0), a.getLong(1), a.getLong(2)))

  // ftyp isom + moov/mvhd v0: timescale 600, duration 3000 -> 5000 ms
  private val ftyp = "00000010 66747970 69736F6D 00000000"
  private val mvhdV0 =
    "0000001C 6D766864 00000000 00000000 00000000 00000258 00000BB8"
  private val moovV0 = s"00000024 6D6F6F76 $mvhdV0"

  test("mp4Meta walks boxes to mvhd in both versions; ms is floor ticks*1000/ts") {
    assert(mp4(s"$ftyp $moovV0") === Some((600L, 3000L, 5000L)))
    // a free box between ftyp and moov is skipped by its size
    assert(mp4(s"$ftyp 00000008 66726565 $moovV0") === Some((600L, 3000L, 5000L)))
    // inside moov, a leading free box is skipped before mvhd
    assert(
      mp4(s"$ftyp 0000002C 6D6F6F76 00000008 66726565 $mvhdV0") ===
        Some((600L, 3000L, 5000L))
    )
    // v1: 64-bit creation/modification/duration; duration 2^32+600
    val mvhdV1 = "00000028 6D766864 01000000 " +
      "0000000000000000 0000000000000000 00000258 0000000100000258"
    assert(
      mp4(s"$ftyp 00000030 6D6F6F76 $mvhdV1") ===
        Some((600L, 4294967896L, 4294967896L * 1000L / 600L))
    )
    // zero timescale: raw fields readable, ms flagged -1
    val mvhdTs0 =
      "0000001C 6D766864 00000000 00000000 00000000 00000000 00000BB8"
    assert(mp4(s"$ftyp 00000024 6D6F6F76 $mvhdTs0") === Some((0L, 3000L, -1L)))
  }

  test("mp4Meta parses 64-bit largesize boxes — the >4 GiB mdat-first layout") {
    // largesize mdat (size field 1, 24 actual bytes incl. 8 payload)
    // BEFORE moov: the walk must read the 64-bit size to skip it
    val mdatLarge = "00000001 6D646174 0000000000000018 DEADBEEFDEADBEEF"
    assert(mp4(s"$ftyp $mdatLarge $moovV0") === Some((600L, 3000L, 5000L)))
    // a largesize moov itself: content starts after the 16-byte header
    assert(
      mp4(s"$ftyp 00000001 6D6F6F76 000000000000002C $mvhdV0") ===
        Some((600L, 3000L, 5000L))
    )
    // truncated mid-largesize-field -> NULL, never a wild read
    assert(mp4(s"$ftyp 00000001 6D646174 00000000") === None)
    // largesize smaller than its own 16-byte header -> NULL
    assert(mp4(s"$ftyp 00000001 6D646174 0000000000000008 $moovV0") === None)
  }

  test("mp4Meta flags malformed/headerless streams as NULL, never guesses") {
    assert(mp4("41424344454647484950515253545556") === None) // not BMFF
    assert(mp4(ftyp) === None) // no moov at all
    assert(mp4(s"$ftyp 00000010 6D6F6F76 00000008 66726565") === None) // moov, no mvhd
    assert(mp4(s"$ftyp 00000024 6D6F6F76") === None) // moov truncated before mvhd
    // largesize moov declaring 0x30 bytes, buffer ends after the size
    // field: truncated capture -> NULL
    assert(mp4(s"$ftyp 00000001 6D6F6F76 0000000000000030") === None)
    assert(mp4(s"$ftyp 00000004 6D6F6F76") === None) // size < 8
    assert(mp4("00000010 66747970 69736F") === None) // under 16 bytes
  }
}
