package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{Extract, Magic, RarKernel, SevenZKernel}
import graft.corpus.ArchiveWriter

/** 7z container + RAR5 header tier (kernel/SevenZKernel.scala).
  *
  * Conformance runs in both directions against commons-compress (a jar
  * the Spark platform ships; used here as a third-party ORACLE only,
  * never in the kernel): archives this repo writes must open in
  * SevenZFile byte-exactly, and SevenZOutputFile-written archives
  * (Copy and LZMA2, including its always-encoded headers) must extract
  * here.
  */
class SevenZSpec extends AnyFunSuite {

  private val members = Seq(
    "docs/a.txt" -> "First member text, plain and simple.".getBytes("UTF-8"),
    "docs/b.txt" -> "Second member carries a bit more text than the first.".getBytes("UTF-8"),
    "notes.txt" -> "Third one.".getBytes("UTF-8"))
  private val expectedText = members.map(m => new String(m._2, "UTF-8")).mkString("\n\n")

  test("E32: 7z store-mode (Copy) — members extract through the normal dispatch") {
    val bytes = ArchiveWriter.write7z(members, codec = "copy")
    assert(Magic.sniff(bytes) == Magic.Kind.SevenZ)
    val out = Extract.extractBytes("x.7z", bytes, Extract.Options())
    assert(out.contentType == "application/x-7z-compressed")
    assert(out.content == expectedText, s"got: ${out.content}")
    assert(out.metadata("archive:entry-count") == "3")
    assert(out.metadata("archive:entry-names") == "docs/a.txt,docs/b.txt,notes.txt")
    assert(out.metadata("7z:codecs") == "Copy")
  }

  test("E32: 7z LZMA2 folders decode (xz-jar bit codec, header parsed from scratch)") {
    val bytes = ArchiveWriter.write7z(members, codec = "lzma2")
    val out = Extract.extractBytes("x.7z", bytes, Extract.Options())
    assert(out.content == expectedText)
    assert(out.metadata("7z:codecs") == "LZMA2")
  }

  test("E32: 7z encoded header (0x17 LZMA2-compressed end header)") {
    for (codec <- Seq("copy", "lzma2")) {
      val bytes = ArchiveWriter.write7z(members, codec = codec, encodedHeader = true)
      val out = Extract.extractBytes("x.7z", bytes, Extract.Options())
      assert(out.content == expectedText, s"codec=$codec")
      assert(out.metadata("7z:encoded-header") == "true")
      assert(out.metadata("archive:entry-count") == "3")
    }
  }

  test("E32: 7z conformance — commons-compress reads this writer's archives exactly") {
    for ((codec, enc) <- Seq(("copy", false), ("lzma2", false), ("lzma2", true))) {
      val bytes = ArchiveWriter.write7z(members, codec = codec, encodedHeader = enc)
      val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel(bytes)
      val sz = org.apache.commons.compress.archivers.sevenz.SevenZFile.builder()
        .setSeekableByteChannel(ch).get()
      try {
        var got = Vector.empty[(String, Array[Byte])]
        var e = sz.getNextEntry
        while (e != null) {
          val buf = new Array[Byte](e.getSize.toInt)
          var off = 0
          while (off < buf.length) {
            val r = sz.read(buf, off, buf.length - off)
            assert(r > 0); off += r
          }
          got :+= (e.getName.replace('\\', '/'), buf)
          e = sz.getNextEntry
        }
        assert(got.map(_._1) == members.map(_._1).toVector, s"$codec/$enc names")
        got.zip(members).foreach { case ((_, g), (_, exp)) =>
          assert(java.util.Arrays.equals(g, exp), s"$codec/$enc bytes")
        }
      } finally sz.close()
    }
  }

  test("E32: folder-level CRCs — SubStreams digest exclusion keeps the reader aligned (ADVICE r6)") {
    for (codec <- Seq("copy", "lzma2")) {
      val bytes = ArchiveWriter.write7z(members, codec = codec, folderCrcs = true)
      // commons-compress accepts the layout AND verifies the CRCs on
      // read — proves the emitted header (folder kCRC bitmask + reduced
      // SubStreams digest list) is spec-valid
      val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel(bytes)
      val sz = org.apache.commons.compress.archivers.sevenz.SevenZFile.builder()
        .setSeekableByteChannel(ch).get()
      try {
        var names = Vector.empty[String]
        var e = sz.getNextEntry
        while (e != null) {
          val buf = new Array[Byte](e.getSize.toInt)
          var off = 0
          while (off < buf.length) {
            val r = sz.read(buf, off, buf.length - off); assert(r > 0); off += r
          }
          names :+= e.getName.replace('\\', '/')
          e = sz.getNextEntry
        }
        assert(names == members.map(_._1).toVector, s"$codec commons names")
      } finally sz.close()
      // and our kernel stays aligned past both digest lists (the old
      // blind skip assumed every substream carried a digest and walked
      // off the header, losing names/codecs)
      val out = Extract.extractBytes("x.7z", bytes, Extract.Options())
      assert(out.content == expectedText, s"$codec: ${out.content}")
      assert(out.metadata("archive:entry-count") == "3", codec)
      assert(out.metadata("archive:entry-names") == "docs/a.txt,docs/b.txt,notes.txt", codec)
    }
  }

  test("E32: 7z conformance — commons-compress-written archives extract here") {
    import org.apache.commons.compress.archivers.sevenz._
    for (method <- Seq(SevenZMethod.COPY, SevenZMethod.LZMA2)) {
      val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel()
      val w = new SevenZOutputFile(ch)
      w.setContentCompression(method)
      members.foreach { case (name, data) =>
        val e = new SevenZArchiveEntry()
        e.setName(name)
        w.putArchiveEntry(e)
        w.write(data)
        w.closeArchiveEntry()
      }
      w.close()
      val bytes = java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
      assert(Magic.sniff(bytes) == Magic.Kind.SevenZ)
      val out = Extract.extractBytes("x.7z", bytes, Extract.Options())
      assert(out.content == expectedText, s"$method: ${out.content}")
      assert(out.metadata("archive:entry-count") == "3", s"$method")
    }
  }

  test("E32: 7z depth accounting — nested in zip extracts, at depth 2 stays opaque") {
    val sevenZ = ArchiveWriter.write7z(members, codec = "copy")
    val zip = ArchiveWriter.writeZip(Seq("inner.7z" -> sevenZ))
    val out = Extract.extractBytes("x.zip", zip, Extract.Options())
    assert(out.content == expectedText)
    // zip(zip(7z)): the 7z sits at depth 2 -> typed opaque, no text
    val zip2 = ArchiveWriter.writeZip(Seq("outer.zip" -> zip))
    val out2 = Extract.extractBytes("x.zip", zip2, Extract.Options())
    assert(out2.content.isEmpty)
  }

  test("E33: RAR5 headers -> archive metadata rows (names, counts, sizes)") {
    val bytes = ArchiveWriter.writeRar5(members)
    assert(Magic.sniff(bytes) == Magic.Kind.Rar)
    val out = Extract.extractBytes("x.rar", bytes, Extract.Options())
    assert(out.contentType == "application/x-rar-compressed")
    assert(out.content.isEmpty) // compression is proprietary: metadata only
    assert(out.metadata("rar:version") == "5")
    assert(out.metadata("archive:entry-count") == "3")
    assert(out.metadata("archive:entry-names") == "docs/a.txt,docs/b.txt,notes.txt")
    assert(out.metadata("rar:unpacked-size") ==
      members.map(_._2.length).sum.toString)
  }

  test("E33: RAR4 magic types by version only") {
    val bytes = Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x00) ++ new Array[Byte](64)
    val out = Extract.extractBytes("x.rar", bytes, Extract.Options())
    assert(out.metadata.get("rar:version").contains("4"))
    assert(out.content.isEmpty)
  }

  test("E32/E33: malformed 7z/rar never throw, degrade to typed opaque") {
    val rnd = new java.util.Random(0x72AF)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](8 + rnd.nextInt(300))
      rnd.nextBytes(junk)
      val sz = Array[Byte]('7', 'z', 0xbc.toByte, 0xaf.toByte, 0x27, 0x1c) ++ junk
      val rr = Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x01, 0x00) ++ junk
      val o1 = Extract.extractBytes("a.7z", sz, Extract.Options())
      val o2 = Extract.extractBytes("a.rar", rr, Extract.Options())
      assert(o1.content.isEmpty && o2.metadata.get("rar:version").forall(_ == "5"))
    }
    // truncated valid archives
    val good = ArchiveWriter.write7z(members, codec = "lzma2", encodedHeader = true)
    for (cut <- Seq(8, 20, 40, good.length / 2, good.length - 3))
      Extract.extractBytes("a.7z", java.util.Arrays.copyOf(good, cut), Extract.Options())
    assert(RarKernel.extract(Array[Byte]('R', 'a', 'r', '!')).isEmpty)
    val _ = SevenZKernel // referenced for the import
  }
}
