package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Extract

/** Structured mutation fuzzing: real container bytes with bit flips,
  * truncations, and splices must never escape the failure taxonomy
  * (errors never abort a batch — reference rika_command_spec.rb:147-160).
  */
class FuzzSpec extends AnyFunSuite {

  def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    try in.readAllBytes() finally in.close()
  }

  val targets = Seq("document.pdf", "document.docx", "document.doc", "image.jpg")

  test("mutation fuzz: bit flips never throw") {
    val rng = new java.util.SplittableRandom(7)
    for (name <- targets; trial <- 0 until 120) {
      val b = fixture(name).clone()
      val flips = 1 + rng.nextInt(8)
      for (_ <- 0 until flips) {
        val i = rng.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
      }
      val out = Extract.extractBytes("any", b, Extract.Options(4096))
      assert(out.contentType.nonEmpty, s"$name trial $trial")
    }
  }

  test("mutation fuzz: truncations never throw") {
    val rng = new java.util.SplittableRandom(11)
    for (name <- targets; trial <- 0 until 60) {
      val b = fixture(name)
      val n = 1 + rng.nextInt(b.length)
      val out = Extract.extractBytes("any",
        java.util.Arrays.copyOf(b, n), Extract.Options(4096))
      assert(out.contentType.nonEmpty, s"$name cut at $n")
    }
  }

  test("mutation fuzz: spliced frankenbytes never throw") {
    val rng = new java.util.SplittableRandom(13)
    val pool = targets.map(fixture)
    for (trial <- 0 until 100) {
      val a = pool(rng.nextInt(pool.size))
      val b = pool(rng.nextInt(pool.size))
      val cut = 1 + rng.nextInt(math.min(a.length, b.length) - 1)
      val spliced = java.util.Arrays.copyOf(a, cut) ++ b.drop(cut)
      val out = Extract.extractBytes("any", spliced, Extract.Options(4096))
      assert(out.contentType.nonEmpty, s"trial $trial")
    }
  }

  test("crafted PDF ref cycles resolve without StackOverflowError") {
    // mutation fuzz can't surface structural cycles — craft them directly.
    // A StackOverflowError is NOT NonFatal, so an unguarded deref would
    // kill the Spark task from one poison document.
    def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    val twoCycle = b("%PDF-1.4\n1 0 obj 2 0 R endobj\n2 0 obj 1 0 R endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF")
    val selfRef = b("%PDF-1.4\n1 0 obj 1 0 R endobj\n" +
      "trailer << /Root 1 0 R /Info 1 0 R >>\n%%EOF")
    // cyclic /Kids with fan-out 4: unguarded walk is 4^depth traversals
    val kidsCycle = b("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [2 0 R 2 0 R 2 0 R 2 0 R] /Count 4 >> endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF")
    for ((bytes, tag) <- Seq((twoCycle, "two-cycle"), (selfRef, "self-ref"),
        (kidsCycle, "kids-cycle"))) {
      val t0 = System.nanoTime()
      val out = Extract.extractBytes("pdf", bytes, Extract.Options(4096))
      assert(out.contentType.nonEmpty, tag)
      assert((System.nanoTime() - t0) < 5e9, s"$tag took too long (fan-out bomb?)")
    }
  }

  test("zip-bomb DOCX part hits the inflate bound, not OOM") {
    // word/document.xml that inflates to 512 MiB (> the 256 MiB bound)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("[Content_Types].xml"))
    zos.write("<Types/>".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    val chunk = new Array[Byte](1 << 20) // zeros: ~1000x deflate ratio
    for (_ <- 0 until 512) zos.write(chunk)
    zos.closeEntry()
    zos.close()
    val res = Extract.extractBytes("docx", bos.toByteArray, Extract.Options(4096))
    assert(res.issue.contains(Extract.IssueParseError) || res.content.isEmpty)
  }

  test("CFB FAT sector cycle terminates with bounded output") {
    // header + FAT where sector 0 chains to itself; directory start = 0.
    // Unguarded, chain() would emit maxSectors * sectorSize ~ 4 GiB.
    val bytes = new Array[Byte](512 * 3)
    val magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)
    System.arraycopy(magic, 0, bytes, 0, 8)
    bytes(30) = 9 // sector size 512
    def putU32(off: Int, v: Long): Unit = {
      bytes(off) = (v & 0xff).toByte; bytes(off + 1) = ((v >> 8) & 0xff).toByte
      bytes(off + 2) = ((v >> 16) & 0xff).toByte; bytes(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putU32(48, 1)           // first directory sector = 1
    putU32(76, 0)           // DIFAT[0] = FAT at sector 0
    putU32(80, 0xffffffffL) // DIFAT[1] = free
    putU32(512 + 0, 0)      // FAT[0]: sector 0 -> itself (cycle)
    putU32(512 + 4, 1)      // FAT[1]: dir sector 1 -> itself (cycle)
    val t0 = System.nanoTime()
    val res = Extract.extractBytes("doc", bytes, Extract.Options(4096))
    assert(res.contentType.nonEmpty)
    assert((System.nanoTime() - t0) < 5e9, "FAT cycle not bounded")
  }

  test("decompression bomb is bounded, not fatal") {
    // a PDF whose content stream inflates to ~1 GiB must hit the 256 MiB
    // guard and surface as parse_error/empty, not OOM
    val big = new Array[Byte](64 << 20) // 64 MiB of zeros -> tiny deflate
    val d = new java.util.zip.Deflater()
    d.setInput(big); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    val packed = bos.toByteArray
    // content stream claims to be 20x: repeat the deflate block via PDF
    // array of the same stream object reference
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [ " +
      (1 to 20).map(_ => "4 0 R").mkString(" ") + " ] >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${packed.length} /Filter /FlateDecode >>\nstream\n")
    out.write(packed)
    w("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n")
    val res = Extract.extractBytes("pdf", out.toByteArray, Extract.Options(4096))
    // either graceful parse_error or empty content — never an OOM/throw
    assert(res.contentType.nonEmpty)
  }
}
