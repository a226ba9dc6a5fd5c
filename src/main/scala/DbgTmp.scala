import graft.corpus.Gen
import graft.kernel.Extract
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
object Dbg {
  def main(args: Array[String]): Unit = {
    val opts = Extract.Options()
    val docs = (0L until 30000L).map(i => Gen.build(Gen.Seed, i)).toArray
    def extractAll(b: Gen.Built): Long = {
      val mediaMap = b.media.map(m => m.media_ref -> m.bytes_b64).toMap
      var n = 0L
      b.spans.foreach { s =>
        val out = if (s.media_ref == null) Extract.extractText(s.kind, s.text, opts)
          else {
            val b64 = mediaMap(s.media_ref)
            val bytes = if (b64.isEmpty) Array.emptyByteArray else java.util.Base64.getDecoder.decode(b64)
            Extract.extractBytes(s.kind, bytes, opts)
          }
        n += out.blocks.length
      }
      n
    }
    docs.take(5000).foreach(extractAll)
    def bench(threads: Int, reps: Int): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val pool = Executors.newFixedThreadPool(threads)
        val ctr = new AtomicLong()
        // interleaved slices (stride = threads) so giant docs spread evenly
        val t0 = System.nanoTime()
        (0 until threads).foreach { t =>
          pool.submit(new Runnable { def run(): Unit = {
            var i = t; var acc = 0L
            while (i < docs.length) { acc += extractAll(docs(i)); i += threads }
            ctr.addAndGet(acc)
          }})
        }
        pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
        best = math.min(best, (System.nanoTime()-t0)/1e9)
      }
      best
    }
    val r = Seq(1, 4, 8, 16, 32).map(t => t -> bench(t, 4))
    r.foreach { case (t, s) => println(f"THREADS $t%2d: $s%.3f s = ${30000/s}%.0f docs/s") }
    val m = r.toMap
    println(f"eff 4->16: ${(m(4)/m(16))/4}%.2f   eff 8->32: ${(m(8)/m(32))/4}%.2f")
  }
}
