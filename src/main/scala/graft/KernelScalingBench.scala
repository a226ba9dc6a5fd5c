package graft

import java.util.concurrent.atomic.AtomicInteger

/** Host-ceiling companion to ScalingBench: the SAME extraction kernels
  * over the SAME corpus mix, with NO Spark — plain threads — measured
  * with the same interleaved per-round median protocol. The ratio
  * pipeline_efficiency / kernel_efficiency isolates what Spark's
  * machinery costs from what this host's cores can physically deliver
  * (its vCPUs are not linear: see PERF.md kernel table).
  */
object KernelScalingBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SCALING_N", "2").toInt
    val rounds = sys.env.getOrElse("SCALING_ROUNDS", "5").toInt
    val nDocs = sys.env.getOrElse("KERNEL_DOCS", "60000").toInt

    // pre-build payloads once (generation excluded from timing)
    System.err.println(s"[kernel-scaling] building $nDocs docs...")
    val payloads: Array[Array[(String, Array[Byte], String)]] =
      (0 until nDocs).toArray.map { i =>
        val b = corpus.Gen.build(corpus.Gen.Seed, i.toLong)
        val media = b.media.map(m => m.media_ref ->
          java.util.Base64.getDecoder.decode(m.bytes_b64)).toMap
        b.spans.toArray.map { s =>
          if (s.media_ref != null)
            (s.kind, media.getOrElse(s.media_ref, Array.emptyByteArray), null)
          else (s.kind, null, s.text)
        }
      }

    def onePass(threads: Int): Double = {
      val idx = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < payloads.length) {
            payloads(i).foreach { case (kind, bytes, text) =>
              if (bytes != null)
                kernel.Extract.extractBytes(kind, bytes, kernel.Extract.Options())
              else kernel.Extract.extractText(kind, text, kernel.Extract.Options())
            }
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    onePass(n) // warm-up (JIT)
    val samples = (1 to rounds).map { round =>
      val sN = onePass(n)
      val s4 = onePass(4 * n)
      val eff = (nDocs / s4) / (nDocs / sN) / 4.0
      System.err.println(
        f"[kernel-scaling] round $round: N=$n $sN%.2f s, 4N=${4 * n} $s4%.2f s, eff=$eff%.3f")
      eff
    }.sorted
    val median = samples(samples.size / 2)
    val effStr = samples.map(e => f"$e%.3f").mkString("[", ",", "]")
    println(
      f"""{"metric":"kernel_scaling_efficiency","value":$median%.3f,"unit":"ratio","stat":"median_of_$rounds","per_round":$effStr,"n_threads":$n,"four_n_threads":${4 * n},"docs":$nDocs}""")
  }
}
