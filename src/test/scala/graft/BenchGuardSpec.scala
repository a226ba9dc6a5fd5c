package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench window guards: the r5 driver window was
  * uniformly slow (spread 1.07) so the spread guard passed it through —
  * the LEVEL guard must catch exactly that shape without flagging
  * genuine regressions (slow wall clock, normal CPU/GC).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("uniformly slow window with inflated CPU/GC is degraded (r5 driver shape)") {
    // r5 driver: passes ~31.5 s vs clean 4.5 s; CPU 521-816 s vs 77-103;
    // GC 3300-8000 ms vs ~150
    assert(Bench.degradedVsClean(31.4, 521.0, 3300L, 4.57, 77.0, 150L))
  }

  test("a genuine 3x regression (normal CPU/GC) is NOT parked") {
    // wall 3x slower but per-pass CPU and GC in the clean band: must
    // land in bench.json so the regression is visible
    assert(!Bench.degradedVsClean(14.0, 90.0, 160L, 4.57, 77.0, 150L))
  }

  test("mild slowdowns under 2x never trigger the level guard") {
    assert(!Bench.degradedVsClean(8.0, 400.0, 5000L, 4.57, 77.0, 150L))
  }

  test("GC inflation alone (10x) corroborates degradation") {
    assert(Bench.degradedVsClean(12.0, 100.0, 9000L, 4.57, 77.0, 400L))
    assert(!Bench.degradedVsClean(12.0, 100.0, 3000L, 4.57, 77.0, 400L))
  }

  test("clean-headline parser: extracts level reference, rejects non-clean") {
    val clean = """{"metric":"total","value":45.0,"queries":{"x_extract":4.570,"q1_agg":0.3},"extract_passes_sec":[6.65,4.48,4.57],"pass_gc_ms":[150,160,140],"pass_cpu_sec":[103.0,77.0,81.5],"noisy_window":false,"degraded_window":false,"retried_window":false}"""
    assert(Bench.parseCleanHeadline(clean).contains((4.57, 77.0, 140L)))
    val noisy = clean.replace("\"noisy_window\":false", "\"noisy_window\":true")
    assert(Bench.parseCleanHeadline(noisy).isEmpty)
    val degraded = clean.replace("\"degraded_window\":false", "\"degraded_window\":true")
    assert(Bench.parseCleanHeadline(degraded).isEmpty)
    // pre-r6 artifacts (no degraded_window field) still parse
    val old = clean.replace(",\"degraded_window\":false", "")
    assert(Bench.parseCleanHeadline(old).contains((4.57, 77.0, 140L)))
  }

  test("a synthetic slow-uniform window cannot displace a clean headline") {
    // the end-to-end routing decision replicated: clean headline on
    // disk, new window uniformly slow with corroborating diagnostics
    val cleanRef = Bench.parseCleanHeadline(
      """{"queries":{"x_extract":4.570},"extract_passes_sec":[6.65,4.48,4.57],"pass_gc_ms":[150,160,140],"pass_cpu_sec":[103.0,77.0,81.5],"noisy_window":false}""").get
    val newPasses = Seq(31.5, 31.4, 33.5) // spread 1.07 -> spread guard blind
    assert(Bench.spread(newPasses) < 1.5)
    val extractSec = newPasses.sorted.take(3).apply(1)
    val degraded = Bench.degradedVsClean(extractSec, 521.0, 3300L,
      cleanRef._1, cleanRef._2, cleanRef._3)
    assert(degraded, "level guard must park what the spread guard misses")
  }
}
