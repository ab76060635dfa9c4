package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench harness's self-heal decision rules (pure seams of
  * the `Bench` main — the outlier retry trigger and the r12
  * end-of-window re-probe adoption rule). The live paths only fire on a
  * contended host, so they need unit coverage: a wrong sign here
  * silently corrupts the per-round BENCH record.
  */
class BenchSpec extends AnyFunSuite {

  test("bimodalHigh: fires only past the floor band AND past 2x the vector min") {
    // the r10 q119 signature: one transient hit dominating the median
    assert(Bench.bimodalHigh(Seq(0.56, 7.45, 7.50)))
    // below the 0.3 s floor band, 2x is launch jitter — never fire
    assert(!Bench.bimodalHigh(Seq(0.05, 0.12, 0.13)))
    // steady vector — never fire
    assert(!Bench.bimodalHigh(Seq(1.0, 1.1, 1.2)))
    // exactly 2x is NOT bimodal (strict >)
    assert(!Bench.bimodalHigh(Seq(0.5, 1.0, 1.0)))
    // 5-element post-retry vector, still dominated
    assert(Bench.bimodalHigh(Seq(0.5, 4.9, 5.0, 5.1, 5.2)))
    assert(!Bench.bimodalHigh(Nil))
  }

  test("adoptReprobe: adopts only when the end probe reads under HALF the in-window median") {
    // the r11 q106 shape: 5.618 s in-window, ~1.1 s once the episode passed
    assert(Bench.adoptReprobe(5.618, Seq(1.2, 1.0, 1.1)) === Some(1.1))
    // a probe that is itself contended changes nothing
    assert(Bench.adoptReprobe(2.0, Seq(1.5, 1.6, 1.7)) === None)
    // exactly half is NOT adopted (strict <): a 2x gap is single-window noise
    assert(Bench.adoptReprobe(2.0, Seq(1.0, 1.0, 1.0)) === None)
    // every probe rep failed -> keep the in-window reading
    assert(Bench.adoptReprobe(5.0, Nil) === None)
    // unsorted probe input is sorted before taking the median
    assert(Bench.adoptReprobe(10.0, Seq(4.0, 1.0, 2.0)) === Some(2.0))
  }
}
