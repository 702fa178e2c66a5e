package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[EventStreams.recommendedStatePartitions]] — the
  * deployer-facing sizing rule for the ONE streaming knob the Auto
  * doctrine cannot reach (the state-store instance count is pinned
  * into the checkpoint at first start, so the regime must be chosen
  * BEFORE any data flows). The pins encode the measured crossover
  * from the dev/StreamScale keys-decade rung (SCALING.md round 11):
  * the 10⁶-key rung on 32 instances sat at ~3.1·10⁴
  * rows/instance/batch and was healthy; the same rung on 4 instances
  * sat at ~2.5·10⁵ and lost ×2.0–3.1 — so the rule must hand the
  * measured-degrading shape MORE instances than the gates' micro
  * floor, and must NOT inflate the micro floor itself.
  */
class StatePartitionSizingSpec extends AnyFunSuite {

  import EventStreams.recommendedStatePartitions

  test("micro-floor state (the gates' scale) stays at the caller's floor") {
    // q520-q528 run at tens of state rows; the measured evidence says
    // fixed per-instance cost dominates, so the rule must return the
    // floor, not scale up.
    assert(recommendedStatePartitions(peakStateRows = 50L, minInstances = 4) === 4)
    assert(recommendedStatePartitions(peakStateRows = 0L) === 1)
  }

  test("the measured-degrading rung is routed to >= the measured-healthy instance count") {
    // The 10^6-key dedup rung held 7.0M state rows; on 4 instances it
    // measured x2.0 worse than on 32. The rule must recommend at
    // least the 32 instances that measured healthy.
    assert(recommendedStatePartitions(peakStateRows = 7000000L) >= 32)
    // ...and the 10^6-row ValueState shape (quota) likewise.
    assert(recommendedStatePartitions(peakStateRows = 1000000L) >= 32)
  }

  test("constant-state shapes are never inflated by total key count") {
    // windowed's state is O(windows x types) = 15 rows at EVERY key
    // rung, and it measured FASTER on 4 instances even at 10^6 keys:
    // the rule keys on state rows, so a constant-state shape keeps
    // the floor no matter how large the stream.
    assert(recommendedStatePartitions(peakStateRows = 15L, minInstances = 4) === 4)
  }

  test("monotone in peak state; exact ceil division at the boundary") {
    val r1 = recommendedStatePartitions(30000L)
    val r2 = recommendedStatePartitions(30001L)
    assert(r1 === 1)
    assert(r2 === 2)
    val xs = Seq(1L, 1000L, 100000L, 1000000L, 100000000L)
    val recs = xs.map(recommendedStatePartitions(_))
    assert(recs === recs.sorted)
  }

  test("a 100 TB-shaped peak recommends a cluster-sized instance count") {
    // 10^10 in-horizon rows (a day of a large feed): ~334k instances
    // at the measured-healthy share - the rule scales to cluster
    // sizes without overflow.
    val r = recommendedStatePartitions(10000000000L)
    assert(r === 333334)
  }

  test("q533's oracle arithmetic can never drift from the function") {
    // The q533 gate runs recommendedStatePartitions LIVE on the census
    // rows while its DuckDB oracle renders the same rule as
    // greatest(1, ceil(peak / d)) — this fuzz pins the two forms equal
    // on every peak the census could produce, so the gate's hash
    // comparison stays a check of the CENSUS, not of arithmetic
    // dialect.
    val d = 64L
    for (peak <- (0L to 2000L) ++ Seq(63L, 64L, 65L, 127L, 128L, 129L, 1000000L)) {
      val sqlForm = math.max(1L, math.ceil(peak.toDouble / d).toLong)
      assert(recommendedStatePartitions(peak, rowsPerInstance = d).toLong === sqlForm,
        s"divergence at peak=$peak")
    }
  }

  test("guards reject nonsense") {
    intercept[IllegalArgumentException](recommendedStatePartitions(-1L))
    intercept[IllegalArgumentException](recommendedStatePartitions(1L, minInstances = 0))
    intercept[IllegalArgumentException](recommendedStatePartitions(1L, rowsPerInstance = 0L))
  }
}
