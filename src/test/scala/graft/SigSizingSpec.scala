package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.SigSizing.recommend

/** The width-law calculator: bits ≈ m·log₂(n∕B), clamped to the
  * engine's supported signature range. Exact-power cases pin the
  * formula; the clamps and monotonicity pin the contract. */
class SigSizingSpec extends AnyFunSuite {

  test("exact powers of two hit the formula") {
    // n/B = 2048 = 2^11 ⇒ 3 segments × 11 bits
    assert(recommend(131072L, 3, 64) === 33)
    // n/B = 256 = 2^8 ⇒ 2 × 8
    assert(recommend(16384L, 2, 64) === 16)
  }

  test("floor: tiny corpora keep ≥ 4 bits per segment") {
    assert(recommend(100L, 3, 64) === 12)
    assert(recommend(1L, 2, 1) === 8)
  }

  test("ceiling: bits never exceed the 63-bit signature") {
    assert(recommend(1L << 40, 4, 1) === 63)
  }

  test("monotone in corpus size, antitone in target bucket rows") {
    assert(recommend(1000000L, 3, 64) >= recommend(10000L, 3, 64))
    assert(recommend(1000000L, 3, 16) >= recommend(1000000L, 3, 256))
  }
}
