package graft

import org.scalacheck.{Prop, Properties}
import graft.gen.Clickstream

/** Property tests (ScalaCheck) for the generator's multiplicative hash —
  * the whole medallion oracle depends on these invariants holding for
  * every key the testdata can produce.
  */
class GenHashSpec extends Properties("Clickstream.h") {
  import Prop.forAll
  import org.scalacheck.Gen

  private val keys = Gen.chooseNum(0L, 10000000L)
  private val salts = Gen.chooseNum(0L, 50L)

  property("bounded: 0 <= h < modulus") = forAll(salts, keys) { (salt, k) =>
    val v = Clickstream.h(salt, k)
    v >= 0L && v < 1000000007L
  }

  property("no overflow en route (matches BigInt arithmetic)") =
    forAll(salts, keys) { (salt, k) =>
      val big = ((BigInt(k) % 1000003 + 1) * BigInt(2654435761L) +
        BigInt(salt) * 40503) % BigInt(1000000007L)
      BigInt(Clickstream.h(salt, k)) == big
    }

  property("funnel expands to 5-7 events, +1 dup iff k % 100 == 0") =
    forAll(Gen.chooseNum(1L, 100000L)) { k =>
      val o = Clickstream.FunnelOrder(k, 7L, 800000000L, Seq(1L, 2L, 3L))
      val evs = Clickstream.funnelEvents(o)
      val base = if (k % 100 == 0) evs.size - 1 else evs.size
      base >= 5 && base <= 7 &&
        evs.count(_.event_type == "purchase") == 1 &&
        evs.head.event_type == "page_view"
    }
}
