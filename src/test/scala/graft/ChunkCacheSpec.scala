package graft

import org.scalatest.funsuite.AnyFunSuite

/** Policy gate for the round-11 region-chunk cache: a capped
  * access-ordered LRU (coldest-out, per-insert, inside the map's own
  * lock) replacing the clear()-everything-at-cap whose refill storm
  * re-read every live chunk and whose size-check/put race could
  * overshoot the cap. Drives [[graft.ops.KeyedStore.newChunkCache]]
  * directly — the store's global cache is the same construction.
  */
class ChunkCacheSpec extends AnyFunSuite {
  import ops.KeyedStore

  private def withCap[T](cap: Int)(body: => T): T = {
    val prev = KeyedStore.RegionChunkCacheCap
    KeyedStore.RegionChunkCacheCap = cap
    try body finally KeyedStore.RegionChunkCacheCap = prev
  }

  test("crossing the cap evicts one coldest entry per insert; warm " +
       "entries survive and the cache never empties") {
    withCap(8) {
      val m = KeyedStore.newChunkCache()
      (0 until 8).foreach(i => m.put(s"k$i", IndexedSeq(i.toString)))
      var minSize = Int.MaxValue
      (8 until 40).foreach { i =>
        m.get("k0") // keep k0 warm across every insert
        m.put(s"k$i", IndexedSeq(i.toString))
        minSize = math.min(minSize, m.size())
      }
      assert(m.size() == 8, s"LRU must sit at the cap: ${m.size()}")
      assert(minSize == 8,
        s"size dipped to $minSize — a clear()-style refill window")
      assert(m.containsKey("k0"), "the warm entry was evicted")
      assert(m.containsKey("k39") && m.containsKey("k33"))
      assert(!m.containsKey("k1") && !m.containsKey("k8"),
        "cold entries are the ones to go")
    }
  }

  test("shrinking the live cap drains the excess on the next insert") {
    val m = withCap(32) {
      val m = KeyedStore.newChunkCache()
      (0 until 30).foreach(i => m.put(s"k$i", IndexedSeq.empty))
      m
    }
    withCap(8) {
      m.put("fresh", IndexedSeq.empty)
      assert(m.size() == 8, s"excess not drained: ${m.size()}")
      assert(m.containsKey("fresh"))
    }
  }

  test("concurrent readers and writers: bounded size throughout, no " +
       "empty-cache window, no overshoot") {
    withCap(16) {
      val m = KeyedStore.newChunkCache()
      (0 until 16).foreach(i => m.put(s"seed$i", IndexedSeq.empty))
      val bad = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          val rnd = new scala.util.Random(t)
          (0 until 2000).foreach { i =>
            if (rnd.nextBoolean()) m.put(s"t$t-$i", IndexedSeq.empty)
            else m.get(s"t${rnd.nextInt(8)}-${rnd.nextInt(i + 1)}")
            val s = m.size()
            if (s < 1 || s > 16) bad.incrementAndGet()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(bad.get() == 0, s"size left [1, cap] ${bad.get()} times")
      assert(m.size() == 16)
    }
  }
}
