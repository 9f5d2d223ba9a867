package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-18 concurrency contract of
  * [[graft.streaming.StreamingOps.statePinnedSession]]: the memoized
  * clone's conf reconciliation runs atomically under the lock, so two
  * concurrent callers on the same parent can never hand a half-synced
  * clone to a stream start, and a conf key the parent unsets leaves
  * the clone on the very next call (the withRocksDb restore path).
  * The previous design (fresh clone per call) had no such race but
  * leaked a listener bus per invocation; the memoized design must keep
  * BOTH properties.
  */
class StatePinnedConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("same parent memoizes one clone and re-syncs dynamic conf both ways") {
    val s = spark
    val key = "spark.graft.test.pinned.dynamic"
    s.conf.set(key, "v1")
    val p1 = graft.streaming.StreamingOps.statePinnedSession(s)
    assert(p1.conf.get(key) === "v1")
    // same clone instance on repeat call (the listener-leak fix)
    val p2 = graft.streaming.StreamingOps.statePinnedSession(s)
    assert(p1 eq p2)
    // parent mutation propagates on the next call
    s.conf.set(key, "v2")
    assert(graft.streaming.StreamingOps.statePinnedSession(s).conf.get(key) === "v2")
    // parent UNSET propagates too — a stale provider-style pin must
    // not outlive its scope (the silent-drop failure mode)
    s.conf.unset(key)
    val p3 = graft.streaming.StreamingOps.statePinnedSession(s)
    assert(p3.conf.getOption(key).isEmpty)
  }

  test("concurrent callers never observe a half-synced clone") {
    val s = spark
    val key = "spark.graft.test.pinned.race"
    val pairA = ("a1", "a2") // writer flips between two consistent pairs
    val keys = Seq(s"$key.x", s"$key.y")
    def setPair(v: (String, String)): Unit = {
      s.conf.set(keys(0), v._1); s.conf.set(keys(1), v._2)
    }
    setPair(pairA)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          val p = graft.streaming.StreamingOps.statePinnedSession(s)
          // The pinned property is "the clone is consistent at any
          // lock-quiesced point": read the pair under the SAME lock the
          // reconciliation holds, else a writer-triggered resync could
          // legitimately update both keys between the two reads and
          // fabricate a mixed observation (x=a1, y=b2) that says
          // nothing about statePinnedSession itself.
          val (x, y) = graft.streaming.StreamingOps.confLock.synchronized {
            (p.conf.getOption(keys(0)).getOrElse("?"),
             p.conf.getOption(keys(1)).getOrElse("?"))
          }
          val ok = (x == "a1" && y == "a2") || (x == "b1" && y == "b2")
          if (!ok) bad.compareAndSet(null, s"x=$x y=$y")
        }
      })
    }
    val writer = new Thread(() => {
      var flip = false
      (1 to 200).foreach { _ =>
        // the writer serializes its pair-write through the same lock
        // the reconciliation holds, modeling a caller that mutates the
        // parent and then asks for the pinned session
        graft.streaming.StreamingOps.confLock.synchronized {
          setPair(if (flip) ("b1", "b2") else ("a1", "a2"))
        }
        flip = !flip
        graft.streaming.StreamingOps.statePinnedSession(s)
      }
      stop.set(true)
    })
    readers.foreach(_.start()); writer.start()
    writer.join(60000); stop.set(true); readers.foreach(_.join(10000))
    keys.foreach(s.conf.unset)
    assert(bad.get() === null, s"observed half-synced clone: ${bad.get()}")
  }
}
