package graft.operators

import graft.SparkSpecBase

class TrackedCachesSpec extends SparkSpecBase {

  import spark.implicits._

  test("scopedRelease releases exactly the caches registered during the block") {
    TrackedCaches.release()
    val outer = Seq(1).toDF("a").persist()
    TrackedCaches.track(outer)
    TrackedCaches.scopedRelease {
      TrackedCaches.track(Seq(2).toDF("b").persist())
    }
    // the outer cache survives, the scoped one is gone from the registry
    assert(TrackedCaches.count == 1)
    TrackedCaches.release()
    assert(TrackedCaches.count == 0)
  }

  test("a global release inside the scope does not strand the scope's caches") {
    TrackedCaches.release()
    TrackedCaches.track(Seq(1).toDF("a").persist())
    TrackedCaches.scopedRelease {
      // simulates another thread's release() racing the scope
      TrackedCaches.release()
      TrackedCaches.track(Seq(2).toDF("b").persist())
      TrackedCaches.track(Seq(3).toDF("c").persist())
    }
    // with the stale-mark clamp the two scoped caches would stay
    // registered forever; they must be swept on scope exit
    assert(TrackedCaches.count == 0)
  }
}
