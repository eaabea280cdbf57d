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

  test("sweepToBudget releases oldest-first and only while over budget") {
    TrackedCaches.release()
    val oldDf = spark.range(0, 100000).toDF("a").persist()
    TrackedCaches.track(oldDf)
    oldDf.count() // materialize so storage bytes are non-zero
    val newDf = spark.range(0, 100000).selectExpr("id * 2 as b").persist()
    TrackedCaches.track(newDf)
    newDf.count()
    // generous budget: nothing swept
    assert(TrackedCaches.sweepToBudget(Long.MaxValue) == 0)
    assert(TrackedCaches.count == 2)
    // zero budget: sweeps oldest first; the loop also takes the second
    // because total stays above zero — both entries go, registry empty
    val swept = TrackedCaches.sweepToBudget(0L)
    assert(swept == 2)
    assert(TrackedCaches.count == 0)
    assert(oldDf.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
    TrackedCaches.release()
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
