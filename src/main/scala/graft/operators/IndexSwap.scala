package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe multi-frame swap for persisted index directories.
  *
  * The persisted index families (MinHash `bands`+`dropped`, IVF
  * `moments`+`centroids`) rewrite SETS of frames on append, and the
  * frames are only meaningful as a generation: new `bands` with old
  * `dropped` silently voids the append ≡ rebuild contract. A naive
  * delete-then-rename swap has two crash holes — a window with a frame
  * missing entirely, and a window with frames from different
  * generations live together. This helper closes both:
  *
  *   1. the writer stages every frame first (`name__staged`, complete
  *      parquet dirs with a `_SUCCESS` marker),
  *   2. [[swapAll]] then renames ALL live frames aside
  *      (`name__old`), promotes ALL staged frames, and deletes the
  *      asides LAST — deletes never precede renames, so every crash
  *      state keeps at least one full copy of every frame on disk,
  *   3. [[recover]] (called at every index entry point) heals any
  *      interrupted swap deterministically: once a swap has started
  *      (any `__old` present) every staged frame was already complete,
  *      so the index rolls FORWARD to the new generation; staged
  *      leftovers from a writer that died mid-write (no swap started,
  *      some `_SUCCESS` missing) roll BACK by deletion. Either way the
  *      surviving frames are from ONE generation.
  *
  * Append-only frames (MinHash `shingles`, IVF `lists`, PQ `codes`)
  * don't need this: parquet `mode("append")` adds whole files and a
  * torn write leaves at worst an orphaned part-file without a footer,
  * which readers reject loudly rather than mixing generations.
  */
object IndexSwap {
  private def live(dir: String, n: String) = new Path(s"$dir/$n")
  private def staged(dir: String, n: String) = new Path(s"$dir/${n}__staged")
  private def old(dir: String, n: String) = new Path(s"$dir/${n}__old")

  /** A staged frame is complete iff its job-commit marker landed. */
  private def complete(fs: FileSystem, dir: String, n: String): Boolean =
    fs.exists(new Path(staged(dir, n), "_SUCCESS"))

  /** Path of the staged frame for `name` — writers stage here. */
  def stagedPath(dir: String, name: String): String = s"$dir/${name}__staged"

  /** Heal an interrupted [[swapAll]] (or an interrupted stage-write).
    * Idempotent and cheap (a handful of FS metadata calls) — call at
    * the top of every function that reads or appends the index. */
  def recover(fs: FileSystem, dir: String, names: Seq[String]): Unit = {
    val anyStaged = names.exists(n => fs.exists(staged(dir, n)))
    val anyOld = names.exists(n => fs.exists(old(dir, n)))
    if (!anyStaged && !anyOld) return
    if (anyOld) {
      // a swap started: swapAll verified every staged frame complete
      // before the first rename, so the new generation is whole —
      // finish promoting it
      names.foreach { n =>
        if (fs.exists(staged(dir, n))) {
          if (fs.exists(live(dir, n)))
            // aside for this frame hadn't happened yet
            asideThenPromote(fs, dir, n)
          else
            require(fs.rename(staged(dir, n), live(dir, n)),
              s"recover: could not promote ${staged(dir, n)}")
        } else if (!fs.exists(live(dir, n)) && fs.exists(old(dir, n))) {
          // frame had no staged replacement this generation (e.g. a
          // name list that grew between versions) — restore the aside
          require(fs.rename(old(dir, n), live(dir, n)),
            s"recover: could not restore ${old(dir, n)}")
        }
        if (fs.exists(old(dir, n))) fs.delete(old(dir, n), true)
      }
    } else {
      // no swap started — staged dirs are writer leftovers. If EVERY
      // frame staged completely the writer died between its last stage
      // write and swapAll: promoting is exactly the swap it intended.
      // Otherwise the staged generation is torn — drop it.
      if (names.forall(n => complete(fs, dir, n)))
        swapAll(fs, dir, names)
      else
        names.foreach(n =>
          if (fs.exists(staged(dir, n))) fs.delete(staged(dir, n), true))
    }
  }

  private def asideThenPromote(fs: FileSystem, dir: String, n: String): Unit = {
    if (fs.exists(old(dir, n))) fs.delete(old(dir, n), true)
    require(fs.rename(live(dir, n), old(dir, n)),
      s"swap: could not rename ${live(dir, n)} aside")
    require(fs.rename(staged(dir, n), live(dir, n)),
      s"swap: could not promote ${staged(dir, n)}")
  }

  /** Drop any staged/aside leftovers — a full REBUILD overwrites the
    * live frames directly, and letting an older generation's `__staged`
    * or `__old` dirs survive it would make a later [[recover]] promote
    * stale frames over the fresh build. Call before rebuilding. */
  def clean(fs: FileSystem, dir: String, names: Seq[String]): Unit =
    names.foreach { n =>
      if (fs.exists(staged(dir, n))) fs.delete(staged(dir, n), true)
      if (fs.exists(old(dir, n))) fs.delete(old(dir, n), true)
    }

  /** Publish every `name__staged` over its live frame: verify ALL
    * staged frames are complete, rename every live frame aside, promote
    * every staged frame, delete the asides last. No crash point loses a
    * frame or mixes generations across a [[recover]]. */
  def swapAll(fs: FileSystem, dir: String, names: Seq[String]): Unit = {
    names.foreach(n => require(complete(fs, dir, n),
      s"swapAll: staged frame ${staged(dir, n)} is missing or incomplete"))
    names.foreach { n =>
      if (fs.exists(old(dir, n))) fs.delete(old(dir, n), true)
      if (fs.exists(live(dir, n)))
        require(fs.rename(live(dir, n), old(dir, n)),
          s"swapAll: could not rename ${live(dir, n)} aside")
    }
    names.foreach(n =>
      require(fs.rename(staged(dir, n), live(dir, n)),
        s"swapAll: could not promote ${staged(dir, n)}"))
    names.foreach(n =>
      if (fs.exists(old(dir, n))) fs.delete(old(dir, n), true))
  }
}
