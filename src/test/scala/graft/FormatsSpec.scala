package graft

import graft.operators.Formats

/** The CSV/JSON round-trip's scratch-dir hygiene (ADVICE r13): the
  * per-(fixture, PID) naming bounds the /tmp footprint to one copy per
  * live JVM, and the sweep at query start must reclaim everything no
  * live process can still be lazily reading — dead-PID dirs, legacy
  * suffix-less dirs from the pre-PID naming (which parse to no PID and
  * were previously never swept), and dirs whose PID was recycled (the
  * live process's start instant post-dates the dir, so it cannot be
  * the writer).
  */
class FormatsSpec extends SparkSuite {

  test("scratch sweep reclaims dead-PID and legacy dirs, keeps live ones") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def mk(name: String): java.io.File = {
      val d = new java.io.File(tmp, name)
      assert(d.mkdir() || d.isDirectory, s"could not create $d")
      new java.io.File(d, "marker").createNewFile()
      d
    }
    // a REAL dead PID: a process we started and reaped ourselves
    val reaped = new ProcessBuilder("true").start()
    reaped.waitFor()
    val deadPid = reaped.pid()
    val legacy = mk("graft_fmt_0abc1234") // pre-PID naming, no live owner
    val dead = mk(s"graft_fmt_0abc1234_p$deadPid")
    // PID 1 is always alive, started at boot, and is not us (this JVM
    // forked from sbt): a dir owned by a live foreign process whose
    // start PRE-dates the dir must survive — it may still be lazily
    // read. A dir OLDER than its pid's process is the recycled-PID
    // case and must be swept.
    val liveForeign = mk("graft_fmt_0abc1234_p1")
    liveForeign.setLastModified(System.currentTimeMillis())
    val p1Start = ProcessHandle.of(1L).get.info.startInstant
    // skip when this JVM IS pid 1 (dockerized CI): mine short-circuits
    // the sweep and the planted dirs would legitimately survive
    val canPlantP1 = ProcessHandle.current().pid() != 1L &&
      p1Start.isPresent && p1Start.get.toEpochMilli > 200000
    val recycled: Option[java.io.File] =
      if (canPlantP1) {
        // CLEARLY older than the process start (beyond the 60 s clock-
        // skew margin): the recycled-PID case, must be swept
        val d = mk("graft_fmt_0abc9999_p1")
        d.setLastModified(p1Start.get.toEpochMilli - 120000)
        Some(d)
      } else None // epoch-start pid 1: cannot plant an older mtime
    val withinSkew: Option[java.io.File] =
      if (canPlantP1) {
        // only SLIGHTLY older than the start (inside the margin): two
        // clock sources a couple of seconds apart must NOT read as a
        // recycled PID — the dir survives
        val d = mk("graft_fmt_0abc8888_p1")
        d.setLastModified(p1Start.get.toEpochMilli - 2000)
        Some(d)
      } else None
    val markerKept: Option[java.io.File] =
      if (canPlantP1) {
        // ADVICE r15: a stale dir mtime (recycled-PID-shaped) but a
        // FRESH .graft_live marker inside — the fallback an owner on a
        // setLastModified-rejecting filesystem leaves. liveStamp must
        // read the marker's mtime and keep the dir.
        val d = mk("graft_fmt_0abc7777_p1")
        new java.io.File(d, ".graft_live").createNewFile() // mtime = now
        d.setLastModified(p1Start.get.toEpochMilli - 120000)
        Some(d)
      } else None
    try {
      val q = Formats.queries.find(_.name == "source_formats").get
      q.fn(spark, sf).collect()
      assert(!legacy.exists(), "legacy suffix-less dir must be swept")
      assert(!dead.exists(), "dead-PID dir must be swept")
      assert(liveForeign.exists(), "fresh live-foreign-PID dir must survive")
      recycled.foreach(d => assert(!d.exists(),
        "dir older than its pid's process start must be swept (recycled PID)"))
      withinSkew.foreach(d => assert(d.exists(),
        "dir within the clock-skew margin of its pid's start must survive"))
      markerKept.foreach(d => assert(d.exists(),
        "stale-mtime dir with a fresh .graft_live marker must survive"))
      // and this JVM's own dir is present and readable (the query's
      // result frame just lazily read from it)
      val key = java.util.UUID
        .nameUUIDFromBytes(sf.getBytes("UTF-8")).toString.take(8)
      val own = new java.io.File(tmp,
        s"graft_fmt_${key}_p${ProcessHandle.current().pid()}")
      assert(own.isDirectory, "own scratch dir must exist after the run")
    } finally (Seq(legacy, dead, liveForeign) ++ recycled ++ withinSkew ++
      markerKept).foreach(d =>
      GraftSession.deleteRecursively(d.toPath))
  }
}
