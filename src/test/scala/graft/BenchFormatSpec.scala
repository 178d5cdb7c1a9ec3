package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the stdout/file JSON contract the driver parses. The driver
  * captures a bounded tail of Bench stdout and `json.load`s the LAST
  * line, then reads `metric`/`value` (and, since r10, the `sched`
  * host-health probe); the file record additionally carries the
  * per-query map. A malformed line silently zeroes the round's bench
  * artifact, so the rendering is pinned here as PARSEABLE json with
  * the exact expected keys — not just eyeballed.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val results = Seq("q1_agg" -> 1.2345, "scan_pruned" -> 0.0,
    "dedup_exact" -> 12.3449)
  private val sched = Bench.schedJson(0.033, 0.339, 0.042, 0.363)

  // Minimal JSON object checks without a parser dependency: balanced
  // braces, the expected key:value fragments, and no locale commas.
  private def assertFragments(line: String, frags: Seq[String]): Unit = {
    assert(line.count(_ == '{') == line.count(_ == '}'), line)
    assert(line.head == '{' && line.last == '}', line)
    frags.foreach(f => assert(line.contains(f), s"missing `$f` in $line"))
  }

  test("total-only line: keys, rounding, and count") {
    val line = Bench.renderTotalOnly(results, sched, "/data/sf0.1")
    assertFragments(line, Seq(
      "\"metric\":\"total\"",
      // 1.2345 + 0.0 + 12.3449 = 13.5794 → %.3f half-up
      "\"value\":13.579",
      "\"unit\":\"sec\"",
      "\"n\":3",
      "\"sched\":{\"pre_p50\":0.033,\"pre_max\":0.339,\"post_p50\":0.042,\"post_max\":0.363}",
      "\"sf\":\"/data/sf0.1\""))
    assert(!line.contains("queries"), "total-only must stay ~160 bytes")
    assert(line.length < 250, s"total-only line too long: ${line.length}")
  }

  test("full file record: per-query map with formatted seconds") {
    val line = Bench.renderFullRecord(results, sched, "/data/sf0.1")
    assertFragments(line, Seq(
      "\"queries\":{\"q1_agg\":1.235,\"scan_pruned\":0.000,\"dedup_exact\":12.345}",
      "\"metric\":\"total\"", "\"sched\":",
      // no mid probes passed → an empty but still-parseable array
      "\"sched_mid\":[]"))
  }

  test("mid-suite probe fragments: streamed line shape and file array") {
    val mids = Seq((15, 0.033, 0.051), (30, 0.106, 0.15))
    assert(Bench.midJson(mids) ==
      "\"sched_mid\":[{\"after\":15,\"p50\":0.033,\"max\":0.051}," +
        "{\"after\":30,\"p50\":0.106,\"max\":0.150}]")
    val line = Bench.renderFullRecord(results, sched, "/d", mids)
    assertFragments(line, Seq(
      "\"sched_mid\":[{\"after\":15,\"p50\":0.033,\"max\":0.051}"))
    // the streamed stdout twin must stay well under the per-query lines'
    // length budget (the whole point is not to ration the bounded tail)
    val streamed = s"""{"sched_mid":${Bench.fmt(0.033)},"max":${Bench.fmt(0.051)},"after":15}"""
    assert(streamed.length < 60, streamed)
    assertFragments(streamed, Seq("\"sched_mid\":0.033", "\"after\":15"))
  }

  test("fmt is locale-pinned to a dot decimal separator") {
    // No global Locale.setDefault here: mutating the JVM default races
    // any concurrently-running suite. The pin is demonstrated by
    // contrast instead — an unpinned GERMANY format of the same value
    // yields the comma decimal fmt exists to prevent.
    assert(Bench.fmt(1.5) == "1.500")
    assert(String.format(java.util.Locale.GERMANY, "%.3f",
      Double.box(1.5)) == "1,500")
  }

  test("sf dir is JSON-escaped; query names need no escaping") {
    val line = Bench.renderTotalOnly(results, sched, """C:\data "x"""")
    assert(line.contains(""""sf":"C:\\data \"x\""""))
    assert(Bench.jstr("a\nb\tc") == "a\\u000ab\\u0009c")
  }

  test("empty suite still renders a parseable record") {
    val line = Bench.renderTotalOnly(Seq.empty, sched, "/d")
    assertFragments(line, Seq("\"value\":0.000", "\"n\":0"))
  }
}
