package graft

import java.nio.file.{Files, Paths}

import graft.operators.Meta

/** Golden physical-plan snapshots — the analog of the reference's
  * plan-suite golden files (`planner/core/testdata/plan_suite_in.json` /
  * `_out.json`, re-recorded via a record flag). Shapes are normalized to
  * operator names only, so they are stable across runs but still pin the
  * load-bearing decisions: pushdown depth, join strategy, partial/final
  * agg split, TakeOrderedAndProject.
  *
  * Re-record with: GRAFT_RECORD_GOLDEN=1 sbt "testOnly graft.PlanGoldenSpec"
  */
class PlanGoldenSpec extends SparkSuite {

  private val goldenDir = Paths.get("src/test/resources/golden")
  private val record = sys.env.contains("GRAFT_RECORD_GOLDEN")

  private val snapshot = Seq(
    "scan_pruned", "filter_selection", "join_inner", "join_multiway",
    "join_merge", "agg_group", "agg_distinct", "topn", "limit_offset",
    "dedup_exact", "text_quality", "events_window_agg", "text_tfidf",
    "pipeline_curation")

  snapshot.foreach { name =>
    test(s"plan shape of $name matches golden snapshot") {
      val shape = Meta.planShape(q(name)) + "\n"
      val file = goldenDir.resolve(s"$name.txt")
      if (record) {
        Files.createDirectories(goldenDir)
        Files.writeString(file, shape)
      } else {
        assert(Files.exists(file),
          s"missing golden file $file — record with GRAFT_RECORD_GOLDEN=1")
        val expected = Files.readString(file)
        assert(shape == expected,
          s"plan shape drift for $name:\n--- golden ---\n$expected\n--- now ---\n$shape")
      }
    }
  }
}
