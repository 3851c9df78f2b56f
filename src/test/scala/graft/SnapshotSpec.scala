package graft

import graft.operators.Snapshot
import org.scalatest.funsuite.AnyFunSuite

/** Specs for snapshot diffing (SURVEY §2.8) beyond the DuckDB oracle:
  * the generic two-manifest diff on hand-built snapshots, and the
  * self-inverse / delta-size properties an incremental pipeline relies
  * on.
  */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def manifest(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "h")
  }

  test("diff classifies added / removed / changed and drops unchanged") {
    val oldM = manifest(1L -> "a", 2L -> "b", 3L -> "c")
    val newM = manifest(2L -> "b", 3L -> "C2", 4L -> "d")
    val got = Snapshot.diff(oldM, newM).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("diff of a snapshot with itself is empty") {
    val m = manifest(1L -> "a", 2L -> "b", 3L -> "c")
    assert(Snapshot.diff(m, m).isEmpty)
  }

  test("derived-snapshot diff: every status present, statuses match the construction") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val byStatus = Snapshot.snapshotDiff(docs).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // construction invariants, independent of the oracle:
    //  added   = ids % 11 == 0 (absent from the derived old snapshot)
    //  changed = ids % 7 == 0 that are NOT also added
    //  removed = synthetic retired ids, all beyond max(doc_id)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val maxId = ids.max
    assert(byStatus("added") == ids.filter(_ % 11 == 0))
    assert(byStatus("changed") == ids.filter(i => i % 7 == 0 && i % 11 != 0))
    assert(byStatus("removed").forall(_ > maxId))
    assert(byStatus("removed").size == ids.count(_ % 13 == 0))
  }

  test("steady-state delta is small relative to the corpus (incremental contract)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val delta = Snapshot.snapshotDiff(docs).count()
    // 1/11 + 1/7 + 1/13 ≈ 31% upper bound; the point is |delta| << |corpus|
    assert(delta < n / 2, s"delta $delta not incremental vs corpus $n")
  }
}
