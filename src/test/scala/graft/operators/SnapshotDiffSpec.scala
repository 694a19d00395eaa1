package graft.operators

import graft.SparkTestBase

/** Snapshot diff: status assignment per id, hash semantics, stable summary. */
class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "kept exactly as before"),
    (2L, "this one will be edited"),
    (3L, "this one will be deleted")
  ).toDF("doc_id", "text")

  private val newSnap = Seq(
    (1L, "kept exactly as before"),
    (2L, "this one was edited"),
    (4L, "a brand new document")
  ).toDF("doc_id", "text")

  test("added / removed / changed / unchanged assigned per id; hashes NULL on absent sides") {
    val out = SnapshotDiff.diff(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
    out should have size 4
    out(1L)._1 shouldBe "unchanged"
    out(1L)._2 shouldBe out(1L)._3 // same content, same hash
    out(2L)._1 shouldBe "changed"
    out(2L)._2 should not be out(2L)._3
    out(3L) shouldBe (("removed", out(3L)._2, None))
    out(4L) shouldBe (("added", None, out(4L)._3))
  }

  test("summary counts every status with a stable schema; self-diff is all-unchanged") {
    val s = SnapshotDiff.diffSummary(oldSnap, newSnap).head()
    (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) shouldBe ((1L, 1L, 1L, 1L))
    val self = SnapshotDiff.diffSummary(oldSnap, oldSnap).head()
    (self.getLong(0), self.getLong(1), self.getLong(2), self.getLong(3)) shouldBe
      ((0L, 0L, 0L, 3L))
  }
}
