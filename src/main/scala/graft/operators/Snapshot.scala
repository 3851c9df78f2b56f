package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance (SURVEY.md §2.8): snapshot diffing.
  *
  * A production corpus is re-crawled / re-delivered continuously; the
  * expensive pipeline stages (dedup, decontamination, packing) must run
  * INCREMENTALLY — only over documents that actually changed between two
  * snapshot versions. The primitive that enables that is the snapshot
  * diff: given snapshots A (old) and B (new), emit the delta manifest
  * `(doc_id, status ∈ added|changed|removed)` that downstream stages
  * consume (added/changed re-enter the pipeline; removed retract).
  *
  * Reference analogue: SDFS versioned `put` over an existing key
  * (/root/reference/src/sdfs_master.cpp — a re-put replaces the stored
  * blob; clients discover change by re-reading). Here change discovery is
  * a first-class relational operator over content hashes.
  *
  * Scale shape (the whole point):
  *  - The diff never touches document TEXT after the scan: each side is
  *    projected to a `(doc_id, md5)` MANIFEST inside its own scan, so the
  *    join shuffles 16-byte hashes + ids — ~50 bytes/row instead of
  *    multi-KB documents. At 100 TB of text the manifests are ~100s of GB:
  *    three orders of magnitude less exchange.
  *  - One full-outer shuffle join on `doc_id` is the only wide op. With
  *    both snapshots stored bucketed by `doc_id` (the natural layout for
  *    a versioned corpus store — see Sdfs.putPartitioned) the exchange
  *    disappears entirely: Spark co-locates bucketed sides.
  *  - Output is only the CHANGED rows (`status <> 'unchanged'`) — the
  *    delta is small by construction in steady state, so downstream
  *    incremental stages read |delta|, not |corpus|.
  *
  * The driver testdata has a single `documents` snapshot, so the old
  * snapshot is DERIVED deterministically (mirrored verbatim in the
  * DuckDB oracle): every 11th doc is absent from the old snapshot
  * (→ added), every 7th doc carried a ` [draft]` suffix in the old
  * snapshot (→ changed), and for every 13th doc the old snapshot holds a
  * retired doc at a data-derived id offset (max(doc_id)+1, so synthetic
  * ids never collide with real ones at any SF — → removed).
  */
object Snapshot {

  /** Manifest of the CURRENT documents relation: `(doc_id, h)`.
    * The md5 is computed inside the scan projection — text never
    * survives past the map side.
    */
  private def newManifest(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("h"))

  /** The derived OLD snapshot's manifest (see object doc). */
  private def oldManifest(docs: DataFrame): DataFrame = {
    // data-derived id offset for the retired docs (1-row broadcast, the
    // same pattern as dedup_simhash_check's plant offset)
    val off = docs.agg((max(col("doc_id")) + lit(1L)).as("off"))
    val base = docs
      .filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [draft]")))
          .otherwise(col("text"))).as("h"))
    val retired = docs
      .filter(col("doc_id") % 13 === 0)
      .crossJoin(broadcast(off))
      .select((col("doc_id") + col("off")).as("doc_id"),
        md5(concat(lit("retired "), col("doc_id").cast("string"))).as("h"))
    base.unionByName(retired)
  }

  /** Delta manifest between the derived old snapshot and the current
    * documents: `(doc_id, status)` for every non-unchanged doc.
    */
  def snapshotDiff(docs: DataFrame): DataFrame =
    diff(oldManifest(docs), newManifest(docs))

  /** The generic operator: diff two `(doc_id, h)` manifests. */
  def diff(oldM: DataFrame, newM: DataFrame): DataFrame =
    newM.withColumnRenamed("h", "h_new")
      .join(oldM.withColumnRenamed("h", "h_old"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_new") =!= col("h_old"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snapshot_diff" -> ((s, d) => snapshotDiff(Tables.documents(s, d))))

  val oracle: Map[String, String] = Map(
    "snapshot_diff" ->
      """WITH newm AS (SELECT doc_id, md5(text) AS h FROM documents),
        |oldm AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [draft]' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
        |    md5('retired ' || CAST(doc_id AS VARCHAR))
        |  FROM documents WHERE doc_id % 13 = 0),
        |d AS (SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
        |  CASE WHEN o.h IS NULL THEN 'added'
        |       WHEN n.h IS NULL THEN 'removed'
        |       WHEN n.h <> o.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |  FROM newm n FULL OUTER JOIN oldm o ON n.doc_id = o.doc_id)
        |SELECT doc_id, status FROM d WHERE status <> 'unchanged'
        |ORDER BY doc_id""".stripMargin)
}
