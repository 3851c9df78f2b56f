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

  /** Manifest of a `(doc_id, text)` relation: `(doc_id, h)`.
    * The md5 is computed inside the scan projection — text never
    * survives past the map side.
    */
  private def manifest(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("h"))

  /** The derived OLD snapshot, WITH text (see object doc): absent %11
    * (→ added), ` [draft]`-suffixed %7 (→ changed), retired docs at a
    * data-derived id offset (→ removed). [[snapshotDiff]] sees only its
    * manifest; [[incrementalClean]] re-runs the clean gate over it, so
    * the full text matters there.
    */
  private[operators] def oldSnapshot(docs: DataFrame): DataFrame = {
    // data-derived id offset for the retired docs (1-row broadcast, the
    // same pattern as dedup_simhash_check's plant offset)
    val off = docs.agg((max(col("doc_id")) + lit(1L)).as("off"))
    val base = docs
      .filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [draft]")))
          .otherwise(col("text")).as("text"))
    val retired = docs
      .filter(col("doc_id") % 13 === 0)
      .crossJoin(broadcast(off))
      .select((col("doc_id") + col("off")).as("doc_id"),
        concat(lit("retired "), col("doc_id").cast("string")).as("text"))
    base.unionByName(retired)
  }

  /** Delta manifest between the derived old snapshot and the current
    * documents: `(doc_id, status)` for every non-unchanged doc.
    */
  def snapshotDiff(docs: DataFrame): DataFrame =
    diff(manifest(oldSnapshot(docs)), manifest(docs))

  /** The generic operator: diff two `(doc_id, h)` manifests. Presence
    * is decided by explicit markers, NOT hash nullity — a null-text doc
    * manifests as h = null (md5(null) is null), and inferring absence
    * from that would misclassify a doc present on both sides as
    * added/removed (breaking [[applyDelta]]'s round-trip identity for
    * crawls that deliver null bodies). Null-safe hash equality for the
    * same reason: two null-body versions of a doc are `unchanged`.
    */
  def diff(oldM: DataFrame, newM: DataFrame): DataFrame =
    newM.withColumnRenamed("h", "h_new").withColumn("in_new", lit(true))
      .join(oldM.withColumnRenamed("h", "h_old").withColumn("in_old", lit(true)),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(!col("h_new").eqNullSafe(col("h_old")), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))

  // ------------------------------------------- incremental clean pipeline

  /** The clean gate run INCREMENTALLY over a snapshot delta — the stage
    * [[snapshotDiff]]'s delta relation exists for (SURVEY §5:
    * "downstream incremental stages consume only the added/changed
    * delta"). Contract: the result EQUALS `pipe_clean_corpus` recomputed
    * from scratch on the new snapshot (the oracle literally reuses that
    * query's SQL), while the corpus-scale work is proportional to the
    * delta and its near-dup neighborhoods, not the corpus.
    *
    * Why a delta-only recompute is not just `clean(delta) ∪ prior`:
    * near-dup clustering is a GLOBAL property. An added doc can bridge
    * two old clusters (re-electing the canonical min-id member); a
    * removed/changed doc can have BEEN the canonical member, re-admitting
    * a mate that the prior run dropped. Exactness therefore needs the
    * delta's full blast radius:
    *
    *  1. seeds = added/changed docs ∪ prior-cluster MATES of every delta
    *     doc (the prior ledger's `cluster_id` finds them without
    *     touching the old pair graph);
    *  2. the blast radius closes over the NEW corpus's shared-shingle
    *     graph by iterated sparse joins against the shingle index
    *     (shared-shingle components ⊇ Jaccard components, so the closure
    *     is a superset of every true component that touches a seed —
    *     recomputing a superset is redundant work, never a wrong
    *     answer); rounds = neighborhood diameter, each a frontier-sized
    *     join, loudly failing if not converged (the [[Corpus
    *     .connectedComponents]] discipline);
    *  3. the clean ledger is recomputed ONLY for the closure (complete
    *     components ⇒ identical pairs/clusters/canonicals as a full
    *     run), and every untouched prior kept-row is carried forward
    *     unchanged — sound because a carried doc's text, edge set, and
    *     entire component are provably identical in both snapshots (any
    *     counterexample doc would be a seed or a neighbor, hence in the
    *     closure).
    *
    * Scale shape: the prior ledger is |corpus| rows of scalars (the
    * stored output of the previous run — here derived from the old
    * snapshot since the testdata has one version); the new-shingle index
    * is the same relation every dedup pass already builds (persisted
    * once, released after the closure); every per-round join is
    * frontier × index on the 64-bit shingle hash. Steady-state crawls
    * re-deliver a few percent — the recompute touches that few percent
    * times cluster fan-out, and the 100 TB full-recompute never runs.
    */
  def incrementalCleanFrom(oldDocs: DataFrame, newDocs: DataFrame,
                           maxRounds: Int = 25): DataFrame = {
    val prior = Corpus.ledger(oldDocs)
      .localCheckpoint(true) // read 3× below (seeds, mates, carry) — one compute
    val delta = diff(manifest(oldDocs), manifest(newDocs))
      .localCheckpoint(true) // delta-sized; read 2× (seeds + carry fence)
    val deltaIds = delta.select(col("doc_id"))
    // prior-cluster mates of delta docs, restricted to docs still present
    val mates = prior.join(deltaIds, "doc_id")
      .select(col("cluster_id")).distinct()
      .join(prior, "cluster_id")
      .select(col("doc_id"))
      .join(newDocs.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val seeds = delta.filter(col("status") =!= "removed").select(col("doc_id"))
      .union(mates).distinct()
    // shared-shingle closure over the new corpus (same 3-gram hash kernel
    // as the pair join, so closure components contain Jaccard components)
    val shingled = Dedup.shingleHashSets(newDocs).persist()
    // the inverted index the BFS probes every round — exploded ONCE and
    // persisted (a production pipeline stores this index; re-deriving
    // the explode per round would re-shuffle every posting each round)
    val postings = shingled
      .select(col("doc_id"), explode(col("shingles")).as("s")).persist()
    val (recomputed, closure) = try {
      val closed = {
        var visited = seeds.localCheckpoint(true)
        var frontier = visited
        var rounds = 0
        while (rounds < maxRounds && !frontier.isEmpty) {
          val fs = postings.join(frontier, "doc_id").select(col("s")).distinct()
          val neighbors = postings.join(fs, "s").select(col("doc_id")).distinct()
          val nextFrontier = neighbors.join(visited, Seq("doc_id"), "left_anti")
            .localCheckpoint(true)
          val nextVisited = visited.union(nextFrontier).localCheckpoint(true)
          // superseded round state: only the latest visited/frontier blocks
          // stay resident (the connectedComponents discipline)
          Corpus.releaseCheckpoint(visited)
          if (frontier ne visited) Corpus.releaseCheckpoint(frontier)
          frontier = nextFrontier
          visited = nextVisited
          rounds += 1
        }
        if (!frontier.isEmpty)
          throw new IllegalStateException(
            s"shingle closure did not converge in $maxRounds rounds — " +
              "a df-hot shingle is chaining the corpus; cap shingle df or raise maxRounds")
        Corpus.releaseCheckpoint(frontier) // empty; only `visited` survives
        visited
      }
      // exact recompute on the closed sub-corpus (complete components):
      // LEFT SEMI against the id-only closure, so the corpus-with-text
      // side is never shuffled — AQE broadcasts the delta-sized closure
      // and the gate stays inside the scan (at steady-state churn the
      // closure is a few percent of the corpus; an inner join here would
      // exchange every document's text just to drop most of them). The
      // sub-corpus shingle pass is the ALREADY-persisted corpus pass
      // semi-filtered — the kernel never runs twice (ledgerFrom). The
      // ledger's CC labels checkpoint eagerly inside the call, so the
      // lazy relation returned here never reads the unpersisted passes.
      val rec = Corpus.ledgerFrom(
        newDocs.join(closed, Seq("doc_id"), "left_semi"),
        shingled.join(closed, Seq("doc_id"), "left_semi"))
        .filter(col("doc_id") === col("cluster_id") && col("quality") >= 0.75)
        .select(col("doc_id"), col("n_tokens"), col("quality"), col("lang_pred"))
      (rec, closed)
    } finally {
      postings.unpersist(blocking = false)
      shingled.unpersist(blocking = false)
    }
    // carry forward every prior kept-row the delta provably cannot touch
    val carried = prior
      .filter(col("doc_id") === col("cluster_id") && col("quality") >= 0.75)
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("lang_pred"))
      .join(closure, Seq("doc_id"), "left_anti")
      .join(deltaIds, Seq("doc_id"), "left_anti")
    recomputed.unionByName(carried).orderBy(col("doc_id"))
  }

  /** The `incremental_clean` query: old snapshot derived as in
    * [[snapshotDiff]], prior state derived from it (a production run
    * reads the stored ledger instead), result must equal the full
    * `pipe_clean_corpus` recompute on `documents`.
    */
  def incrementalClean(docs: DataFrame): DataFrame =
    incrementalCleanFrom(oldSnapshot(docs), docs)

  /** The WRITE side of the incremental loop: materialize the next
    * snapshot from the stored one plus the delta — carry forward every
    * old row the delta doesn't name, drop `removed`, take
    * `added`/`changed` bodies from the new delivery. With both the
    * stored snapshot and the output bucketed by `doc_id`
    * (Sdfs.putPartitioned's layout) and the delta broadcast (it is
    * |delta|-sized by construction), both arms are map-only over their
    * scans: the next 100 TB snapshot costs |delta| of writes plus a
    * pass of carried bytes, never a shuffle of either corpus. AQE picks
    * the broadcast automatically — same plan discipline as
    * [[incrementalCleanFrom]]'s closure gate.
    */
  def applyDelta(oldSnap: DataFrame, delta: DataFrame, newBodies: DataFrame): DataFrame =
    oldSnap.join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(
        newBodies.join(delta.filter(col("status") =!= "removed").select(col("doc_id")),
          Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"))

  /** The `snapshot_apply` query: the round-trip contract `apply(old,
    * diff(old, new), new) == new` — the oracle is the documents table
    * itself, so any classification, carry, or body-selection bug
    * hash-mismatches the identity.
    */
  def snapshotApply(docs: DataFrame): DataFrame = {
    // materialize the delta ONCE — both of applyDelta's arms consume it,
    // and recomputing the manifest diff per arm would scan both
    // snapshots twice (production passes a STORED delta here anyway);
    // the checkpointed |delta|-sized leaf is what AQE then broadcasts
    val delta = snapshotDiff(docs).localCheckpoint(true)
    applyDelta(oldSnapshot(docs), delta, docs)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snapshot_diff" -> ((s, d) => snapshotDiff(Tables.documents(s, d))),
    "snapshot_apply" -> ((s, d) => snapshotApply(Tables.documents(s, d))),
    "incremental_clean" -> ((s, d) => incrementalClean(Tables.documents(s, d))))

  val oracle: Map[String, String] = Map(
    // the strongest oracle an incremental operator can have: DuckDB
    // recomputes the clean gate FROM SCRATCH on the new snapshot — the
    // exact SQL of pipe_clean_corpus, shared so the gates can't drift
    "incremental_clean" -> Corpus.oracle("pipe_clean_corpus"),
    // round-trip identity: apply(old, diff(old, new), new) == new
    "snapshot_apply" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
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
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN n.h IS DISTINCT FROM o.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |  FROM newm n FULL OUTER JOIN oldm o ON n.doc_id = o.doc_id)
        |SELECT doc_id, status FROM d WHERE status <> 'unchanged'
        |ORDER BY doc_id""".stripMargin)
}
