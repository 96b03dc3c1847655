package graft.store

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K25: incremental materialized-aggregate maintenance over the
  * snapshot store — the "don't rescan 100 TB to refresh a dashboard"
  * operator. A materialized view is a grouped aggregate of a snapshot
  * table, stored as its own snapshot table; `refresh` advances it to
  * the base table's latest version by aggregating ONLY the data files
  * the manifest DIFF added since the view's last refresh, then merging
  * the delta into the stored state (sum⊕sum, count⊕count, min⊕min,
  * max⊕max — the classic partial-aggregate merge Spark itself uses
  * map-side). Because commits are immutable files + manifests, the
  * delta is exact: appended files are precisely `manifest(v_new) \
  * manifest(v_old)`.
  *
  * Correctness contract: the incremental path is taken only when the
  * old version's file set survives into the new one (append-only
  * history). Any overwrite / CDC merge / vacuum-rewrite breaks that
  * subset relation and the refresh falls back to a FULL recompute —
  * the view is always exactly the group-by of the current base table,
  * which is precisely what the oracle checks.
  *
  * At 100 TB: an hourly-append corpus refreshes its per-group stats by
  * scanning one hour of files, not the corpus; the merge shuffles only
  * |groups| + |delta groups| rows. Reference anchor: the reference
  * recomputes corpus stats per pipeline run (LOCAL/LLM/pipeline.py
  * re-reads the full CSV); this is the engine-side incremental answer.
  */
object IncrementalView {

  /** What a refresh did: which base version the view now reflects,
    * whether it went incremental, and how many data files it scanned. */
  final case class Refresh(baseVersion: Long, incremental: Boolean, filesScanned: Int)

  // view name -> base version it reflects (the MV data lives in the
  // snapshot store under the view name; state is re-derivable, kept
  // here for the same session-scope the store tables have)
  private val reflects = TrieMap.empty[String, Long]

  /** Bring view `mvName` = SELECT keys, count(*) AS n_rows,
    * sum(c) AS sum_c... FROM base GROUP BY keys up to date with the
    * latest version of snapshot table `baseName`. */
  def refresh(spark: SparkSession, baseName: String, mvName: String,
      keys: Seq[String], sumCols: Seq[String]): Refresh = synchronized {
    val target = SnapshotStore.versions(baseName).last
    val targetFiles = SnapshotStore.files(baseName, target)

    def aggregate(df: DataFrame): DataFrame = {
      val aggs = count(lit(1)).as("n_rows") +:
        sumCols.map(c => sum(col(c)).as(s"sum_$c"))
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }

    // the reflected base version may have been vacuumed away — its
    // manifest is gone, which by contract means FULL recompute, not a
    // crash (r11 review)
    val prior = reflects.get(mvName)
      .filter(_ => SnapshotStore.versions(mvName).nonEmpty)
      .filter(v => SnapshotStore.versions(baseName).contains(v))
    val result: Refresh = prior match {
      case Some(v) if v == target =>
        Refresh(target, incremental = true, filesScanned = 0)
      case Some(v) if SnapshotStore.files(baseName, v).forall(targetFiles.contains) =>
        // append-only advance: aggregate just the added files, merge
        val added = targetFiles.diff(SnapshotStore.files(baseName, v))
        if (added.isEmpty) { Refresh(target, incremental = true, filesScanned = 0) }
        else {
          val schema = SnapshotStore.read(spark, baseName, Some(target)).schema
          val delta = aggregate(spark.read.schema(schema).parquet(added: _*))
          val merged = SnapshotStore.read(spark, mvName).unionByName(delta)
            .groupBy(keys.map(col): _*)
            .agg(sum(col("n_rows")).as("n_rows"),
              sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
          SnapshotStore.commitOverwrite(mvName, merged)
          Refresh(target, incremental = true, filesScanned = added.size)
        }
      case Some(v) if signedMergeViable(baseName, v, targetFiles) =>
        // file-level COW advance (r12): the new version REMOVED some
        // files (applyChangesCow rewrote them) but most carried over.
        // count/sum are group-wise SUBTRACTABLE, so
        //   mv_new = mv_old ⊕ agg(added files) ⊖ agg(removed files)
        // scans only the rewritten slice — removed files still exist
        // (data immutability; vacuum invalidates via the version check
        // above, and signedMergeViable re-verifies on disk). Groups
        // whose row count reaches zero drop, matching the full
        // recompute. min/max are NOT subtractable — this view family
        // is count/sum by construction.
        val oldFiles = SnapshotStore.files(baseName, v)
        val added = targetFiles.diff(oldFiles)
        val removed = oldFiles.diff(targetFiles)
        val schema = SnapshotStore.read(spark, baseName, Some(target)).schema
        def signed(files: Seq[String], sign: Int): DataFrame = {
          val a = aggregate(spark.read.schema(schema).parquet(files: _*))
          a.select(keys.map(col) ++
            ((col("n_rows") * sign).as("n_rows") +:
              sumCols.map(c => (col(s"sum_$c") * sign).as(s"sum_$c"))): _*)
        }
        val parts = Seq(SnapshotStore.read(spark, mvName)) ++
          (if (added.nonEmpty) Seq(signed(added, 1)) else Nil) ++
          Seq(signed(removed, -1))
        val merged = parts.reduce(_ unionByName _)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("n_rows")).as("n_rows"),
            sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
          .filter(col("n_rows") > 0)
        SnapshotStore.commitOverwrite(mvName, merged)
        Refresh(target, incremental = true, filesScanned = added.size + removed.size)
      case _ =>
        // first build, or history rewritten (overwrite/CDC/vacuum):
        // full recompute — correctness never depends on the fast path
        val full = aggregate(SnapshotStore.read(spark, baseName, Some(target)))
        SnapshotStore.commitOverwrite(mvName, full)
        Refresh(target, incremental = false, filesScanned = targetFiles.size)
    }
    reflects(mvName) = target
    result
  }

  /** The signed merge is taken only when it actually beats a full
    * rescan AND every removed file is still on disk (a vacuum between
    * versions could have reclaimed them — then only full is safe). */
  private def signedMergeViable(baseName: String, v: Long,
      targetFiles: Seq[String]): Boolean = {
    val oldFiles = SnapshotStore.files(baseName, v)
    val removed = oldFiles.diff(targetFiles)
    val added = targetFiles.diff(oldFiles)
    removed.nonEmpty &&
      (removed.size + added.size) < targetFiles.size &&
      removed.forall { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        scala.util.Try(p.getFileSystem(
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
          .exists(p)).getOrElse(false)
      }
  }

  /** The view's current contents. */
  def read(spark: SparkSession, mvName: String): DataFrame =
    SnapshotStore.read(spark, mvName)

  // ----- K58: incremental JOIN materialized view ---------------------

  /** What a join refresh did: the base versions the view now reflects,
    * whether it went incremental, and how many DELTA files it scanned
    * (the other side of each delta join streams through the join — at
    * scale that side rides its bucket/zone layout; the point is the
    * A_old ⋈ B_old bulk is never recomputed). */
  final case class JoinRefresh(aVersion: Long, bVersion: Long,
      incremental: Boolean, deltaFilesScanned: Int)

  private val joinReflects = TrieMap.empty[String, (Long, Long)]

  /** K58: maintain MV = A ⋈ B (inner, equi on `joinKeys`) by DELTA
    * PROPAGATION — the Blakeley view-maintenance rule every
    * incremental engine (DBToaster, Materialize, Delta MVs) builds
    * on. For append-only bases the new rows are exactly
    *
    *   Δ(A⋈B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
    *
    * (ΔA⋈ΔB lives in the first term; A_old excludes it from the
    * second — no double count), so the refresh APPENDS the delta to
    * the view without ever re-running A_old ⋈ B_old — the term that
    * is 100 TB when the deltas are one hour of files. The MV is
    * itself an append-only snapshot table, so downstream incremental
    * consumers compose. Non-key output columns must be disjoint
    * across the bases (the caller projects before committing).
    * History-rewrite on either base (overwrite/CDC/vacuum) breaks the
    * append-only subset relation and the refresh falls back to a full
    * recompute — correctness never depends on the fast path. */
  def refreshJoin(spark: SparkSession, aName: String, bName: String,
      mvName: String, joinKeys: Seq[String]): JoinRefresh = synchronized {
    val versionsA = SnapshotStore.versions(aName)
    val versionsB = SnapshotStore.versions(bName)
    val ta = versionsA.last
    val tb = versionsB.last
    val filesA = SnapshotStore.files(aName, ta)
    val filesB = SnapshotStore.files(bName, tb)
    def readFiles(name: String, t: Long, files: Seq[String]): DataFrame = {
      val schema = SnapshotStore.read(spark, name, Some(t)).schema
      spark.read.schema(schema).parquet(files: _*)
    }
    // each base's version list and reflected-version manifest is read
    // ONCE per refresh (r16 review: the subset check and the delta
    // diff each re-read them — ~6 redundant metadata round trips on a
    // loop that exists to be scheduled hourly)
    val prior = joinReflects.get(mvName)
      .filter(_ => SnapshotStore.versions(mvName).nonEmpty)
      .filter { case (va, vb) =>
        versionsA.contains(va) && versionsB.contains(vb) }
      .map { case (va, vb) =>
        (va, vb, SnapshotStore.files(aName, va), SnapshotStore.files(bName, vb)) }
      .filter { case (_, _, oldA, oldB) =>
        oldA.forall(filesA.contains) && oldB.forall(filesB.contains) }
    val result = prior match {
      case Some((va, vb, oldA, oldB)) =>
        val addedA = filesA.diff(oldA)
        val addedB = filesB.diff(oldB)
        if (addedA.isEmpty && addedB.isEmpty)
          JoinRefresh(ta, tb, incremental = true, 0)
        else {
          val parts =
            (if (addedA.nonEmpty)
              Seq(readFiles(aName, ta, addedA)
                .join(SnapshotStore.read(spark, bName, Some(tb)), joinKeys))
            else Nil) ++
              (if (addedB.nonEmpty)
                Seq(SnapshotStore.read(spark, aName, Some(va))
                  .join(readFiles(bName, tb, addedB), joinKeys))
              else Nil)
          SnapshotStore.commitAppend(mvName, parts.reduce(_ unionByName _))
          JoinRefresh(ta, tb, incremental = true, addedA.size + addedB.size)
        }
      case None =>
        val full = SnapshotStore.read(spark, aName, Some(ta))
          .join(SnapshotStore.read(spark, bName, Some(tb)), joinKeys)
        SnapshotStore.commitOverwrite(mvName, full)
        JoinRefresh(ta, tb, incremental = false, filesA.size + filesB.size)
    }
    joinReflects(mvName) = (ta, tb)
    result
  }
}
