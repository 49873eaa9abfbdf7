package graft.lake

import org.apache.hadoop.fs.Path

/**
 * Writable branches: full write-audit-publish over one table, the
 * engine-level restatement of the reference's staged-release discipline
 * (its pipelines publish to live stores only after the batch's own
 * validation pass; here the staging area is a first-class table ref).
 *
 * A branch is a SHALLOW fork: `create` copies only the metadata directory
 * to `root/branches/<name>` — manifest entries carry absolute file paths,
 * so the fork reads the parent's data files byte-for-byte without copying
 * any, and every engine surface (replay, merge, DML, constraints, doctor,
 * compaction, SQL) works on the branch because it IS a LakeTable. New
 * commits write their data under the branch's own root, invisible to main.
 *
 * Safety contracts:
 *  - the fork point is pinned by a retention-proof tag `branch-<name>` on
 *    main, so main's `expire` can never delete files the branch still
 *    reads; publish/discard release the pin.
 *  - `publish` is FAST-FORWARD ONLY: it refuses when main moved since the
 *    fork (the audit inspected a state main no longer has — re-branch and
 *    replay), and re-checks after the commit so a lost race can never be
 *    reported as success. The publish itself is ONE atomic main commit
 *    adopting the branch head's manifests/schema/epoch/lineage — main's
 *    feed resumes exactly where the branch's ingest stopped.
 *  - `discard` closes the branch and deletes only the files this branch
 *    generation wrote (head's files minus the fork base's, under the
 *    branch's own data dir) — never anything a previous publish made live.
 *  - closed branches keep their meta as `meta-closed-*` for audit; the
 *    branch NAME is immediately reusable (data file dirs are uuid'd, so
 *    generations never collide).
 */
object Branch {

  private final val mapper = Manifests.mapper

  final case class BranchInfo(name: String, baseSnapshotId: Long,
                              baseEpoch: Long)

  private def branchRoot(main: LakeTable, name: String): String =
    s"${main.root}/branches/$name"
  private def basePath(broot: String): String = s"$broot/base.json"

  def tagName(name: String): String = s"branch-$name"

  /** Fork `main` at its current snapshot into a writable branch.
    *
    * Race safety (round-3 advice): the meta-dir copy is not atomic against
    * concurrent main commits — a commit landing mid-copy would leave the
    * branch's head NEWER than the tag-pinned base (so main's expire could
    * reclaim manifests the branch head references, and discard's baseFiles
    * set would come from the wrong snapshot). After the copy, the head is
    * re-verified against the pinned base: if main moved, the copy is torn
    * down and the fork retried from the NEW head (fresh tag), up to
    * `attempts` times. */
  def create(main: LakeTable, name: String, attempts: Int = 5): BranchInfo = {
    require(name.nonEmpty && name.forall(c =>
      Character.isLetterOrDigit(c) || c == '-' || c == '_'),
      s"invalid branch name: $name")
    val broot = branchRoot(main, name)
    var left = attempts
    while (true) {
      val cur = main.currentSnapshot.getOrElse(
        throw new IllegalStateException(
          s"${main.root} has no snapshot — nothing to branch"))
      if (LakeIO.exists(s"$broot/meta"))
        throw new IllegalStateException(
          s"branch $name already exists (publish or discard it first)")
      // pin the fork point on main BEFORE the branch becomes readable: from
      // here main's expire keeps the base snapshot and its files
      main.tag(tagName(name), cur.snapshotId)
      val fs = LakeIO.fs(main.root)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new Path(s"${main.root}/meta"),
        fs, new Path(s"$broot/meta"),
        false /* deleteSource */, LakeIO.conf)
      // the branch keeps its own tag namespace: drop inherited tags so a
      // branch-side expire can't be blocked by (or later release) main's pins
      LakeIO.delete(s"$broot/meta/tags")
      // monotone snapshot ids make this check sufficient: head == cur at
      // verify time means no commit completed during the copy, so the copy
      // holds nothing newer than the pinned base
      if (main.currentSnapshot.exists(_.snapshotId == cur.snapshotId)) {
        val info = BranchInfo(name, cur.snapshotId, cur.epoch)
        LakeIO.writeBytes(basePath(broot), mapper.writeValueAsBytes(info))
        return info
      }
      // main moved mid-copy: tear the stale fork down and retry from the
      // new head (the stale copy may contain a snapshot newer than the pin)
      LakeIO.delete(broot)
      main.untag(tagName(name))
      left -= 1
      if (left <= 0)
        throw new CommitConflictException(
          s"branch $name lost $attempts fork races against concurrent " +
          "main commits — quiesce ingest or retry")
    }
    throw new IllegalStateException("unreachable")
  }

  /** The branch as a table — every engine surface works on it. */
  def table(main: LakeTable, name: String): LakeTable = {
    val broot = branchRoot(main, name)
    require(LakeIO.exists(s"$broot/meta"), s"no live branch $name")
    new LakeTable(main.spark, broot)
  }

  def info(main: LakeTable, name: String): BranchInfo =
    mapper.readValue(LakeIO.readBytes(basePath(branchRoot(main, name))),
      classOf[BranchInfo])

  /** Live branches of `main`. */
  def list(main: LakeTable): Seq[BranchInfo] =
    if (!LakeIO.exists(s"${main.root}/branches")) Nil
    else LakeIO.list(s"${main.root}/branches")
      .collect { case (n, p, true) if LakeIO.exists(s"$p/meta") => n }
      .sorted.map(n => info(main, n))

  /** Fast-forward main to the branch head as one atomic commit, then close
    * the branch. Returns the published main snapshot. */
  def publish(main: LakeTable, name: String): Snapshot = {
    val broot = branchRoot(main, name)
    val base = info(main, name)
    val branch = table(main, name)
    val mainCur = main.currentSnapshot.get
    if (mainCur.snapshotId != base.baseSnapshotId)
      throw new CommitConflictException(
        s"main moved since the fork (snapshot ${base.baseSnapshotId} -> " +
        s"${mainCur.snapshotId}): the audit inspected a stale state — " +
        "re-branch from the current head and replay")
    val head = branch.currentSnapshot.get
    val published =
      if (head.snapshotId == base.baseSnapshotId) mainCur // nothing staged
      else {
        // manifests the branch wrote live under ITS meta dir, which close()
        // renames away — copy them into main's meta and point the published
        // snapshot there, so main never references the closed branch meta
        val branchMeta = LakeIO.qualify(s"$broot/meta") + "/"
        val mainManifests = s"${main.root}/meta/manifests"
        LakeIO.mkdirs(mainManifests)
        val rewritten = head.manifests.map { r =>
          if (!LakeIO.qualify(r.path).startsWith(branchMeta)) r // carried
          else {
            val dst =
              s"$mainManifests/${r.path.substring(r.path.lastIndexOf('/') + 1)}"
            LakeIO.copy(r.path, dst)
            r.copy(path = dst)
          }
        }
        val snap = head.copy(
          snapshotId = mainCur.snapshotId + 1,
          parentId = mainCur.snapshotId,
          manifests = rewritten,
          metrics = head.metrics ++ Map(
            "branchPublish" -> 1.0,
            "branchHeadSnapshot" -> head.snapshotId.toDouble))
        val out = main.commit(snap,
          maintenance = head.epoch == mainCur.epoch)
        // commit's non-maintenance path FENCES (returns cur) instead of
        // throwing when a racing source commit outran the head's epoch —
        // surface that as the conflict it is
        if (out.snapshotId != snap.snapshotId)
          throw new CommitConflictException(
            s"main moved during publish (now snapshot ${out.snapshotId}, " +
            s"epoch ${out.epoch}) — re-branch and replay")
        out
      }
    // constraints audited on the branch travel with the publish
    syncChecks(branch, main)
    close(main, name, head.snapshotId)
    main.untag(tagName(name))
    published
  }

  /** Abandon the branch: close its meta and delete the files THIS
    * generation wrote (head minus fork base, under the branch's own data
    * dir). Returns the number of data files deleted. */
  def discard(main: LakeTable, name: String): Int = {
    val broot = branchRoot(main, name)
    val base = info(main, name)
    val branch = table(main, name)
    val head = branch.currentSnapshot.get
    val dataPrefix = LakeIO.qualify(s"$broot/data")
    // files the fork base already references are MAIN-live even when they
    // sit under this branch dir (a previous generation published them) —
    // the base is tag-pinned until discard completes, so it is loadable
    val baseFiles: Set[String] =
      main.snapshots.find(_.snapshotId == base.baseSnapshotId)
        .map(_.files.map(f => LakeIO.qualify(f.path)).toSet)
        .getOrElse(Set.empty)
    // only this generation's commits (snapshotId > fork base): pre-fork
    // snapshot copies reference main's manifests, which main's own expiry
    // may have legitimately reclaimed — and can't hold branch files anyway.
    // Every retained generation snapshot, not just the head: a branch-side
    // rollback/compaction leaves generation files in older snapshots only.
    val mine = branch.snapshots
      .filter(_.snapshotId > base.baseSnapshotId)
      .flatMap(_.files.map(_.path)).distinct
      .map(LakeIO.qualify)
      .filter(p => p.startsWith(dataPrefix) && !baseFiles.contains(p))
    mine.foreach(LakeIO.delete)
    close(main, name, head.snapshotId)
    main.untag(tagName(name))
    mine.size
  }

  private def close(main: LakeTable, name: String, headId: Long): Unit = {
    val broot = branchRoot(main, name)
    val fs = LakeIO.fs(broot)
    val closed = s"$broot/meta-closed-$headId-" +
      java.util.UUID.randomUUID().toString.take(8)
    if (!fs.rename(new Path(s"$broot/meta"), new Path(closed)))
      throw new IllegalStateException(
        s"could not close branch $name (concurrent publish/discard?)")
    LakeIO.delete(basePath(broot))
  }

  /** The audited state wins wholesale: constraints added on the branch
    * appear on main, constraints dropped there disappear. */
  private def syncChecks(from: LakeTable, to: LakeTable): Unit = {
    val src = s"${from.root}/meta/checks"
    val dst = s"${to.root}/meta/checks"
    if (LakeIO.exists(dst)) LakeIO.delete(dst)
    if (!LakeIO.exists(src)) return
    LakeIO.mkdirs(dst)
    LakeIO.list(src).filter(!_._3).foreach { case (n, p, _) =>
      LakeIO.copy(p, s"$dst/$n")
    }
  }
}
