package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Manifest-versioned layout for the persisted index stores — the
  * atomic-publish device of the table formats (Delta/Iceberg/Hive ACID),
  * reduced to what a parquet index needs. The reference gets index
  * atomicity for free from Elasticsearch's per-document versioning
  * (elasticsearch/elasticsearch.go bulk `create`); a file-based store
  * has to provide its own, and the delete-then-rename swap the flat
  * compactors use leaves a window where the live directory is absent
  * (documented in [[graft.operators.DedupOps.compactFlatTable]]).
  * This closes that window:
  *
  * Layout:
  * {{{
  *   <root>/MANIFEST            one line: the current version number
  *   <root>/versions/v<N>/...   immutable-after-publish table files
  * }}}
  *
  * Writers build a COMPLETE new version directory, then swap the
  * MANIFEST pointer with `FileContext.rename(OVERWRITE)` — a single
  * atomic metadata op on HDFS-like filesystems. So:
  *  - a crash anywhere before the swap leaves the old version live and
  *    the half-written one invisible (no recovery dance);
  *  - readers resolve the pointer once per query plan and scan files
  *    that are never rewritten in place — a reader holding v3's file
  *    list is unaffected by v4's publish;
  *  - old versions retire only via [[prune]], giving in-flight scans a
  *    grace window (the table-format "vacuum" discipline).
  *
  * In-place appends into the CURRENT version directory remain legal for
  * stores whose semantics are append-natural (the BM25 posting table
  * derives df/stats from the rows at search time, so a partially
  * visible append is just a smaller index, never an inconsistent one).
  * Rewrites — compaction, re-clustering, schema moves — must go through
  * [[publish]].
  */
object IndexManifest {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(root: String) = new Path(s"$root/MANIFEST")

  def versionDir(root: String, v: Int): String = s"$root/versions/v$v"

  /** The published version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val mp = manifest(root)
    val f = fs(spark, mp)
    if (!f.exists(mp)) None
    else {
      val in = f.open(mp)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  /** Directory of the current version — the ONLY path readers scan. */
  def resolve(spark: SparkSession, root: String): String =
    versionDir(root,
      currentVersion(spark, root).getOrElse(throw new java.io.FileNotFoundException(
        s"IndexManifest: no MANIFEST under $root — index never published")))

  /** Write a new version via `write` (handed the new version directory),
    * then atomically swap the pointer to it. Returns the new version.
    * If `write` throws, the manifest is untouched and the partial
    * version directory is invisible to every reader.
    */
  def publish(spark: SparkSession, root: String)(
      write: String => Unit): Int = {
    val next = currentVersion(spark, root).getOrElse(0) + 1
    // a crashed writer may have left an unpublished (invisible) v<next>
    // behind; it was never current, so clearing it is safe
    val nd = new Path(versionDir(root, next))
    val f = fs(spark, nd)
    if (f.exists(nd) && !f.delete(nd, true))
      throw new java.io.IOException(
        s"IndexManifest.publish: could not clear orphaned $nd")
    write(versionDir(root, next))
    swapPointer(spark, root, next)
    next
  }

  /** Publish a DELTA version extending the current chain — the
    * append-a-batch analogue of [[publish]], for stores whose append
    * spans MULTIPLE tables that must land together (the minhash store's
    * sets + bands: an in-place two-table append could crash between the
    * writes and strand set rows without candidate keys). The new
    * version directory holds ONLY the batch's rows plus a PARENT file
    * naming the version it extends; [[resolveChain]] readers union the
    * chain into one logical store. The pointer swap remains the single
    * commit: a crash anywhere before it leaves the old chain live and
    * the half-written delta invisible, and retrying re-runs `write`
    * into a cleared directory — exactly-once rows, convergent retries
    * (the snapshot-chain device of the table formats, reduced to a
    * parent pointer). Per-append cost is O(batch), never O(store).
    */
  def publishDelta(spark: SparkSession, root: String)(
      write: String => Unit): Int = {
    val parent = currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(
        s"IndexManifest: no MANIFEST under $root — publish a base first"))
    publish(spark, root) { vdir =>
      val pp = new Path(s"$vdir/PARENT")
      val f = fs(spark, pp)
      val out = f.create(pp, true)
      try out.write(parent.toString.getBytes("UTF-8")) finally out.close()
      write(vdir)
    }
  }

  private def parentOf(spark: SparkSession, root: String,
      v: Int): Option[Int] = {
    val pp = new Path(s"${versionDir(root, v)}/PARENT")
    val f = fs(spark, pp)
    if (!f.exists(pp)) None
    else {
      val in = f.open(pp)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  /** Version numbers of the live chain, newest first: the current
    * version and every ancestor reachable through PARENT files (a full
    * [[publish]] — rebuild or compaction — has no PARENT and roots the
    * chain).
    */
  def chainVersions(spark: SparkSession, root: String): Seq[Int] = {
    val b = Seq.newBuilder[Int]
    var v = Some(currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(
        s"IndexManifest: no MANIFEST under $root — index never published")))
      : Option[Int]
    while (v.isDefined) { b += v.get; v = parentOf(spark, root, v.get) }
    b.result()
  }

  /** Directories of the live chain, newest first — readers of
    * delta-append stores scan the UNION of these (pass all of them to
    * one `spark.read.parquet(dirs: _*)` so the scan stays a single
    * multi-path FileScan, not a union of plans).
    */
  def resolveChain(spark: SparkSession, root: String): Seq[String] =
    chainVersions(spark, root).map(versionDir(root, _))

  /** The atomic pointer swap: write MANIFEST.tmp, rename OVERWRITE onto
    * MANIFEST. `FileContext.rename(OVERWRITE)` is the Hadoop API whose
    * contract IS atomic replace on HDFS (plain `FileSystem.rename`
    * refuses existing destinations, which is why the flat compactors
    * had to delete first).
    */
  private def swapPointer(spark: SparkSession, root: String,
      v: Int): Unit = {
    val mp = manifest(root)
    val tmp = new Path(s"$root/MANIFEST.tmp")
    val f = fs(spark, mp)
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(mp.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, mp, Options.Rename.OVERWRITE)
  }

  /** Retire dead version directories: anything not on the live PARENT
    * chain, except the newest `keep - 1` of them AND every PARENT-chain
    * ancestor of a retained dead version (the grace window for
    * in-flight readers still scanning a superseded chain — a reader
    * that resolved the old chain needs the whole chain, base included,
    * not just its tip, so dead versions are retained as COMPLETE
    * chains). Chain members — the current version and every ancestor
    * it references — are NEVER deleted, however old: a delta store's
    * base must outlive all its deltas. Run after [[publish]]. Returns
    * the versions deleted.
    */
  def prune(spark: SparkSession, root: String, keep: Int = 2): Seq[Int] = {
    require(keep >= 1, s"prune must keep the current version (keep=$keep)")
    val cur = currentVersion(spark, root).getOrElse(return Seq.empty)
    val live = chainVersions(spark, root).toSet
    val vdir = new Path(s"$root/versions")
    val f = fs(spark, vdir)
    if (!f.exists(vdir)) return Seq.empty
    val dead = f.listStatus(vdir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.drop(1).toInt }
      .filter(_ <= cur) // a concurrent writer's in-flight v(cur+1) is not ours to touch
      .filterNot(live)
      .sorted
    // the newest keep-1 dead versions survive as whole chains: walk
    // PARENT pointers from each retained tip so a superseded delta
    // chain keeps its base and middle deltas, not just its tip (an
    // in-flight resolveChain reader scans all of them)
    val retained = scala.collection.mutable.Set.empty[Int]
    def walk(v: Int): Unit =
      if (retained.add(v)) parentOf(spark, root, v).foreach(walk)
    dead.takeRight(keep - 1).foreach(walk)
    val retire = dead.filterNot(retained)
    retire.foreach { v =>
      if (!f.delete(new Path(versionDir(root, v)), true))
        throw new java.io.IOException(
          s"IndexManifest.prune: could not delete ${versionDir(root, v)}")
    }
    retire
  }
}
