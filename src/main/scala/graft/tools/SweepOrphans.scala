package graft.tools

import org.apache.hadoop.fs.Path

/** One-time upgrade sweep for artifacts orphaned by SEMANTIC RENAMES
  * (r14 advice): when a staged table or fixture dir is renamed to encode
  * its constants, the OLD name's data is never read again — crash
  * recovery probes only the new name — but nothing removed it, so an
  * upgraded checkout carries it on disk and in the metastore forever.
  * This tool removes exactly the retired patterns:
  *
  *  - warehouse tables/dirs `simhash_fp_b<digits>…` — renamed
  *    `simhash_fp_w<bits>_b<buckets>…` in r14 (both constants in the
  *    name; [[graft.ops.Dedup.simhashFpTable]]). Matched as a catalog
  *    entry AND as an unregistered warehouse dir (warehouse data
  *    outlives the catalog — [[graft.util.Staged]]'s own premise).
  *  - `target/tmp/late_…` four-file streaming fixture dirs — superseded
  *    by the three-micro-batch `late3_…` layout
  *    ([[graft.streaming.StreamingQueries]]).
  *  - `target/tmp/jsonl__tmp_…` staged JSONL ingest dirs whose ephemeral
  *    `/tmp/…` source inputs no longer exist: spec runs ingest from
  *    random java.io.tmpdir paths ([[graft.ops.Ingestion]] keys the
  *    stage dir by input path), so each `sbt test` leaves one dir keyed
  *    by a path that can never recur.
  *
  * Idempotent and safe to re-run; prints one line per removal. Current
  * names (`simhash_fp_w…`, `late3_…`, fixture-dir jsonl stages) are
  * never touched.
  */
object SweepOrphans {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.start()
    val fs = graft.util.Staged.fsOf(spark)

    // retired simhash tables: catalog entries first (DROP leaves external
    // files behind, so sweep the location too), then unregistered dirs
    val retired = "^simhash_fp_b\\d.*".r
    spark.catalog.listTables().collect()
      .map(_.name)
      .filter(n => retired.matches(n))
      .foreach { n =>
        spark.sql(s"DROP TABLE IF EXISTS `$n`")
        graft.util.Staged.sweep(spark, n)
        println(s"dropped retired table $n")
      }
    val wh = graft.util.Staged.warehousePath(spark)
    if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
      val n = st.getPath.getName
      if (retired.matches(n)) {
        fs.delete(st.getPath, true)
        println(s"deleted orphaned warehouse dir $n")
      }
    }

    val tmp = new java.io.File("target/tmp")
    val kids = Option(tmp.listFiles()).getOrElse(Array.empty)
    // retired four-file late fixtures (late3_ is the live layout)
    kids.filter(f => f.getName.startsWith("late_")).foreach { f =>
      deleteRecursively(f)
      println(s"deleted retired fixture dir target/tmp/${f.getName}")
    }
    // jsonl stages keyed by vanished tmpdir inputs (spec residue). The
    // sanitization ([[graft.ops.Ingestion.stageJsonl]]'s `safe`) is lossy
    // to INVERT but deterministic FORWARD — so compute the live key set
    // from what actually exists under java.io.tmpdir (the dir the specs
    // key by — NOT a hardcoded /tmp; r15 advice) and delete any
    // tmpdir-keyed stage dir not in it. The walk is RECURSIVE (bounded):
    // a stage keyed by a still-existing NESTED input like
    // /tmp/spec-x/docs must land in the live set, or this tool would
    // spuriously retire it (bounded consequence — stageJsonl rebuilds —
    // but a deletion tool should not guess). Fixture-dir stages
    // (jsonl__root_…) never match the tmpdir-derived prefix and are
    // untouched.
    def keyOf(path: String) = "jsonl_" + path.replaceAll("[^A-Za-z0-9.]", "_")
    // Keys must match the SPELLING the specs keyed by: stageJsonl derives
    // its stage name from the literal input-path string, which comes from
    // the raw java.io.tmpdir property — canonicalizing here alone would
    // diverge whenever tmpdir is a symlink (e.g. /tmp -> /private/tmp):
    // no stage would match the canonical prefix and stale stages would
    // never be collected (r16 advice). So derive BOTH spellings — the
    // literal absolute path and the canonical one — walk each root that
    // exists (children inherit their root's spelling), and match stage
    // names against either prefix.
    val rawTmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      .getAbsoluteFile
    val tmpRoots = Seq(rawTmp, rawTmp.getCanonicalFile)
      .distinctBy(_.getPath)
    val stagePrefixes = tmpRoots.map(d => keyOf(d.getPath) + "_")
    val live = scala.collection.mutable.HashSet.empty[String]
    def walk(f: java.io.File, depth: Int): Unit = {
      live += keyOf(f.getPath)
      // never follow symlinks (a link cycle under tmpdir must not hang
      // the sweep), bound the depth — spec inputs sit 1-2 levels deep
      if (depth > 0 && f.isDirectory &&
          !java.nio.file.Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).getOrElse(Array.empty).foreach(walk(_, depth - 1))
    }
    tmpRoots.foreach(root =>
      Option(root.listFiles()).getOrElse(Array.empty).foreach(walk(_, 3)))
    kids.foreach { f =>
      if (stagePrefixes.exists(f.getName.startsWith) && !live.contains(f.getName)) {
        deleteRecursively(f)
        println(s"deleted stale jsonl stage target/tmp/${f.getName}")
      }
    }
    spark.stop()
  }

  /** Deletes a tree WITHOUT following directory symlinks (r15 advice): a
    * link planted inside a swept dir is deleted as the link itself —
    * recursing into it would delete the TARGET's contents, the classic
    * deletion-tool hazard.
    */
  private def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
