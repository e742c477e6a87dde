package graft.util

/** Shared growth-detection over file-listing signatures (sorted
  * "path:len:mtime" lines, as [[graft.plans.AggRewriteRule.fileSig]]
  * emits them) — the single owner of the subtle entry parsing both
  * incremental-refresh paths (the hourly rollup and the postings index)
  * previously duplicated: a fix to the format or the parser now lands
  * exactly once.
  */
object ListingDiff {

  /** None when any previous entry vanished or changed (overwrite,
    * compaction, rewrite — stored cells may describe vanished rows, the
    * caller must full-rebuild); otherwise Some(paths of the NEW files),
    * the delta an append-only refresh may aggregate.
    */
  def deltaFiles(prevSig: String, curSig: String): Option[Seq[String]] = {
    val prev = prevSig.split('\n').toSet
    val cur = curSig.split('\n').toSeq
    if ((prev -- cur.toSet).nonEmpty) None
    else Some(cur.filterNot(prev).map(pathOf))
  }

  /** Entry format "path:len:mtime" — the path itself may contain ':'
    * (file: URIs), so strip the LAST two :-fields.
    */
  def pathOf(entry: String): String =
    entry.substring(0, entry.lastIndexOf(':', entry.lastIndexOf(':') - 1))
}
