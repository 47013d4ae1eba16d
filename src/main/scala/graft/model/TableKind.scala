package graft.model

/** Table-role classification by naming convention, mirroring the reference's
  * routing of catalog tables into local / distributed / materialized-view /
  * MV-inner branches (reference `sharding_recreation.py:68-103`).
  *
  * The reference matches bare substrings (`'local' in tbl`, `'mv' in tbl`),
  * which misroutes names like `mvp` or `localization` — a quirk SURVEY.md
  * §2.1 flags for deliberate fixing. This classifier matches exact suffixes
  * (`_local`, `_mv`) and the `.inner.` marker instead.
  */
sealed trait TableKind

object TableKind {
  /** Physical per-shard data table (`X_local`). */
  case object Local extends TableKind
  /** Zero-data scatter/gather façade over locals. */
  case object Distributed extends TableKind
  /** Continuous SELECT-driven derived table (`X_mv`). */
  case object MaterializedView extends TableKind
  /** MV inner storage (`.inner.X`) — always excluded from workflows
    * (reference `sharding_recreation.py:68-69,171-172`).
    */
  case object Inner extends TableKind

  def classify(name: String): TableKind =
    if (name.contains(".inner.")) Inner
    else if (name.endsWith("_local")) Local
    else if (name.endsWith("_mv")) MaterializedView
    else Distributed

  /** The `X_mv` → `X_local` source-table convention the reference assumes
    * (`sharding_recreation.py:82`).
    */
  def mvSourceLocal(mvName: String): String =
    mvName.stripSuffix("_mv") + "_local"
}
