package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** `require_partition_filter` (reference `bigquery_options`,
  * manifest.json:1 @15210): a declared guard on a partitioned relation
  * that REFUSES any query reading it without a partition predicate. At
  * 100 TB this is the difference between a pruned scan and an accidental
  * cluster-wide full-table read — the guard turns the latter into a loud
  * plan-time error naming the partition column.
  *
  * Enforcement is PLAN-level, after Catalyst pushdown: the consumer's
  * physical plan either carries partition filters on the guarded scan or
  * it does not. That is stronger than BigQuery's textual WHERE check — a
  * predicate on a non-partition column would not prune and is correctly
  * rejected, while a predicate that pushes down through joins, CTEs, and
  * projections onto the scan is correctly accepted. Checking costs
  * planning only (no job runs): the pre-AQE `sparkPlan` is inspected,
  * where FileSourceStrategy has already split pushed predicates into
  * `partitionFilters` vs `dataFilters`.
  */
object PartitionFilterGuard {

  /** One guarded relation: its on-disk path prefix + display name. */
  final case class Guard(pathPrefix: String, name: String)

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Throw unless every scan of a guarded relation in `df`'s plan is
    * partition-pruned. Scans are matched by root-path prefix (manifest
    * layouts list version dirs UNDER the relation path).
    */
  def assertPruned(df: DataFrame, guards: Seq[Guard]): Unit = {
    if (guards.isEmpty) return
    val normed = guards.map(g => g.copy(pathPrefix = norm(g.pathPrefix)))
    // attributes the USER actually filtered on, read from the ANALYZED
    // plan — the one plan that carries only author-written predicates
    // (constraint inference, which plants `isnotnull(partcol)` under any
    // join on the partition column, runs later, in the optimizer). An
    // explicit `WHERE partcol IS NOT NULL` is how BigQuery's own
    // require_partition_filter is deliberately satisfied for a read-all-
    // materialized-partitions query, so it must pass here too — while a
    // mere join must not. Matching is by exprId, not name: a filter on a
    // SAME-NAMED column of a different joined relation must not satisfy
    // THIS relation's guard (BigQuery requires the predicate on the
    // partitioned table itself). Projection/CTE aliases of the partition
    // column are chased back to their base attributes first, so
    // `WITH c AS (SELECT pcol AS p FROM t) SELECT * FROM c WHERE p IS
    // NOT NULL` still counts as a user filter on t.pcol.
    val analyzed = df.queryExecution.analyzed
    val aliasBase: Map[Long, Set[Long]] = analyzed.collect { case node =>
      node.expressions.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Alias =>
          a.exprId.id -> a.child.references.map(_.exprId.id).toSet
      })
    }.flatten.toMap
    def toBase(ids: Set[Long]): Set[Long] = {
      var cur = ids
      var hops = 0
      var done = false
      while (!done && hops < 16) { // alias chains are shallow; cap is a
        val next =                 // guard against any pathological cycle
          cur.flatMap(id => aliasBase.getOrElse(id, Set.empty[Long]) + id)
        if (next == cur) done = true else { cur = next; hops += 1 }
      }
      cur
    }
    val userFiltered: Set[Long] = toBase(analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.exprId.id).toSet
    }.flatten.toSet)
    // exprId matching alone would falsely refuse a predicate written once
    // inside a CTE or temp view the query references TWICE: CTE inlining
    // re-instances the second copy's attributes with fresh exprIds, so
    // that copy's scan carries an IsNotNull no analyzed Filter's exprId
    // can claim. Complement: per guarded path, the column NAMES filtered
    // by Filters whose OWN subtree scans that path AND ONLY that path —
    // a filter sitting above a join contains the guarded scan too, so
    // without the only-this-path restriction `join(dim).filter(
    // dim("pcol").isNotNull)` would re-admit a same-named column of the
    // OTHER table, exactly the false-accept the exprId rule closes. The
    // CTE-re-instancing case this complement exists for is unaffected:
    // the re-instanced Filter lives INSIDE the CTE body, below any join,
    // so its subtree scans the guarded relation alone.
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    // every LEAF under the filter must be a file scan of the guarded
    // path — checking only the file scans would vacuously admit a
    // post-join filter when the other join side is an in-memory or
    // non-file relation (no path to fail the forall)
    def leavesOnlyGuarded(
        p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        prefix: String): Boolean = {
      val leaves = p.collectLeaves()
      leaves.nonEmpty && leaves.forall {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            val roots = fs.location.rootPaths.toSeq.map(x => norm(x.toString))
            roots.nonEmpty && roots.forall(r =>
              r == prefix || r.startsWith(prefix + "/"))
          case _ => false
        }
        case _ => false
      }
    }
    val filterNamesByGuard: Map[String, Set[String]] = normed.map { g =>
      g.pathPrefix -> analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if leavesOnlyGuarded(f.child, g.pathPrefix) =>
          f.condition.references.map(_.name.toLowerCase).toSet
      }.flatten.toSet
    }.toMap
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    scans.foreach { scan =>
      val roots = scan.relation.location.rootPaths.map(p => norm(p.toString))
      normed.find(g => roots.exists(r =>
          r == g.pathPrefix || r.startsWith(g.pathPrefix + "/"))).foreach { g =>
        val pcols = scan.relation.partitionSchema.fieldNames
        if (pcols.isEmpty) throw new IllegalStateException(
          s"${g.name} declares require_partition_filter but is not " +
            "partitioned — add partition_by, or drop the guard")
        // a JOIN-INFERRED bare `isnotnull(partcol)` is NOT a predicate:
        // Catalyst's constraint inference plants it in partitionFilters
        // from any join on the partition column, and it admits every
        // non-null partition — a query satisfying the guard with only it
        // would still scan the world. Count selective partition
        // predicates (comparisons, IN-lists, DPP subqueries) always; a
        // bare IsNotNull counts only when the USER wrote a filter
        // touching that partition column (analyzed-plan check above) —
        // BigQuery accepts an explicit `WHERE partcol IS NOT NULL`.
        val gNames = filterNamesByGuard.getOrElse(g.pathPrefix, Set.empty)
        val selective = scan.partitionFilters.filterNot {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(
            a: org.apache.spark.sql.catalyst.expressions.Attribute) =>
            !(userFiltered.contains(a.exprId.id) ||
              gNames.contains(a.name.toLowerCase))
          case _ => false
        }
        if (selective.isEmpty) throw new IllegalStateException(
          s"${g.name} declares require_partition_filter: this query reads " +
            s"it without a predicate on partition column(s) " +
            s"[${pcols.mkString(", ")}] — an unpredicated read would scan " +
            "every partition. Add a WHERE on the partition column (it may " +
            "sit above joins/CTEs; only pushdown to the scan counts), or " +
            "run with --full-refresh for a deliberate full rebuild.")
      }
    }
  }
}
