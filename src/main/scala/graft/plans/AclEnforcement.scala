package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, FileTable}
import org.apache.spark.sql.types.{BooleanType, StringType}

import graft.acl.PartitionAcl

/** Engine-level ACL enforcement as a Catalyst rule.
  *
  * The reference enforces partition ACLs outside the engine, per request
  * (/root/reference/src/main.rs:576-594: membership of the requested file
  * in the resolved allowed set). The idiomatic Spark form (SURVEY §4) is a
  * `Rule[LogicalPlan]` that rewrites every scan of a governed table into
  * `Filter(orOfAnds, scan)` — Catalyst then turns the filter into
  * partition pruning + parquet pushdown, so enforcement IS the pruning and
  * costs no extra pass. Row-level granularity subsumes the reference's
  * file-level check when filters are partition-aligned.
  *
  * Fail-closed: a non-empty filter list whose every conjunction references
  * columns the relation lacks (key typo, schema drift) resolves to
  * `Literal(false)` — zero rows — mirroring the reference, where such
  * filters can never match any file and the allowed set stays empty
  * (/root/reference/src/main.rs:399-415). Only an empty filter LIST (or
  * one containing only empty maps) means allow-all (P7,
  * /root/reference/src/main.rs:576).
  *
  * Registration: `GovernedTables.govern(pathKey, filters)`; sessions
  * built `.withExtensions(new GraftExtensions)` (or
  * spark.sql.extensions=graft.plans.GraftExtensions) enforce automatically.
  * Both V1 file scans (`LogicalRelation(HadoopFsRelation)`) and DSv2 file
  * scans (`DataSourceV2Relation(FileTable)`) are covered; non-file
  * relations (in-memory LocalRelation, JDBC, ...) are out of scope — the
  * reference only governs files behind table prefixes.
  */
object GovernedTables {
  private val reg = TrieMap.empty[String, PartitionAcl.Filters]

  /** Govern any relation whose root path contains `pathKey` as a whole
    * path segment run (separator-bounded — a key `trades` governs
    * `/data/trades/part-0` but NOT `/data/trades_backup/part-0`). */
  def govern(pathKey: String, filters: PartitionAcl.Filters): Unit =
    reg.put(pathKey.stripPrefix("/").stripSuffix("/"), filters)

  def clear(): Unit = reg.clear()

  /** Longest matching key wins (then lexicographic) — deterministic under
    * overlapping registrations like `trades` and `trades/2024`. */
  def filtersForPath(path: String): Option[PartitionAcl.Filters] = {
    val norm = "/" + path.stripPrefix("/").stripSuffix("/") + "/"
    reg.toSeq
      .filter { case (k, _) => norm.contains("/" + k + "/") }
      .sortBy { case (k, _) => (-k.length, k) }
      .headOption.map(_._2)
  }
}

object AclEnforcementRule extends Rule[LogicalPlan] {
  private val enforced = TreeNodeTag[Boolean]("graft.acl.enforced")

  /** OR-of-ANDs over the relation's columns.
    * None = allow-all (P7: no non-empty filter maps configured);
    * Some(false) = fail closed (filters exist but none is expressible
    * against this schema — e.g. key typo — so nothing is allowed). */
  private def predicate(filters: PartitionAcl.Filters,
                        output: Seq[Attribute]): Option[Expression] = {
    val nonEmpty = filters.filter(_.nonEmpty)
    if (nonEmpty.isEmpty) return None
    val conj = nonEmpty.flatMap { m =>
      val eqs = m.map { case (k, v) =>
        output.find(_.name.equalsIgnoreCase(k)).map { attr =>
          EqualTo(Cast(attr, StringType), Literal(v)): Expression
        }
      }
      // a filter on a column the table lacks can never match -> drop map
      if (eqs.exists(_.isEmpty)) None
      else Some(eqs.flatten.reduce(And(_, _)))
    }
    Some(conj.reduceOption(Or(_, _))
      .getOrElse(Literal(false, BooleanType)))
  }

  /** S5 passthrough: the transaction log is metadata and is NEVER
    * ACL-filtered, only data files are (main.rs:532-538) — without this
    * exemption a governed table's own log would fail closed (its schema
    * has no partition columns). */
  private def isDeltaLog(rootPaths: Seq[String]): Boolean =
    rootPaths.exists(p => ("/" + p + "/").contains("/_delta_log/"))

  private def enforce(plan: LogicalPlan, rootPaths: Seq[String],
                      output: Seq[Attribute]): LogicalPlan =
    if (isDeltaLog(rootPaths)) plan
    else rootPaths.flatMap(GovernedTables.filtersForPath).headOption
      .flatMap(predicate(_, output)) match {
      case Some(cond) =>
        plan.setTagValue(enforced, true)
        Filter(cond, plan)
      case None => plan
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case r: LogicalRelation
          if r.getTagValue(enforced).isEmpty &&
             r.relation.isInstanceOf[HadoopFsRelation] =>
        val paths = r.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.map(_.toString)
        enforce(r, paths, r.output)
      case r: DataSourceV2Relation
          if r.getTagValue(enforced).isEmpty &&
             r.table.isInstanceOf[FileTable] =>
        val paths = r.table.asInstanceOf[FileTable]
          .fileIndex.rootPaths.map(_.toString)
        enforce(r, paths, r.output)
    }
}

/** SparkSessionExtensions hook: inject ACL enforcement at resolution. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(_ => AclEnforcementRule)
}
