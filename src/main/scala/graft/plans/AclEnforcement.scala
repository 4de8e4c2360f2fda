package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Cast, EqualTo, Expression, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType

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
  * Registration: `GovernedTables.govern(pathSubstring, filters)`; sessions
  * built `.withExtensions(new GraftExtensions)` (or
  * spark.sql.extensions=graft.plans.GraftExtensions) enforce automatically.
  */
object GovernedTables {
  private val reg = TrieMap.empty[String, PartitionAcl.Filters]

  /** Govern any relation whose root path contains `pathKey`. */
  def govern(pathKey: String, filters: PartitionAcl.Filters): Unit =
    reg.put(pathKey, filters)

  def clear(): Unit = reg.clear()

  def filtersForPath(path: String): Option[PartitionAcl.Filters] =
    reg.collectFirst { case (k, f) if path.contains(k) => f }
}

object AclEnforcementRule extends Rule[LogicalPlan] {
  private val enforced = TreeNodeTag[Boolean]("graft.acl.enforced")

  private def predicate(filters: PartitionAcl.Filters,
                        plan: LogicalRelation): Option[Expression] = {
    val conj = filters.filter(_.nonEmpty).flatMap { m =>
      val eqs = m.map { case (k, v) =>
        plan.output.find(_.name.equalsIgnoreCase(k)).map { attr =>
          EqualTo(Cast(attr, StringType), Literal(v)): Expression
        }
      }
      // a filter on a column the table lacks can never match -> drop map
      if (eqs.exists(_.isEmpty)) None
      else Some(eqs.flatten.reduce(And(_, _)))
    }
    conj.reduceOption(Or(_, _))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case r: LogicalRelation
          if r.getTagValue(enforced).isEmpty &&
             r.relation.isInstanceOf[HadoopFsRelation] =>
        val paths = r.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.map(_.toString)
        GovernedTables.filtersForPath(paths.mkString(","))
          .flatMap(predicate(_, r)) match {
          case Some(cond) =>
            r.setTagValue(enforced, true)
            Filter(cond, r)
          case None => r
        }
    }
}

/** SparkSessionExtensions hook: inject ACL enforcement at resolution. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(_ => AclEnforcementRule)
}
