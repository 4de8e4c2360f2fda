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

/** SparkSessionExtensions hook: inject ACL enforcement at resolution
  * and register the engine's native expressions as SQL functions
  * (`graft_*`), so `spark.sql("SELECT graft_simhash64(text) ...")` uses
  * the same codegen'd one-pass scans as the DataFrame API — the SQL
  * half of the engine's API surface. Static int/string parameters
  * (shingle size, signature length, ...) must be literals, exactly as
  * Spark's own parameterized functions require. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.graft._

  private def intLit(e: Expression, fn: String, arg: String): Int =
    e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal")
    }

  private def strLit(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(s, StringType) if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal")
    }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")

  /** (name, usage, builder) for every registered SQL function. */
  private val functions: Seq[(String, String, Seq[Expression] => Expression)] =
    Seq(
      ("graft_xml_escape", "graft_xml_escape(str) - XML entity escaping",
        { args => arity("graft_xml_escape", args, 1); XmlEscape(args.head) }),
      ("graft_simhash64", "graft_simhash64(str) - 64-bit SimHash",
        { args => arity("graft_simhash64", args, 1); SimHash64(args.head) }),
      ("graft_token_count", "graft_token_count(str) - whitespace tokens",
        { args => arity("graft_token_count", args, 1); TokenCount(args.head) }),
      ("graft_normalize_text",
        "graft_normalize_text(str) - lowercase, collapse whitespace",
        { args => arity("graft_normalize_text", args, 1)
          NormalizeText(args.head) }),
      ("graft_repetition_stats",
        "graft_repetition_stats(str) - Gopher repetition counters",
        { args => arity("graft_repetition_stats", args, 1)
          RepetitionStats(args.head) }),
      ("graft_char_class_count",
        "graft_char_class_count(str, mode) - chars in class (literal mode)",
        { args => arity("graft_char_class_count", args, 2)
          CharClassCount(args.head,
            strLit(args(1), "graft_char_class_count", "mode")) }),
      ("graft_ngram_codes",
        "graft_ngram_codes(str, n) - packed character n-gram codes",
        { args => arity("graft_ngram_codes", args, 2)
          NgramCodes(args.head, intLit(args(1), "graft_ngram_codes", "n")) }),
      ("graft_minhash_sig",
        "graft_minhash_sig(str, k, stride) - MinHash signature",
        { args => arity("graft_minhash_sig", args, 3)
          MinHashSig(args.head, intLit(args(1), "graft_minhash_sig", "k"),
            intLit(args(2), "graft_minhash_sig", "stride")) }),
      ("graft_vector_dot", "graft_vector_dot(a, b) - float-array dot",
        { args => arity("graft_vector_dot", args, 2)
          VectorDot(args.head, args(1)) }),
      ("graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - |a ∩ b| of sorted arrays",
        { args => arity("graft_sorted_intersect_count", args, 2)
          SortedIntersectCount(args.head, args(1)) }),
      ("graft_byte_histogram",
        "graft_byte_histogram(bin, bins) - byte-value histogram",
        { args => arity("graft_byte_histogram", args, 2)
          ByteHistogram(args.head,
            intLit(args(1), "graft_byte_histogram", "bins")) }),
      ("graft_sign_lsh_bucket",
        "graft_sign_lsh_bucket(v, dim, planes) - sign-LSH bucket id",
        { args => arity("graft_sign_lsh_bucket", args, 3)
          SignLshBucket(args.head,
            intLit(args(1), "graft_sign_lsh_bucket", "dim"),
            intLit(args(2), "graft_sign_lsh_bucket", "planes")) }),
      ("graft_interleave_bits",
        "graft_interleave_bits(bits, c1, c2, ...) - Morton z-value",
        { args =>
          if (args.length < 3) throw new IllegalArgumentException(
            "graft_interleave_bits expects (bits, col, col, ...)")
          InterleaveBits(args.tail,
            intLit(args.head, "graft_interleave_bits", "bits")) }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => AclEnforcementRule)
    // generated-column read pruning (Delta's OptimizeGeneratedColumn):
    // post-hoc so Filters still see the full relation output (no column
    // pruning yet) — the added partition conjunct then rides the
    // optimizer's own pushdown into partition-directory pruning
    ext.injectPostHocResolutionRule(_ => GeneratedPartitionPruneRule)
    // graft.<alias> SQL identifiers (SELECT / time travel / INSERT);
    // the alias registry (GraftSqlTables) is JVM-global like a shared
    // catalog — registrations resolve in every co-resident session
    ext.injectResolutionRule(s => GraftSqlRule(s))
    functions.foreach { case (name, _, builder) =>
      // usage strings ride in `functions` for the Scaladoc reader; the
      // 2-arg ExpressionInfo is (className, functionName)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("org.apache.spark.sql.graft", name), builder))
    }
    // table_changes as a real TVF (delta-spark's mechanism): Spark's
    // own ResolveTableValuedFunctions serves it, so there is no
    // rule-ordering race and unknown-function errors stay loud
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.plans.GraftTableChanges", "table_changes"),
      args => GraftTableChanges.build(
        org.apache.spark.sql.SparkSession.active, args)))
    // Delta's maintenance verbs (OPTIMIZE / VACUUM / DESCRIBE
    // DETAIL|HISTORY / RESTORE) — delta-spark's parser-extension
    // mechanism; everything non-graft delegates untouched
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
