package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Generated-column partition-filter derivation — Delta's
  * `OptimizeGeneratedColumn` restated for this engine. A table
  * partitioned by a GENERATED column (`day DATE GENERATED ALWAYS AS
  * (CAST(ts AS DATE))`, the canonical Delta layout for
  * timestamp-keyed 100 TB tables) is only prunable when the QUERY
  * filters on the partition column — but real queries filter on the
  * BASE column (`WHERE ts >= '...'`). Without derivation every such
  * query, and every DML's blast-radius discovery, scans the whole
  * table. This module recognizes the derivable generation-expression
  * shapes and maps a bound on the base column to an IMPLIED bound on
  * the generated partition column:
  *
  *   - monotonic non-decreasing g (CAST(ts AS DATE) / to_date / year /
  *     date_trunc / trunc / whitelisted date_format / substring-prefix):
  *     `c = v  ⇒ p = g(v)`, `c >/» v ⇒ p >= g(v)`, `c </« v ⇒ p <= g(v)`
  *   - any recognized g (month/day/hour included): equality only,
  *     `c = v ⇒ p = g(v)`
  *   - null faithfulness (g(c) NULL ⇔ c NULL, probed at recognition):
  *     `c IS [NOT] NULL ⇒ p IS [NOT] NULL`
  *
  * Every derivation mirrors the WRITE path exactly ([[graft.io.MiniDelta]]
  * applyGenerated computes `g(c) CAST AS declared-type`), so the
  * derived bound lives in the same value space as the stored partition
  * values. Bounds are folded to literals at derivation time — a bound
  * that cannot be evaluated (bad literal under ANSI, fmt mismatch)
  * derives NOTHING, which is always sound (the derived predicate is an
  * implied extra conjunct; omitting it only keeps more files/rows).
  *
  * The date_format range derivations assume the formatted string sorts
  * chronologically — true for the whitelisted zero-padded patterns over
  * years 0001-9999 (delta-spark ships the same assumption).
  *
  * Consumed from two sites: [[graft.io.MiniDelta]] dmlCandidates (file-level
  * metadata pruning for DELETE/UPDATE/MERGE discovery) and
  * [[GeneratedPartitionPruneRule]] (row-level read-side conjunct whose
  * pushdown prunes the scan's partition directories).
  */
object GeneratedPruning {

  /** One derivable edge: a bound on `baseCol` implies a bound on the
    * generated partition column `genCol`. `g` builds the RESOLVED
    * catalyst tree of the generation expression over any input of
    * `baseType` (mirroring the write-side compute-then-cast). */
  final case class Derivation(
      baseCol: String, baseType: DataType,
      genCol: String, genType: DataType,
      monotonic: Boolean,
      g: Expression => Expression) {

    /** Fold g at the raw predicate literal `v`: cast v to the base type
      * first (the row predicate's own coercion), apply g, evaluate.
      * None = not evaluable → the caller derives nothing (sound). */
    def bound(v: Literal): Option[Literal] = Try {
      val tz = Some(SQLConf.get.sessionLocalTimeZone)
      val typed: Expression =
        if (v.dataType == baseType) v else Cast(v, baseType, tz)
      val e = g(typed)
      if (!e.resolved || !e.foldable) None
      else Option(e.eval(null)).map(Literal(_, e.dataType))
    }.toOption.flatten
  }

  private def tzOpt: Option[String] = Some(SQLConf.get.sessionLocalTimeZone)

  private val DateLike: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)

  /** date_format patterns whose output sorts chronologically (fixed
    * width, zero padded, most-significant-first). */
  private val MonotonicFormats = Set(
    "yyyy", "yyyy-MM", "yyyy-MM-dd", "yyyy-MM-dd-HH", "yyyy-MM-dd HH")

  private def baseName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.length == 1 =>
      Some(a.nameParts.head)
    case _ => None
  }

  /** Recognize one generation-expression SQL string against the base
    * column it references. Returns (baseColName, monotonic, builder) —
    * the builder produces the RESOLVED catalyst tree (the parsed form
    * is unresolved; we rebuild with explicit input coercions). */
  private def recognize(sql: String, typeOf: String => Option[DataType])
      : Option[(String, Boolean, Expression => Expression)] = {
    val parsed = Try(CatalystSqlParser.parseExpression(sql)).toOption
      .getOrElse(return None)
    def dateCast(x: Expression) = Cast(x, DateType, tzOpt)
    def tsCast(x: Expression) = Cast(x, TimestampType, tzOpt)
    def forDateBase(n: String, mono: Boolean,
                    b: Expression => Expression) =
      typeOf(n).filter(DateLike).map(_ => (n, mono, b))
    parsed match {
      case c: Cast if c.dataType == DateType =>
        baseName(c.child).flatMap(n =>
          forDateBase(n, mono = true, dateCast))
      case f: UnresolvedFunction =>
        (f.nameParts.last.toLowerCase(java.util.Locale.ROOT),
          f.arguments) match {
          case ("to_date" | "date", Seq(a)) =>
            baseName(a).flatMap(n => forDateBase(n, mono = true, dateCast))
          case ("year", Seq(a)) =>
            baseName(a).flatMap(n =>
              forDateBase(n, mono = true, x => Year(dateCast(x))))
          case ("month", Seq(a)) =>
            baseName(a).flatMap(n =>
              forDateBase(n, mono = false, x => Month(dateCast(x))))
          case ("day" | "dayofmonth", Seq(a)) =>
            baseName(a).flatMap(n =>
              forDateBase(n, mono = false, x => DayOfMonth(dateCast(x))))
          case ("hour", Seq(a)) =>
            baseName(a).flatMap(n =>
              forDateBase(n, mono = false, x => Hour(tsCast(x), tzOpt)))
          case ("date_trunc", Seq(fmt: Literal, a)) =>
            baseName(a).flatMap(n => forDateBase(n, mono = true,
              x => TruncTimestamp(fmt, tsCast(x), tzOpt)))
          case ("trunc", Seq(a, fmt: Literal)) =>
            baseName(a).flatMap(n => forDateBase(n, mono = true,
              x => TruncDate(dateCast(x), fmt)))
          case ("date_format", Seq(a, fmt: Literal))
              if fmt.value != null &&
                MonotonicFormats.contains(fmt.value.toString) =>
            baseName(a).flatMap(n => forDateBase(n, mono = true,
              x => DateFormatClass(tsCast(x), fmt, tzOpt)))
          case ("substring" | "substr", Seq(a, pos: Literal, len: Literal))
              if Seq(0, 1).exists(p =>
                pos.value != null && pos.value.toString == p.toString) =>
            // substring(s, 0|1, n) is the PREFIX — monotone
            // non-decreasing in binary string order
            baseName(a).flatMap(n => typeOf(n).filter(_ == StringType)
              .map(_ => (n, true,
                (x: Expression) => Substring(x, pos, len))))
          case _ => None
        }
      case _ => None
    }
  }

  /** One derivable edge for a single generated-column declaration,
    * against a caller-supplied (ambiguity-aware) name→type resolver.
    * The candidate is PROBED at a sample value before acceptance — a g
    * that nulls valid input (an invalid trunc fmt) would break the
    * null-faithful and monotonic claims, so it derives nothing. */
  def derivationOf(genSql: String, genName: String, genType: DataType,
                   typeOf: String => Option[DataType])
      : Option[Derivation] =
    recognize(genSql, typeOf).flatMap { case (base, mono, build) =>
      // mirror the write path: computed value is cast to the
      // DECLARED type of the generated column
      val g = (x: Expression) => Cast(build(x), genType, tzOpt)
      typeOf(base).flatMap { bt =>
        val d = Derivation(base, bt, genName, genType, mono, g)
        // validity probe: g over a mid-range sample must be non-null
        val sample = bt match {
          case StringType => Literal("2001-06-15 12:30:45")
          case _ => Literal(
            java.sql.Timestamp.valueOf("2001-06-15 12:30:45"))
        }
        d.bound(sample).map(_ => d)
      }
    }

  /** All derivable edges of a declared schema: partition columns whose
    * `delta.generationExpression` is a recognized shape over one
    * top-level base column. Names in the result are LOGICAL. Used by
    * the single-table consumers (DML blast-radius discovery), where
    * the declared schema's names are unambiguous by construction. */
  def derivationsOf(schema: StructType,
                    partitionCols: Seq[String]): Seq[Derivation] = {
    val genKey = graft.io.MiniDelta.GenExprKey
    def typeOf(n: String): Option[DataType] = {
      val ms = schema.fields.filter(_.name.equalsIgnoreCase(n))
      if (ms.length == 1) Some(ms.head.dataType) else None
    }
    partitionCols.flatMap { pc =>
      schema.fields.find(f => f.name.equalsIgnoreCase(pc) &&
          f.metadata.contains(genKey)).flatMap { gf =>
        derivationOf(gf.metadata.getString(genKey), gf.name, gf.dataType,
          typeOf)
      }
    }
  }
}

/** Read-side generated-column pruning: a post-analysis rule that adds
  * the IMPLIED partition-column conjunct to any Filter whose condition
  * bounds the base column of a derivable generated partition column —
  * Delta's `OptimizeGeneratedColumn` as a `SparkSessionExtensions`
  * rule. The added conjunct references only the partition attribute,
  * so the optimizer's own PushDownPredicates carries it through the
  * engine's read shapes (declared-order Project, DV anti-join, clone
  * union) into the scan, where FileSourceStrategy turns it into
  * partition-directory pruning: `WHERE ts >= X` on a
  * `day = CAST(ts AS DATE)`-partitioned 100 TB table lists one day's
  * files, not the table's.
  *
  * Runs post-hoc (before any column pruning, so the partition attribute
  * is still in every Filter child's output) and is idempotent — a
  * conjunct already present (semanticEquals) is never re-added. The
  * generation expressions ride the attributes' own field metadata
  * (`delta.generationExpression`), so the rule needs no catalog: any
  * relation whose schema carries the metadata participates, including
  * mapped tables (the logical-restore aliases keep field metadata). */
object GeneratedPartitionPruneRule extends Rule[LogicalPlan]
    with PredicateHelper {
  import GeneratedPruning._

  /** One provenance-anchored edge: the Filter-visible base attribute
    * (matched by exprId, never name), the Filter-visible generated
    * partition attribute it implies a bound on, and the derivation's
    * value machinery. */
  private final case class Anchored(base: AttributeReference,
                                    gen: AttributeReference,
                                    d: Derivation)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case f @ Filter(cond, child) =>
        val genAttrs = child.output.collect {
          case a: AttributeReference
              if a.metadata.contains(graft.io.MiniDelta.GenExprKey) => a
        }
        if (genAttrs.isEmpty) f
        else {
          val anchored = genAttrs.flatMap(anchor(child, _))
          if (anchored.isEmpty) f
          else {
            val conjuncts = splitConjunctivePredicates(cond)
            val extra = conjuncts.flatMap(deriveFrom(_, anchored))
              .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
              .distinct
            if (extra.isEmpty) f
            else Filter(extra.foldLeft(cond)(And(_, _)), child)
          }
        }
    }

  /** Resolve one generated attribute to its provenance-anchored edge,
    * or None when the derivation would not be sound. The generation
    * expression's base-column NAME is resolved at the generated
    * attribute's DEFINING node (the deepest plan node producing its
    * exprId — the relation/projection that carries the metadata), and
    * the resulting base attribute participates only if the SAME exprId
    * is still visible at the Filter's child. Name-only pairing broke
    * two ways (the round-14 finding): a self-join of two
    * generated-partitioned tables let a predicate on `b.ts` derive a
    * bound on `a.day`, and a Project recomputing an alias named like
    * the base column (`ts + INTERVAL 10 DAYS AS ts`) derived a bound
    * not implied by the predicate — both silently dropped rows. ExprId
    * anchoring makes the first derive on the correct side and the
    * second derive nothing (the alias mints a fresh exprId). Ambiguous
    * names at the defining node bail entirely. */
  private def anchor(child: LogicalPlan,
                     gen: AttributeReference): Option[Anchored] = {
    val defNode = definingNode(child, gen)
    def typeAt(n: String): Option[DataType] = {
      val ms = defNode.output.filter(_.name.equalsIgnoreCase(n))
      if (ms.length == 1) Some(ms.head.dataType) else None
    }
    derivationOf(gen.metadata.getString(graft.io.MiniDelta.GenExprKey),
      gen.name, gen.dataType, typeAt).flatMap { d =>
      defNode.output.filter(_.name.equalsIgnoreCase(d.baseCol)) match {
        case Seq(b: AttributeReference)
            if child.outputSet.contains(b) =>
          Some(Anchored(b, gen, d))
        case _ => None
      }
    }
  }

  /** The deepest node of `plan` whose output still contains `gen`'s
    * exprId — where the generated attribute (and the base column its
    * expression references) are defined. */
  private def definingNode(plan: LogicalPlan,
                           gen: AttributeReference): LogicalPlan =
    plan.children.find(_.outputSet.contains(gen)) match {
      case Some(c) => definingNode(c, gen)
      case None => plan
    }

  private def asLiteral(e: Expression): Option[Literal] = e match {
    case l: Literal => Some(l)
    case _ if e.foldable && e.deterministic =>
      Try(Literal(e.eval(null), e.dataType)).toOption
    case _ => None
  }

  /** Derive the implied partition conjunct(s) of ONE source conjunct.
    * Only top-level comparisons translate; anything else derives
    * nothing (the conjunct still filters rows — we only lose pruning,
    * never correctness). */
  private def deriveFrom(c: Expression,
                         anchored: Seq[Anchored]): Seq[Expression] = {
    def forBase(a: Expression): Seq[(Derivation, AttributeReference)] =
      a match {
        case ar: AttributeReference =>
          anchored.filter(_.base.exprId == ar.exprId)
            .map(an => an.d -> an.gen)
        case _ => Nil
      }
    def cmp(a: Expression, v: Expression, op: String): Seq[Expression] =
      asLiteral(v).toSeq.flatMap { l =>
        forBase(a).flatMap { case (d, p) =>
          d.bound(l).flatMap { b =>
            op match {
              case "=" => Some(EqualTo(p, b))
              case ">" | ">=" if d.monotonic =>
                Some(GreaterThanOrEqual(p, b))
              case "<" | "<=" if d.monotonic =>
                Some(LessThanOrEqual(p, b))
              case _ => None
            }
          }
        }
      }
    c match {
      case EqualTo(a, v) => cmp(a, v, "=") ++ cmp(v, a, "=")
      case EqualNullSafe(a, v) =>
        (asLiteral(v).filter(_.value != null).toSeq.flatMap(_ =>
          cmp(a, v, "="))) ++
          (asLiteral(a).filter(_.value != null).toSeq.flatMap(_ =>
            cmp(v, a, "=")))
      case GreaterThan(a, v) => cmp(a, v, ">") ++ cmp(v, a, "<")
      case GreaterThanOrEqual(a, v) => cmp(a, v, ">=") ++ cmp(v, a, "<=")
      case LessThan(a, v) => cmp(a, v, "<") ++ cmp(v, a, ">")
      case LessThanOrEqual(a, v) => cmp(a, v, "<=") ++ cmp(v, a, ">=")
      case In(a, vs) if vs.nonEmpty && vs.forall(asLiteral(_).isDefined) =>
        // c IN (v…) ⇒ p IN (g(v)…) — only if EVERY bound evaluates
        forBase(a).flatMap { case (d, p) =>
          val bounds = vs.flatMap(v => asLiteral(v).flatMap(d.bound))
          if (bounds.length == vs.length) Some(In(p, bounds.distinct))
          else None
        }
      case IsNull(a) => forBase(a).map { case (_, p) => IsNull(p) }
      case IsNotNull(a) => forBase(a).map { case (_, p) => IsNotNull(p) }
      // SQL BETWEEN survives analysis as the unexpanded
      // RuntimeReplaceable node (the optimizer expands it later —
      // after this rule has run), so translate it here
      case b: Between =>
        deriveFrom(GreaterThanOrEqual(b.input, b.lower), anchored) ++
          deriveFrom(LessThanOrEqual(b.input, b.upper), anchored)
      case _ => Nil
    }
  }
}
