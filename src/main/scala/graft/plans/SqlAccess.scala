package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.TimestampType

import graft.io.MiniDelta

/** SQL front door: `graft.<alias>` (or `graft.datalake.<alias>`) table
  * identifiers resolve to the engine's governed read path, so the whole
  * API surface is reachable from plain `spark.sql`:
  *
  *   SELECT ... FROM graft.datalake.trades WHERE ...
  *   SELECT ... FROM graft.trades VERSION AS OF 3
  *   SELECT ... FROM graft.trades TIMESTAMP AS OF '2026-01-01 00:00:00'
  *   INSERT INTO graft.trades SELECT ...
  *   INSERT OVERWRITE graft.trades SELECT ...
  *
  * This is the reference's client-facing contract — callers address
  * tables by catalog alias, never by physical path, and the proxy
  * resolves alias -> storage under the covers
  * (/root/reference/src/config.rs:7, src/main.rs:503-512) — re-expressed
  * as the idiomatic Spark extension point: an injected resolution rule
  * (the same mechanism Delta Lake uses for `delta.{path}` identifiers),
  * NOT a parallel query API. Everything downstream is unchanged: the
  * resolved plan IS the MiniDelta/parquet scan, so Catalyst pushdown,
  * AQE, partition-ACL enforcement ([[AclEnforcementRule]] rewrites the
  * governed scans this rule inlines), deletion-vector anti-joins and
  * column-mapping relabels all apply to SQL exactly as to DataFrame
  * calls.
  *
  * Scale: resolution is a driver-side map probe plus the normal snapshot
  * replay (cached, metadata-scale). Time travel binds the snapshot at
  * resolution time — same cost as the DataFrame path.
  */
object GraftSqlTables {
  /** One registered alias: physical path + whether SQL writes are
    * allowed. The reference's config defaults to read_only=true
    * (/root/reference/src/main.rs:941) and rejects every mutating
    * request under it, so the flag rides with the registration and
    * [[GraftInsertCommand]] enforces it before any work. */
  final case class Entry(path: String, readOnly: Boolean)

  // JVM-global, like a Spark catalog: aliases registered anywhere in
  // the JVM resolve in every co-resident session (register per-alias
  // readOnly if sessions need different write postures)
  private val reg = TrieMap.empty[String, Entry]

  /** Register one alias -> physical path (a MiniDelta table root or a
    * plain parquet directory; which one is sniffed per-query from the
    * presence of a `_delta_log`, so a path may legitimately start life
    * as raw parquet and later become a governed table).
    * `readOnly` defaults to the reference's default posture: writable
    * only when explicitly opted in (src/main.rs:941). */
  def register(alias: String, path: String,
               readOnly: Boolean = true): Unit = {
    val key = alias.toLowerCase
    reg.putIfAbsent(key, Entry(path, readOnly)) match {
      case None => ()
      case Some(prev) =>
        // governance: the registry is JVM-global (any co-resident
        // session sees it), so a silent overwrite could repoint an
        // alias or flip a read-only table writable for everyone —
        // unlike the reference, where read_only is fixed server config
        // (src/main.rs:941). Repointing and relaxing require an
        // explicit unregister first; idempotent re-registration and
        // TIGHTENING to read-only stay frictionless.
        if (prev.path != path)
          throw new IllegalStateException(
            s"alias '$key' is already registered at ${prev.path}; " +
              s"refusing to repoint it to $path — unregister first")
        if (!readOnly && prev.readOnly)
          throw new IllegalStateException(
            s"alias '$key' is registered read-only; refusing the " +
              "write-enabling re-registration — unregister first")
        if (readOnly && !prev.readOnly) {
          reg.put(key, Entry(path, readOnly)); ()
        }
    }
  }

  /** Register every alias of a [[graft.catalog.Catalog]]. */
  def register(catalog: graft.catalog.Catalog): Unit =
    register(catalog, readOnly = true)

  def register(catalog: graft.catalog.Catalog, readOnly: Boolean): Unit =
    catalog.entries.foreach { case (a, p) => register(a, p, readOnly) }

  def clear(): Unit = reg.clear()

  /** Remove one alias (SQL DROP TABLE). Metadata-only, external-table
    * posture: the physical directory is untouched — the reference's
    * config-registered tables are never deleted by the proxy either.
    * Returns whether the alias existed. */
  def unregister(alias: String): Boolean =
    reg.remove(alias.toLowerCase).isDefined

  /** Registered alias names (for [[GraftCatalog.listTables]]). */
  def aliases: Seq[String] = reg.keySet.toSeq.sorted

  /** `graft.t` and `graft.datalake.t` both resolve (the reference
    * exposes one virtual bucket, src/main.rs:115-141); unknown aliases
    * return None and fall through to Spark's own resolution — whose
    * TABLE_OR_VIEW_NOT_FOUND is the reference's 404. */
  def resolve(parts: Seq[String]): Option[Entry] =
    parts.map(_.toLowerCase) match {
      case Seq("graft", t) => reg.get(t)
      case Seq("graft", "datalake", t) => reg.get(t)
      case _ => None
    }
}

/** The resolution rule. Injected by [[GraftExtensions]]; matches only
  * graft-namespace identifiers, so co-resident catalogs are untouched. */
case class GraftSqlRule(spark: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private def entryOf(plan: LogicalPlan): Option[GraftSqlTables.Entry] =
    plan match {
      case u: UnresolvedRelation =>
        GraftSqlTables.resolve(u.multipartIdentifier)
      // DML targets may carry an alias (MERGE INTO graft.x t, DELETE
      // FROM graft.x AS t) — the alias only scopes name resolution in
      // the condition, which binds by column name inside the engine
      case org.apache.spark.sql.catalyst.plans.logical
          .SubqueryAlias(_, child) => entryOf(child)
      case _ => None
    }

  /** The qualifier names a DML condition may legally prefix columns
    * with: the target's alias when one is declared (SQL scoping — the
    * alias REPLACES the table name), else the table identifier's last
    * part. Lowercased; resolution is case-insensitive. */
  private def qualifiersOf(plan: LogicalPlan): Set[String] = plan match {
    case org.apache.spark.sql.catalyst.plans.logical
        .SubqueryAlias(ident, _) => Set(ident.name.toLowerCase)
    case u: UnresolvedRelation =>
      Set(u.multipartIdentifier.last.toLowerCase)
    case _ => Set.empty
  }

  /** Strip a leading target qualifier from column references so the
    * condition binds against the engine's plain table frame (`t.id` ->
    * `id`). Multi-part names whose head is NOT a known qualifier pass
    * through untouched — they are struct-field paths. A head that is
    * BOTH the qualifier and a declared top-level column (DELETE FROM
    * graft.t WHERE t.f = 1 where the table also has a struct column
    * `t`) is ambiguous — stripping would mis-bind relative to Spark's
    * own precedence, so refuse by name. */
  private def stripQualifiers(e: Expression, quals: Set[String],
                              declaredCols: Set[String]): Expression =
    e.transform {
      case u: UnresolvedAttribute if u.nameParts.length > 1 &&
          quals.contains(u.nameParts.head.toLowerCase) =>
        if (declaredCols.contains(u.nameParts.head.toLowerCase))
          throw new IllegalArgumentException(
            s"ambiguous reference ${u.nameParts.mkString(".")}: " +
              s"'${u.nameParts.head}' names both the DML target and a " +
              "table column — alias the target differently (DELETE FROM " +
              "graft.x AS tgt ...)")
        UnresolvedAttribute(u.nameParts.tail)
    }

  /** Declared top-level column names of the target (lowercased) — the
    * ambiguity set for [[stripQualifiers]]. One metadata-scale schema
    * resolution per DML statement. */
  private def declaredColsOf(e: GraftSqlTables.Entry): Set[String] =
    MiniDelta.latestSchema(spark, e.path)
      .map(_.fieldNames.map(_.toLowerCase).toSet).getOrElse(Set.empty)

  /** The governed read, inlined as an analyzed subtree. */
  private def readPlan(path: String, versionAsOf: Option[Long],
                       tsMs: Option[Long]): LogicalPlan = {
    val df: DataFrame =
      if (MiniDelta.tableExists(spark, path))
        tsMs match {
          case Some(t) => MiniDelta.readAtTimestamp(spark, path, t)
          case None =>
            MiniDelta.readFiltered(spark, path, Seq.empty, versionAsOf)
        }
      else {
        require(versionAsOf.isEmpty && tsMs.isEmpty,
          s"time travel requires a MiniDelta table; $path has no _delta_log")
        spark.read.parquet(path)
      }
    df.queryExecution.analyzed
  }

  /** Equi-join keys from `ON t.k1 = s.k1 AND ...`: each conjunct must
    * equate the SAME column name on two DIFFERENT sides (the engine's
    * merge is keyed, not arbitrary-predicate; `t.id = t.id` is a
    * cross-join in disguise, not a key). Anything else refuses by
    * name. */
  private def mergeKeysOf(cond: Expression): Seq[String] =
    splitConjunctivePredicates(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) &&
            a.nameParts.map(_.toLowerCase) != b.nameParts.map(_.toLowerCase) =>
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        "graft MERGE needs an ON clause of same-name equality conjuncts " +
          s"relating target to source (t.k = s.k AND ...); got " +
          s"${other.sql}")
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // top-down: INSERT INTO graft.x must capture the statement BEFORE
    // the bare-relation case rewrites its target child into a scan
    plan.transformDown {
      // CTAS is intercepted here rather than left to the DSv2 exec:
      // the exec would demand a SupportsWrite table from the catalog,
      // while the engine's one write path is MiniDelta.append — the
      // command creates the table (same helper as the catalog's plain
      // CREATE TABLE) and appends the query result in run()
      case ctas: org.apache.spark.sql.catalyst.plans.logical
          .CreateTableAsSelect if GraftDdl.identOf(ctas.name).isDefined =>
        val ts = ctas.tableSpec
        GraftCreateTableCommand(GraftDdl.identOf(ctas.name).get, ctas.query,
          partCols = GraftDdl.identityCols(ctas.partitioning),
          location = ts.location, properties = ts.properties,
          ignoreIfExists = ctas.ignoreIfExists)

      // CREATE OR REPLACE TABLE: the DSv2 ReplaceTableExec would drop
      // the alias registration and re-create (losing the table's
      // history and failing createTable's existing-log refusal) — the
      // engine command instead swaps schema/properties and tombstones
      // the contents in ONE commit on the SAME log (Delta's REPLACE)
      case rt: org.apache.spark.sql.catalyst.plans.logical.ReplaceTable
          if GraftDdl.identOf(rt.name).isDefined =>
        val ts = rt.tableSpec
        GraftReplaceTableCommand(GraftDdl.identOf(rt.name).get,
          rt.tableSchema, GraftDdl.identityCols(rt.partitioning),
          ts.location, ts.properties, rt.orCreate)

      // RTAS takes the same detour as the column-list REPLACE above:
      // the DSv2 ReplaceTableAsSelectExec would drop the alias
      // registration and then fail createTable's existing-log refusal —
      // statement dead AND registration lost. One engine commit swaps
      // the contract, then the query rows append.
      case rtas: org.apache.spark.sql.catalyst.plans.logical
          .ReplaceTableAsSelect if GraftDdl.identOf(rtas.name).isDefined =>
        val ts = rtas.tableSpec
        GraftReplaceTableAsSelectCommand(GraftDdl.identOf(rtas.name).get,
          rtas.query, GraftDdl.identityCols(rtas.partitioning),
          ts.location, ts.properties, rtas.orCreate)

      case org.apache.spark.sql.catalyst.plans.logical.TruncateTable(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        GraftTruncateCommand(e.path, e.readOnly)

      case org.apache.spark.sql.catalyst.plans.logical.ShowColumns(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
          _, _)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        GraftShowColumnsCommand(e.path)

      case org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
          _, _)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        GraftShowCreateTableCommand(
          u.multipartIdentifier.last.toLowerCase, e.path)

      case org.apache.spark.sql.catalyst.plans.logical.AddColumns(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, cols)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        val fields = cols.map { c =>
          // nested paths compose since r17: (a.c TYPE) appends field c
          // inside struct a — the engine inserts at the parent path;
          // segments thread through unjoined, and FIRST/AFTER places
          // the new field among its siblings (r18)
          require(c.default.isEmpty,
            "ADD COLUMNS with a DEFAULT is not supported (Delta's own " +
              "rule — existing rows would need backfill semantics); " +
              "add the column, then ALTER COLUMN ... SET DEFAULT")
          val meta = c.comment.fold(
            org.apache.spark.sql.types.Metadata.empty)(cm =>
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString("comment", cm).build())
          val pos = c.position.map(_.position match {
            case a: org.apache.spark.sql.connector.catalog
                .TableChange.After => Some(a.column())
            case _ => None // FIRST
          })
          (c.name, org.apache.spark.sql.types.StructField(
            c.name.last, c.dataType, c.nullable, meta), pos)
        }
        GraftAddColumnsCommand(e.path, fields, e.readOnly)

      // ALTER TABLE ... REPLACE COLUMNS (c1 T1, ...) → one metadata
      // commit re-declaring the top-level column list (drops absent
      // columns, adds new ones nullable, reorders/re-comments
      // survivors which keep type + full metadata) — the engine verb
      // requires column mapping and guards dropped references
      case rc0 @ org.apache.spark.sql.catalyst.plans.logical
          .ReplaceColumns(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        val fields = rc0.columnsToAdd.map { c =>
          require(c.name.length == 1,
            "REPLACE COLUMNS declares the TOP-LEVEL list only (got " +
              s"nested ${c.name.mkString(".")})")
          require(c.default.isEmpty,
            "REPLACE COLUMNS with a DEFAULT is not supported — " +
              "declare the list, then ALTER COLUMN ... SET DEFAULT")
          // the restated list ORDER is what binds — a FIRST/AFTER
          // clause here would be silently redundant at best and
          // contradictory at worst, so refuse (mirrors the ADD
          // COLUMNS posture pre-r18 rather than dropping the clause)
          require(c.position.isEmpty,
            s"REPLACE COLUMNS: FIRST/AFTER on ${c.name.mkString(".")}" +
              " is not supported — the declared list order already " +
              "expresses every column's position")
          val meta = c.comment.fold(
            org.apache.spark.sql.types.Metadata.empty)(cm =>
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString("comment", cm).build())
          org.apache.spark.sql.types.StructField(
            c.name.head, c.dataType, c.nullable, meta)
        }
        GraftReplaceColumnsCommand(e.path, fields, e.readOnly)

      // ALTER TABLE ... CLUSTER BY (cols) / CLUSTER BY NONE → one
      // metadata commit re-stating the delta.clustering domain
      case cb @ org.apache.spark.sql.catalyst.plans.logical
          .AlterTableClusterBy(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        val cols = cb.clusterBySpec.toSeq.flatMap(_.columnNames.map { r =>
          require(r.fieldNames.length == 1,
            "graft CLUSTER BY supports top-level columns only " +
              s"(got nested ${r.fieldNames.mkString(".")})")
          r.fieldNames.head
        })
        GraftClusterByCommand(e.path, e.readOnly, cols)

      // ALTER COLUMN c SET DEFAULT e / DROP DEFAULT / TYPE <wider> /
      // COMMENT 'txt' / DROP NOT NULL / FIRST / AFTER other — one
      // metadata commit per change, each routed to its engine verb
      // (SET NOT NULL refuses inside the engine with the CHECK
      // guidance). Nested paths compose everywhere since r17/r18;
      // segments thread through unjoined.
      case ac @ org.apache.spark.sql.catalyst.plans.logical.AlterColumns(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        val changes: Seq[(Seq[String], GraftColumnChange)] =
          ac.specs.map { s =>
            val picked = Seq(
              s.newDataType.map(GraftColumnChange.Type(_)
                : GraftColumnChange),
              s.newComment.map(GraftColumnChange.Comment(_)
                : GraftColumnChange),
              s.newNullability.map(GraftColumnChange.Nullability(_)
                : GraftColumnChange),
              s.newPosition.map { p =>
                (p.position match {
                  case a: org.apache.spark.sql.connector.catalog
                      .TableChange.After =>
                    GraftColumnChange.Position(Some(a.column()))
                  case _ => GraftColumnChange.Position(None) // FIRST
                }): GraftColumnChange
              },
              if (s.newDefaultExpression.isDefined || s.dropDefault)
                Some(GraftColumnChange.Default(
                  s.newDefaultExpression.map(_.originalSQL))
                  : GraftColumnChange)
              else None).flatten
            require(picked.nonEmpty, "graft ALTER COLUMN: nothing to change")
            require(picked.length == 1,
              "graft ALTER COLUMN: one change per column per statement " +
                "(TYPE, DEFAULT, COMMENT, nullability, position)")
            (s.column.name, picked.head)
          }
        GraftAlterColumnCommand(e.path, e.readOnly, changes)

      // --- mapped-schema evolution: RENAME/DROP COLUMN route to the
      // engine's metadata-only commits (they require name-mode column
      // mapping, which the commands check and explain by name)
      case rc @ org.apache.spark.sql.catalyst.plans.logical.RenameColumn(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _, _)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        // nested paths compose since r17 (mapping metadata lives at
        // every depth): a.b renames field b inside struct a. The
        // parser's segments thread through UNJOINED (r18) so a
        // backticked name containing a literal dot stays one segment.
        GraftRenameColumnCommand(e.path, e.readOnly,
          rc.column.name, rc.newName)

      case dc @ org.apache.spark.sql.catalyst.plans.logical.DropColumns(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _, _)
          if GraftSqlTables.resolve(u.multipartIdentifier).isDefined =>
        val e = GraftSqlTables.resolve(u.multipartIdentifier).get
        require(!dc.ifExists,
          "graft DROP COLUMN does not support IF EXISTS — absent " +
            "columns refuse by name")
        // nested paths compose since r17: a.b drops field b inside
        // struct a (metadata-only, the stored bytes stay unread);
        // segments thread through unjoined (r18)
        GraftDropColumnsCommand(e.path, e.readOnly,
          dc.columnsToDrop.map(_.name))

      case InsertIntoStatement(rel, partSpec, userCols, query, overwrite,
          ifPartitionNotExists, byName) if entryOf(rel).isDefined =>
        require(partSpec.isEmpty,
          "INSERT ... PARTITION is not supported on graft tables: the " +
            "table's declared layout governs partitioning (write the " +
            "partition column as data instead)")
        require(!ifPartitionNotExists,
          "IF NOT EXISTS partitions are not supported on graft tables")
        val e = entryOf(rel).get
        GraftInsertCommand(e.path, query, userCols, overwrite,
          byName, e.readOnly)

      case DeleteFromTable(rel, condition) if entryOf(rel).isDefined =>
        val e = entryOf(rel).get
        GraftDeleteCommand(e.path,
          new Unbound(stripQualifiers(condition, qualifiersOf(rel),
            declaredColsOf(e))),
          e.readOnly)

      case UpdateTable(rel, assignments, condition)
          if entryOf(rel).isDefined =>
        val e = entryOf(rel).get
        val quals = qualifiersOf(rel)
        val cols = declaredColsOf(e)
        val stripped = assignments.map(a => Assignment(a.key,
          stripQualifiers(a.value, quals, cols)))
        GraftUpdateCommand(e.path, new Unbound(stripped),
          new Unbound(condition.map(stripQualifiers(_, quals, cols))),
          quals, e.readOnly)

      case m: MergeIntoTable if entryOf(m.targetTable).isDefined =>
        val e = entryOf(m.targetTable).get
        // the canonical upsert and the delete-only forms keep dedicated
        // fast paths (schema evolution / identity chains / duplicate-
        // key tolerance); everything else — conditional multi-clause
        // sets, explicit assignments, source-referencing delete
        // conditions — takes the general clause path below
        val srcQuals = qualifiersOf(m.sourceTable)
        def refsSource(cond: Option[Expression]): Boolean =
          cond.exists(_.exists {
            case u: UnresolvedAttribute => u.nameParts.length > 1 &&
              srcQuals.contains(u.nameParts.head.toLowerCase)
            case _ => false
          })
        (m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions) match {
          case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None)),
              Seq()) =>
            GraftMergeCommand(e.path, m.sourceTable,
              mergeKeysOf(m.mergeCondition), m.withSchemaEvolution,
              e.readOnly)
          // WHEN MATCHED [AND cond] THEN DELETE alone: the keyed
          // anti-delete ([[MiniDelta.mergeDelete]]); the condition
          // binds to TARGET columns (target qualifiers stripped — a
          // source-column reference fails resolution loudly inside
          // the engine)
          case (Seq(org.apache.spark.sql.catalyst.plans.logical
              .DeleteAction(cond)), Seq(), Seq()) if !refsSource(cond) =>
            GraftMergeDeleteCommand(e.path, m.sourceTable,
              mergeKeysOf(m.mergeCondition),
              new Unbound(cond.map(stripQualifiers(_,
                qualifiersOf(m.targetTable), declaredColsOf(e)))),
              e.readOnly)
          // WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE alone:
          // the sync-delete (stale target rows go)
          case (Seq(), Seq(), Seq(org.apache.spark.sql.catalyst.plans
              .logical.DeleteAction(cond))) if !refsSource(cond) =>
            GraftMergeDeleteCommand(e.path, m.sourceTable,
              mergeKeysOf(m.mergeCondition),
              new Unbound(cond.map(stripQualifiers(_,
                qualifiersOf(m.targetTable), declaredColsOf(e)))),
              e.readOnly, bySource = true)
          // every other combination takes the GENERAL clause path
          // ([[MiniDelta.mergeClauses]]): conditional multi-clause
          // matched/not-matched/not-matched-by-source with explicit
          // assignments. Qualifier binding happens at RUN time, where
          // the analyzed source's columns are known.
          case _ =>
            import org.apache.spark.sql.catalyst.plans.logical._
            def keyPartsOf(k: Expression): Seq[String] = k match {
              case u: UnresolvedAttribute => u.nameParts
              case other => throw new IllegalArgumentException(
                s"MERGE assignment target must be a column: ${other.sql}")
            }
            def rawOf(a: MergeAction): RawMergeClause = a match {
              case UpdateAction(c, assigns, _) => RawMergeClause(c,
                RawUpdate(assigns.map(as =>
                  (keyPartsOf(as.key), as.value))))
              case UpdateStarAction(c) => RawMergeClause(c, RawUpdateStar)
              case DeleteAction(c) => RawMergeClause(c, RawDelete)
              case InsertAction(c, assigns) => RawMergeClause(c,
                RawInsert(assigns.map(as =>
                  (keyPartsOf(as.key), as.value))))
              case InsertStarAction(c) => RawMergeClause(c, RawInsertStar)
              case other => throw new IllegalArgumentException(
                s"unsupported MERGE action: $other")
            }
            GraftMergeClausesCommand(e.path, m.sourceTable,
              mergeKeysOf(m.mergeCondition),
              new Unbound(m.matchedActions.map(rawOf)),
              new Unbound(m.notMatchedActions.map(rawOf)),
              new Unbound(m.notMatchedBySourceActions.map(rawOf)),
              qualifiersOf(m.targetTable), qualifiersOf(m.sourceTable),
              declaredColsOf(e), e.readOnly,
              withSchemaEvolution = m.withSchemaEvolution)
        }

      case tt: RelationTimeTravel if entryOf(tt.relation).isDefined =>
        val path = entryOf(tt.relation).get.path
        tt.version match {
          case Some(v) =>
            val ver =
              try java.lang.Long.parseLong(v)
              catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"VERSION AS OF must be a commit number, got '$v'")
              }
            readPlan(path, Some(ver), None)
          case None =>
            val e = tt.timestamp.getOrElse(throw new IllegalArgumentException(
              "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
            require(e.resolved && e.foldable,
              s"TIMESTAMP AS OF must be a literal, got ${e.sql}")
            val micros = Cast(e, TimestampType,
              Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
            require(micros != null, s"TIMESTAMP AS OF ${e.sql} is null")
            readPlan(path, None, Some(micros.asInstanceOf[Long] / 1000L))
        }

      // --- introspection: SHOW PARTITIONS / SHOW TBLPROPERTIES /
      // DESCRIBE TABLE on graft aliases route to the engine's
      // metadata-only readers (the catalog's loadTable throws by
      // design, so Spark's own execs can never serve these)
      case sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions =>
        graftTableIdent(sp.table) match {
          case Some(e) =>
            require(sp.pattern.isEmpty,
              "SHOW PARTITIONS ... PARTITION(spec) is not supported on " +
                "graft tables — filter the full listing instead")
            GraftShowPartitionsCommand(e.path)
          case None => sp
        }

      case stp: org.apache.spark.sql.catalyst.plans.logical
          .ShowTableProperties =>
        graftTableIdent(stp.table) match {
          case Some(e) =>
            GraftShowTablePropertiesCommand(e.path, stp.propertyKey)
          case None => stp
        }

      // --- ALTER TABLE SET/UNSET TBLPROPERTIES: the write-side pair of
      // SHOW TBLPROPERTIES, routed to the engine's metaData commits
      case sp: org.apache.spark.sql.catalyst.plans.logical
          .SetTableProperties =>
        graftTableIdent(sp.table) match {
          case Some(e) =>
            GraftSetPropertiesCommand(e.path, e.readOnly, sp.properties)
          case None => sp
        }

      case up: org.apache.spark.sql.catalyst.plans.logical
          .UnsetTableProperties =>
        graftTableIdent(up.table) match {
          case Some(e) =>
            GraftUnsetPropertiesCommand(e.path, e.readOnly,
              up.propertyKeys, up.ifExists)
          case None => up
        }

      case d: org.apache.spark.sql.catalyst.plans.logical.DescribeRelation =>
        graftTableIdent(d.relation) match {
          case Some(e) =>
            require(d.partitionSpec.isEmpty,
              "DESCRIBE ... PARTITION is not supported on graft tables")
            GraftDescribeTableCommand(e.path, e.readOnly, d.isExtended)
          case None => d
        }

      case u: UnresolvedRelation if entryOf(u).isDefined =>
        readPlan(entryOf(u).get.path, None, None)
    }

  /** The graft alias under an introspection command's target plan —
    * `UnresolvedTable` (SHOW verbs) or `UnresolvedTableOrView`
    * (DESCRIBE) carrying a graft-namespace identifier. */
  private def graftTableIdent(plan: LogicalPlan)
      : Option[GraftSqlTables.Entry] = plan match {
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
      GraftSqlTables.resolve(t.multipartIdentifier)
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      GraftSqlTables.resolve(t.multipartIdentifier)
    case _ => None
  }
}

/** `INSERT INTO | OVERWRITE graft.<alias>` as an eagerly-executed
  * command routing through [[MiniDelta.append]]/[[MiniDelta.overwrite]]
  * — SQL writes get the full write contract (schema merge validation,
  * CHECK constraints, protocol gate, commit retry) for free.
  *
  * The source `query` is kept UNRESOLVED here and analyzed inside
  * [[run]]: it may itself reference graft tables (INSERT INTO a SELECT
  * FROM graft.b), and analyzing it in the target session applies this
  * same extension. Column alignment follows SQL semantics: positional
  * for `INSERT INTO t SELECT ...` (names are rebound to the target
  * schema), by-name for `INSERT INTO t BY NAME` / an explicit column
  * list — which must cover the target schema exactly, since MiniDelta
  * tables have no column defaults.
  */
case class GraftInsertCommand(table: String, query: LogicalPlan,
    userCols: Seq[String], overwrite: Boolean, byName: Boolean,
    readOnly: Boolean = true)
    extends LeafRunnableCommand {

  // the source query renders under the command in EXPLAIN output
  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    // the reference rejects all mutating requests under its default
    // read_only=true config (src/main.rs:941) — same gate, same place:
    // before any planning or IO
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    val src = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, query)
    val declared = MiniDelta.latestSchema(spark, table)
    val parts = MiniDelta.partitionColumns(spark, table)

    val aligned: DataFrame = declared match {
      case None => // first write creates the table: columns pass as-is
        require(!GraftDml.rawParquetDir(spark, table),
          s"INSERT into $table refused: the path holds raw parquet with " +
            "no _delta_log, and a first commit would orphan the existing " +
            "rows. Convert it to a governed table first " +
            "(MiniDelta.convertToDelta) or register a fresh path.")
        require(userCols.isEmpty,
          s"column list on a not-yet-created table $table")
        src
      case Some(st) =>
        val target = st.fieldNames.toSeq
        // SQL store assignment: the query's output casts to the
        // declared column types (INSERT ... VALUES types literals as
        // int/decimal; without the cast the schema-merge gate would
        // refuse the "retype")
        def assign(df: DataFrame): DataFrame =
          df.select(target.map(n => org.apache.spark.sql.functions
            .col(n).cast(st(n).dataType).as(n)): _*)
        if (byName || userCols.nonEmpty) {
          val names = if (userCols.nonEmpty) userCols else src.columns.toSeq
          val extra = names.filterNot(n =>
            target.exists(_.equalsIgnoreCase(n)))
          require(extra.isEmpty,
            s"insert names unknown column(s) ${extra.mkString(", ")} " +
              s"(table has ${target.mkString(", ")})")
          require(names.map(_.toLowerCase).distinct.length == names.length,
            s"insert names a column twice: ${names.mkString(", ")}")
          require(names.length == src.columns.length,
            s"column list names ${names.length} columns, query produces " +
              s"${src.columns.length}")
          // the list may omit ONLY generated/identity/DEFAULT columns —
          // the engine computes or fills those; any other omission
          // refuses (a silent null-fill would hide a mistyped column
          // name)
          val missing = target.filterNot(t =>
            names.exists(_.equalsIgnoreCase(t)))
          val badMissing = missing.filterNot { m =>
            val f = st(m)
            f.metadata.contains("delta.generationExpression") ||
              f.metadata.contains("delta.identity.start") ||
              f.metadata.contains(MiniDelta.CurrentDefaultKey) ||
              // a struct with NESTED defaults (r18) is omissible too:
              // the write contract materializes the defaulted fields
              MiniDelta.hasDeepDefault(f.dataType)
          }
          require(badMissing.isEmpty,
            s"BY NAME/column-list insert must cover the target schema " +
              s"(except generated/identity/DEFAULT columns): missing " +
              s"${badMissing.mkString(", ")}")
          // bind query output to the named target columns positionally,
          // then reorder the PRESENT subset to the declared layout
          val bound = src.toDF(names: _*)
          val present = target.filter(t =>
            names.exists(_.equalsIgnoreCase(t)))
          bound.select(present.map(n => org.apache.spark.sql.functions
            .col(n).cast(st(n).dataType).as(n)): _*)
        } else {
          require(src.columns.length == target.length,
            s"positional insert needs ${target.length} columns " +
              s"(${target.mkString(",")}), query produces " +
              s"${src.columns.length}")
          assign(src.toDF(target: _*))
        }
    }
    if (overwrite) MiniDelta.overwrite(spark, aligned, table, parts)
    else MiniDelta.append(spark, aligned, table, parts)
    Seq.empty
  }
}

/** Opaque holder keeping not-yet-bound expressions OUT of a command's
  * expression tree: CheckAnalysis walks every Expression-typed field of
  * a command (Seq/Option included) and would reject the unresolved
  * column references BEFORE run() can bind them to the table's frame —
  * the same reason [[GraftInsertCommand]] keeps its source query in
  * innerChildren rather than children. */
final class Unbound[T](val value: T) extends Serializable

/** Guards shared by the SQL write commands. */
private[plans] object GraftDml {
  /** Fold SET assignments keyed by (possibly NESTED) column paths into
    * ONE Column per top-level column — `SET addr.city = 'x', addr.zip
    * = 'y'` rebuilds the struct through `Column.withField` (Delta's
    * nested-update semantics; untouched sibling fields pass through).
    * `entries` carry qualifier-stripped name parts; paths are resolved
    * case-insensitively against the DECLARED schema and canonicalized,
    * so a path into a non-struct or a non-existent field refuses here
    * (withField would silently ADD it). Whole-column + nested
    * assignments to the same column, and duplicate paths, refuse. */
  def foldAssignments(declared: org.apache.spark.sql.types.StructType,
      entries: Seq[(Seq[String], org.apache.spark.sql.Column)],
      op: String): Map[String, org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.StructType
    // canonicalize every path segment against the declared tree
    def resolve(parts: Seq[String]): Seq[String] = {
      var t: org.apache.spark.sql.types.DataType = declared
      parts.map { seg =>
        t match {
          case st: StructType =>
            val f = st.fields.find(_.name.equalsIgnoreCase(seg))
              .getOrElse(throw new IllegalArgumentException(
                s"$op SET references unknown column " +
                  s"${parts.mkString(".")} (no field '$seg' in " +
                  s"${st.fieldNames.mkString(", ")})"))
            t = f.dataType
            f.name
          case other => throw new IllegalArgumentException(
            s"$op SET path ${parts.mkString(".")} descends into " +
              s"${other.simpleString}, which has no fields")
        }
      }
    }
    val resolved = entries.map { case (parts, v) => (resolve(parts), v) }
    resolved.groupBy(_._1.head).map { case (top, es) =>
      val (whole, nested) = es.partition(_._1.length == 1)
      if (whole.nonEmpty) {
        require(es.size == 1,
          s"$op SET assigns column $top more than once")
        top -> whole.head._2
      } else {
        val paths = nested.map(_._1.mkString("."))
        require(paths.distinct.size == paths.size,
          s"$op SET assigns ${paths.diff(paths.distinct).head} twice")
        top -> nested.foldLeft(col(s"`$top`")) { case (acc, (path, v)) =>
          acc.withField(path.tail.map(p => s"`$p`").mkString("."), v)
        }
      }
    }
  }

  /** True when `table` is a plain directory already holding parquet but
    * no `_delta_log`. A first commit there would reference ONLY the
    * newly written files, and every later SELECT (which now sniffs the
    * log) would silently drop the pre-existing rows — so INSERT and
    * MERGE-as-create refuse it, matching the reference's posture of
    * never mutating passthrough objects (src/main.rs:941). Listing is
    * lazy: stops at the first parquet hit; the common first-write
    * target is empty or absent. */
  def rawParquetDir(spark: SparkSession, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(table)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return false
    val it = f.listFiles(p, true)
    var found = false
    while (!found && it.hasNext)
      found = it.next().getPath.getName.endsWith(".parquet")
    found
  }

  def refuseRawDir(spark: SparkSession, table: String, op: String): Unit =
    require(!rawParquetDir(spark, table),
      s"$op into $table refused: the path holds raw parquet with no " +
        "_delta_log, and a first commit would orphan the existing rows. " +
        "Convert it to a governed table first (MiniDelta.convertToDelta) " +
        "or register a fresh path.")

  /** DELETE/UPDATE need an existing governed table: the engine's DML
    * returns a silent no-op sentinel for a missing log, which SQL must
    * surface as an error, not success (a raw-parquet alias visibly HAS
    * rows — "deleted nothing, said ok" would be a silent wrong
    * outcome). */
  def requireTable(spark: SparkSession, table: String, op: String): Unit =
    require(MiniDelta.tableExists(spark, table),
      s"$op needs a governed table; $table has no _delta_log " +
        "(MiniDelta.convertToDelta promotes a raw parquet directory)")
}

/** `DELETE FROM graft.<alias> WHERE ...` routed through
  * [[MiniDelta.delete]] — pushed-predicate blast-radius discovery,
  * copy-on-write or deletion-vector masking per the table's config, the
  * same write contract as the DataFrame path. The condition stays
  * UNRESOLVED here and binds to the table's frame inside the engine
  * (target qualifiers pre-stripped by the rule). */
case class GraftDeleteCommand(table: String,
    condition: Unbound[Expression],
    readOnly: Boolean = true) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    GraftDml.requireTable(spark, table, "DELETE")
    MiniDelta.delete(spark, table,
      org.apache.spark.sql.graft.ColumnBridge.column(condition.value),
      MiniDelta.partitionColumns(spark, table))
    Seq.empty
  }
}

/** `UPDATE graft.<alias> SET c = expr, ... [WHERE ...]` routed through
  * [[MiniDelta.update]] (single-projection SET: every right-hand side
  * and the predicate see the pre-update row — standard SQL UPDATE
  * semantics). SET targets resolve against the declared schema
  * case-insensitively, like every other Spark identifier. */
case class GraftUpdateCommand(table: String,
    assignments: Unbound[Seq[Assignment]],
    condition: Unbound[Option[Expression]],
    targetQuals: Set[String] = Set.empty, readOnly: Boolean = true)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    GraftDml.requireTable(spark, table, "UPDATE")
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    val declared = MiniDelta.latestSchema(spark, table)
      .getOrElse(throw new IllegalStateException(
        s"$table has a _delta_log but no declared schema"))
    val declaredLc = declared.fieldNames.map(_.toLowerCase).toSet
    // assignment targets may be nested paths (SET addr.city = ...) and
    // may carry the target qualifier; strip it here (the rule strips
    // only VALUE expressions) with the same ambiguity refusal as
    // conditions, then fold nested paths into one struct rebuild per
    // top-level column
    val entries = assignments.value.map { a =>
      val parts = a.key match {
        case u: UnresolvedAttribute => u.nameParts
        case other => throw new IllegalArgumentException(
          s"UPDATE SET target must be a column, got ${other.sql}")
      }
      val np =
        if (parts.length > 1 && targetQuals.contains(parts.head.toLowerCase)) {
          if (declaredLc.contains(parts.head.toLowerCase))
            throw new IllegalArgumentException(
              s"ambiguous reference ${parts.mkString(".")}: " +
                s"'${parts.head}' names both the UPDATE target and a " +
                "table column — alias the target differently")
          parts.tail
        } else parts
      (np, bridge.column(a.value))
    }
    val set = GraftDml.foldAssignments(declared, entries, "UPDATE")
    val pred = condition.value.map(bridge.column)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    MiniDelta.update(spark, table, pred, set,
      MiniDelta.partitionColumns(spark, table))
    Seq.empty
  }
}

/** Shared DDL plumbing for SQL CREATE TABLE (catalog path), CTAS (rule
  * path), ADD COLUMNS and DROP TABLE. The reference has no DDL at all —
  * tables are config-registered (/root/reference/src/config.rs:7) — so
  * this is extension surface, scoped to what a SQL-first user hits in
  * minute one: create an alias from SQL, evolve its schema, drop it. */
object GraftDdl {
  import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, UnresolvedIdentifier}
  import org.apache.spark.sql.connector.expressions.Transform

  /** CREATE TABLE's name plan → (graft?, alias); None for non-graft
    * names. Matched both before catalog resolution (UnresolvedIdentifier
    * with the raw parts) and after (ResolvedIdentifier bound to the
    * graft catalog), since the rule shares the resolution fixpoint. */
  def identOf(name: LogicalPlan): Option[String] = name match {
    case u: UnresolvedIdentifier => aliasOf(u.nameParts)
    case r: ResolvedIdentifier if r.catalog.name.equalsIgnoreCase("graft") =>
      aliasOf("graft" +: (r.identifier.namespace.toSeq :+ r.identifier.name))
    case _ => None
  }

  private def aliasOf(parts: Seq[String]): Option[String] =
    parts.map(_.toLowerCase) match {
      case Seq("graft", t) => Some(t)
      case Seq("graft", "datalake", t) => Some(t)
      case _ => None
    }

  /** Partition transforms → column names; only identity (plain
    * `PARTITIONED BY (col)`) is expressible in a Hive layout. */
  def identityCols(transforms: Seq[Transform]): Seq[String] =
    transforms.map {
      case t if t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        t.references.head.fieldNames.head
      case other => throw new UnsupportedOperationException(
        s"graft tables support identity partitioning only, got $other")
    }

  /** CREATE TABLE's transform array split into (partition columns,
    * clustering columns): Spark delivers `CLUSTER BY (a, b)` as a
    * ClusterByTransform riding the same partitions array as the
    * identity transforms of `PARTITIONED BY`. */
  def partitionAndClusterCols(transforms: Seq[Transform])
      : (Seq[String], Seq[String]) = {
    val (cluster, rest) = transforms.partition {
      case _: org.apache.spark.sql.connector.expressions
        .ClusterByTransform => true
      case _ => false
    }
    val clusterCols = cluster.flatMap {
      case c: org.apache.spark.sql.connector.expressions
        .ClusterByTransform =>
        c.columnNames.map { r =>
          require(r.fieldNames.length == 1,
            "graft CLUSTER BY supports top-level columns only " +
              s"(got nested ${r.fieldNames.mkString(".")})")
          r.fieldNames.head
        }
      case _ => Nil
    }
    (identityCols(rest), clusterCols)
  }

  /** Default location root for SQL-created tables:
    * `spark.sql.catalog.graft.warehouse` (the catalog's option key). */
  def warehouse(spark: SparkSession): Option[String] =
    spark.conf.getOption("spark.sql.catalog.graft.warehouse")

  /** Create the physical table + register the alias. SQL-created
    * aliases register WRITABLE — the user who just created a table
    * expects to insert into it; config-registered aliases keep the
    * reference's read-only default. */
  def create(spark: SparkSession, alias: String,
             schema: org.apache.spark.sql.types.StructType,
             partCols: Seq[String], location: Option[String],
             properties: Map[String, String],
             clusterBy: Seq[String] = Nil): String = {
    val a = alias.toLowerCase
    if (GraftSqlTables.resolve(Seq("graft", a)).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(Seq("graft", a))
    val path = location
      .orElse(warehouse(spark).map(w => s"${w.stripSuffix("/")}/$a"))
      .getOrElse(throw new IllegalArgumentException(
        "CREATE TABLE on the graft catalog needs LOCATION '<path>' or " +
          "the catalog warehouse conf " +
          "(spark.sql.catalog.graft.warehouse=<root>)"))
    // only delta.* TBLPROPERTIES are table config; Spark's bookkeeping
    // properties (provider, owner, ...) stay out of the log
    MiniDelta.createTable(spark, path, translateColumnSpecs(schema),
      partCols, properties.filter(_._1.startsWith("delta.")),
      clusterBy = clusterBy)
    GraftSqlTables.register(a, path, readOnly = false)
    path
  }

  /** REPLACE TABLE semantics over the registry: a registered alias
    * keeps its path and history (the engine commit swaps the contract
    * and tombstones the contents); an unregistered one creates, but
    * only under the OR CREATE form — bare REPLACE on a missing table
    * refuses, Spark's own rule. */
  def replace(spark: SparkSession, alias: String,
              schema: org.apache.spark.sql.types.StructType,
              partCols: Seq[String], location: Option[String],
              properties: Map[String, String], orCreate: Boolean): String = {
    val a = alias.toLowerCase
    GraftSqlTables.resolve(Seq("graft", a)) match {
      case Some(e) =>
        if (e.readOnly) throw new MiniDelta.ReadOnlyTableException(e.path)
        // identity stays put: an explicit LOCATION differing from the
        // registered path would silently fork the table
        location.foreach(l => require(l == e.path,
          s"REPLACE TABLE: LOCATION '$l' differs from alias '$a''s " +
            s"registered path '${e.path}'"))
        GraftDml.requireTable(spark, e.path, "REPLACE TABLE")
        MiniDelta.replaceTable(spark, e.path,
          translateColumnSpecs(schema), partCols,
          properties.filter(_._1.startsWith("delta.")))
        MiniDelta.invalidateSnapshot(e.path)
        e.path
      case None =>
        if (!orCreate)
          throw new org.apache.spark.sql.catalyst.analysis
            .NoSuchTableException(Seq("graft", a))
        create(spark, alias, schema, partCols, location, properties)
    }
  }

  /** `GENERATED ALWAYS AS (...)` / `GENERATED ... AS IDENTITY` column
    * clauses reach the catalog under SPARK's v2-conversion metadata
    * keys (CatalogV2Util); translate them to the Delta field-metadata
    * keys the engine's writers uphold, so a SQL-declared generated or
    * identity column behaves exactly like an API-declared one — and
    * like one a real Delta writer declared. */
  def translateColumnSpecs(st: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val sparkKeys =
      Seq("GENERATION_EXPRESSION", "identity.start")
    StructType(st.fields.map { f =>
      if (!sparkKeys.exists(f.metadata.contains)) f
      else {
        val b = new MetadataBuilder().withMetadata(f.metadata)
        if (f.metadata.contains("GENERATION_EXPRESSION")) {
          b.putString("delta.generationExpression",
            f.metadata.getString("GENERATION_EXPRESSION"))
          b.remove("GENERATION_EXPRESSION")
        }
        if (f.metadata.contains("identity.start")) {
          b.putLong("delta.identity.start",
            f.metadata.getLong("identity.start"))
          b.remove("identity.start")
          if (f.metadata.contains("identity.step")) {
            b.putLong("delta.identity.step",
              f.metadata.getLong("identity.step"))
            b.remove("identity.step")
          }
          if (f.metadata.contains("identity.allowExplicitInsert")) {
            if (f.metadata.getBoolean("identity.allowExplicitInsert"))
              b.putBoolean("delta.identity.allowExplicitInsert", true)
            b.remove("identity.allowExplicitInsert")
          }
        }
        f.copy(metadata = b.build())
      }
    })
  }
}

/** `CREATE TABLE graft.<alias> ... AS SELECT ...` (rule-intercepted):
  * creates the table from the query's schema, then appends the rows —
  * one command, the engine's own create + write contract. */
case class GraftCreateTableCommand(alias: String, query: LogicalPlan,
    partCols: Seq[String], location: Option[String],
    properties: Map[String, String], ignoreIfExists: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    if (GraftSqlTables.resolve(Seq("graft", alias)).isDefined) {
      if (ignoreIfExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(Seq("graft", alias))
    }
    val src = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, query)
    val path = GraftDdl.create(spark, alias, src.schema, partCols,
      location, properties)
    MiniDelta.append(spark, src, path, partCols)
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> ADD COLUMNS (...)` routed through
  * [[MiniDelta.addColumns]] — one metadata commit, existing files read
  * the new columns as null. */
case class GraftAddColumnsCommand(table: String,
    cols: Seq[(Seq[String], org.apache.spark.sql.types.StructField,
      Option[Option[String]])],
    readOnly: Boolean = true) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    GraftDml.requireTable(spark, table, "ALTER TABLE ADD COLUMNS")
    MiniDelta.addColumnsPositioned(spark, table, cols)
    Seq.empty
  }
}

/** `MERGE INTO graft.<alias> t USING src s ON t.k = s.k WHEN MATCHED
  * THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` — the canonical
  * keyed upsert, routed through [[MiniDelta.merge]] (source
  * key-uniqueness enforced, create on first merge). The source plan
  * analyzes inside [[run]] so it may itself read graft aliases.
  * Schema evolution (source-only columns appended to the target)
  * requires the explicit `WITH SCHEMA EVOLUTION` clause, as in real
  * Delta — without it, extra source columns refuse by name. */
case class GraftMergeCommand(table: String, source: LogicalPlan,
    keys: Seq[String], withSchemaEvolution: Boolean,
    readOnly: Boolean = true)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    // only a CREATE-by-merge can orphan rows; an existing governed
    // table legitimately holds parquet under its root
    if (!MiniDelta.tableExists(spark, table))
      GraftDml.refuseRawDir(spark, table, "MERGE")
    val src = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, source)
    MiniDelta.latestSchema(spark, table).foreach { declared =>
      if (!withSchemaEvolution) {
        val known = declared.fieldNames.map(_.toLowerCase).toSet
        val extra = src.columns.filterNot(c => known(c.toLowerCase))
        require(extra.isEmpty,
          s"MERGE source carries column(s) not in the target schema: " +
            s"${extra.mkString(", ")} — add WITH SCHEMA EVOLUTION to " +
            "append them, or drop them from the source")
        // nested growth is evolution too (Delta's rule): a source
        // struct column carrying MORE nested fields than the target's
        // needs the same explicit opt-in
        val widens = declared.fields.flatMap { f =>
          src.schema.fields.find(_.name.equalsIgnoreCase(f.name))
            .filterNot(sf => org.apache.spark.sql.types.DataType
              .equalsIgnoreNullability(sf.dataType, f.dataType))
            .filter(sf => MiniDelta
              .mergeStructTypes(f.dataType, sf.dataType)
              .exists(_ != f.dataType))
            .map(_ => f.name)
        }
        require(widens.isEmpty,
          s"MERGE source would grow nested field(s) inside column(s) " +
            s"${widens.mkString(", ")} — add WITH SCHEMA EVOLUTION to " +
            "evolve them")
      }
    }
    MiniDelta.merge(spark, table, src, keys,
      MiniDelta.partitionColumns(spark, table))
    Seq.empty
  }
}

/** `MERGE INTO graft.<alias> t USING src s ON t.k = s.k WHEN MATCHED
  * [AND cond] THEN DELETE` (the keyed anti-delete) or `WHEN NOT
  * MATCHED BY SOURCE [AND cond] THEN DELETE` (`bySource` — the
  * sync-delete), each alone, routed through [[MiniDelta.mergeDelete]].
  * The source analyzes inside [[run]] so it may itself read graft
  * aliases. */
case class GraftMergeDeleteCommand(table: String, source: LogicalPlan,
    keys: Seq[String], condition: Unbound[Option[Expression]],
    readOnly: Boolean = true, bySource: Boolean = false)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    GraftDml.requireTable(spark, table, "MERGE")
    val src = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, source)
    MiniDelta.mergeDelete(spark, table, src, keys,
      MiniDelta.partitionColumns(spark, table),
      condition.value.map(
        org.apache.spark.sql.graft.ColumnBridge.column),
      bySource = bySource)
    Seq.empty
  }
}

/** Rule-time capture of one general-MERGE WHEN clause: the raw parser
  * expressions ride to RUN time, where the analyzed source's columns
  * are known and binding to [[MiniDelta.mergeClauses]]'s combined
  * namespace can resolve unqualified and star references. */
private[plans] sealed trait RawMergeAction extends Serializable
private[plans] case class RawUpdate(
    assignments: Seq[(Seq[String], Expression)]) extends RawMergeAction
private[plans] case object RawUpdateStar extends RawMergeAction
private[plans] case object RawDelete extends RawMergeAction
private[plans] case class RawInsert(
    assignments: Seq[(Seq[String], Expression)]) extends RawMergeAction
private[plans] case object RawInsertStar extends RawMergeAction
private[plans] case class RawMergeClause(cond: Option[Expression],
    action: RawMergeAction) extends Serializable

/** The GENERAL `MERGE INTO` (any clause combination beyond the three
  * dedicated fast paths), routed through [[MiniDelta.mergeClauses]]:
  * conditional multi-clause `WHEN MATCHED THEN UPDATE SET .../DELETE`,
  * `WHEN NOT MATCHED [BY TARGET] THEN INSERT ...`, and `WHEN NOT
  * MATCHED BY SOURCE THEN UPDATE SET .../DELETE`, first-applicable-
  * clause-wins per row. Qualifier binding: `t.x` → target column `x`,
  * `s.x` → the engine's `__src_x` (matched clauses) or plain source
  * `x` (insert clauses); unqualified names bind target-first in
  * matched clauses, source-only in insert clauses, target-only in
  * by-source clauses (Delta's scoping rules). */
case class GraftMergeClausesCommand(table: String, source: LogicalPlan,
    keys: Seq[String],
    matched: Unbound[Seq[RawMergeClause]],
    notMatched: Unbound[Seq[RawMergeClause]],
    bySource: Unbound[Seq[RawMergeClause]],
    targetQuals: Set[String], sourceQuals: Set[String],
    declaredCols: Set[String],
    readOnly: Boolean = true,
    // `WITH SCHEMA EVOLUTION` (r16): star expansions also map
    // source-only columns, explicit assignments may target columns the
    // table has not declared — [[MiniDelta.mergeClauses]] appends them
    withSchemaEvolution: Boolean = false)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.graft.ColumnBridge
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    if (!MiniDelta.tableExists(spark, table))
      GraftDml.refuseRawDir(spark, table, "MERGE")
    val src = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, source)
    val srcCols = src.columns.map(_.toLowerCase).toSet
    val declared = MiniDelta.latestSchema(spark, table)

    // contexts: "matched" (combined namespace), "insert" (plain source
    // frame), "bysource" (target frame only)
    def bind(e: Expression, ctx: String): Expression = e.transform {
      case u: UnresolvedAttribute =>
        val head = u.nameParts.head.toLowerCase
        if (u.nameParts.length > 1 && sourceQuals.contains(head)) ctx match {
          case "insert" => UnresolvedAttribute(u.nameParts.tail)
          case "bysource" => throw new IllegalArgumentException(
            "WHEN NOT MATCHED BY SOURCE cannot reference source " +
              s"column ${u.nameParts.mkString(".")}")
          case _ => UnresolvedAttribute(
            (MiniDelta.MergeSrcPrefix + u.nameParts(1)) +:
              u.nameParts.drop(2))
        } else if (u.nameParts.length > 1 && targetQuals.contains(head)) {
          if (declaredCols.contains(head))
            throw new IllegalArgumentException(
              s"ambiguous reference ${u.nameParts.mkString(".")}: " +
                s"'${u.nameParts.head}' names both the MERGE target and " +
                "a table column — alias the target differently")
          if (ctx == "insert") throw new IllegalArgumentException(
            "MERGE INSERT values cannot reference target column " +
              u.nameParts.mkString("."))
          UnresolvedAttribute(u.nameParts.tail)
        } else if (u.nameParts.length == 1 && ctx == "matched" &&
            !declaredCols.contains(head) && srcCols.contains(head)) {
          // unqualified, not a target column, present on the source:
          // bind the source side (target-first otherwise)
          UnresolvedAttribute(Seq(MiniDelta.MergeSrcPrefix + u.nameParts.head))
        } else u
    }
    def bindC(e: Expression, ctx: String) = ColumnBridge.column(bind(e, ctx))

    def targetParts(parts: Seq[String]): Seq[String] =
      if (parts.length > 1 && targetQuals.contains(parts.head.toLowerCase))
        parts.tail
      else parts
    def targetName(parts: Seq[String]): String = {
      val np = targetParts(parts)
      require(np.length == 1,
        s"MERGE INSERT column ${parts.mkString(".")} must be " +
          "top-level")
      np.head
    }
    // UPDATE assignments may target nested paths (SET addr.city = ...),
    // folded into one struct rebuild per top-level column — the same
    // helper (and semantics) as UPDATE's
    def setOf(assigns: Seq[(Seq[String], Expression)], ctx: String)
        : Map[String, org.apache.spark.sql.Column] = {
      val d = declared.getOrElse(throw new IllegalArgumentException(
        s"general MERGE needs a declared schema on $table"))
      val bound = assigns.map { case (parts, v) =>
        (targetParts(parts), bindC(v, ctx)) }
      // WITH SCHEMA EVOLUTION: a top-level target the table has not
      // declared bypasses the nested-path folding (there is no
      // existing struct to rebuild) and rides as a plain new-column
      // assignment for the engine to append
      val (fresh, known) = bound.partition { case (parts, _) =>
        withSchemaEvolution && parts.length == 1 &&
          !d.fieldNames.exists(_.equalsIgnoreCase(parts.head)) }
      fresh.groupBy(_._1.head.toLowerCase).foreach { case (_, es) =>
        require(es.size == 1,
          s"MERGE SET assigns column ${es.head._1.head} more than once")
      }
      (if (known.isEmpty) Map.empty[String, org.apache.spark.sql.Column]
       else GraftDml.foldAssignments(d, known, "MERGE")) ++
        fresh.map { case (parts, v) => parts.head -> v }
    }
    // star expansions map each assignable declared column from its
    // same-name source column; generated/identity columns are excluded
    // (they recompute / keep the target's value — Delta's rule)
    def starSet(prefix: String): Map[String,
        org.apache.spark.sql.Column] = {
      val d = declared.getOrElse(throw new IllegalArgumentException(
        s"MERGE ... SET */INSERT * needs a declared schema on $table"))
      val base = d.fields.toIndexedSeq
        .filterNot(f => f.metadata.contains("delta.generationExpression")
          || f.metadata.contains("delta.identity.start"))
        .map { f =>
          val sc = src.columns.find(_.equalsIgnoreCase(f.name)).getOrElse(
            throw new IllegalArgumentException(
              s"MERGE star clause needs source column ${f.name}"))
          f.name -> org.apache.spark.sql.functions.col(s"`$prefix$sc`")
        }.toMap
      // WITH SCHEMA EVOLUTION: the star also maps every SOURCE-only
      // column — delta-spark's autoMerge star rule — which the engine
      // then appends to the target schema
      if (!withSchemaEvolution) base
      else base ++ src.columns.toIndexedSeq
        .filterNot(c => d.fieldNames.exists(_.equalsIgnoreCase(c)))
        .map(c => c -> org.apache.spark.sql.functions.col(s"`$prefix$c`"))
    }

    val mClauses = matched.value.map { rc =>
      val c = rc.cond.map(bindC(_, "matched"))
      rc.action match {
        case RawUpdate(assigns) =>
          MiniDelta.MergeMatchedClause(c, Some(setOf(assigns, "matched")))
        case RawUpdateStar =>
          MiniDelta.MergeMatchedClause(c,
            Some(starSet(MiniDelta.MergeSrcPrefix)))
        case RawDelete => MiniDelta.MergeMatchedClause(c, None)
        case other => throw new IllegalArgumentException(
          s"WHEN MATCHED supports UPDATE/DELETE, got $other")
      }
    }
    val iClauses = notMatched.value.map { rc =>
      val c = rc.cond.map(bindC(_, "insert"))
      rc.action match {
        case RawInsert(assigns) =>
          // INSERT targets are top-level columns (targetName refuses
          // nested — there is no existing struct to rebuild from)
          MiniDelta.MergeInsertClause(c, assigns.map { case (parts, v) =>
            targetName(parts) -> bindC(v, "insert") }.toMap)
        case RawInsertStar =>
          MiniDelta.MergeInsertClause(c, starSet(""))
        case other => throw new IllegalArgumentException(
          s"WHEN NOT MATCHED supports INSERT, got $other")
      }
    }
    val bClauses = bySource.value.map { rc =>
      val c = rc.cond.map(bindC(_, "bysource"))
      rc.action match {
        case RawUpdate(assigns) =>
          MiniDelta.MergeBySourceClause(c, Some(setOf(assigns, "bysource")))
        case RawDelete => MiniDelta.MergeBySourceClause(c, None)
        case other => throw new IllegalArgumentException(
          s"WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE, got $other")
      }
    }
    MiniDelta.mergeClauses(spark, table, src, keys, mClauses, iClauses,
      bClauses, MiniDelta.partitionColumns(spark, table),
      evolveSchema = withSchemaEvolution)
    Seq.empty
  }
}

/** `SHOW PARTITIONS graft.<alias>` routed through
  * [[MiniDelta.showPartitions]] — Spark's wire shape (one `k=v/k=v`
  * string row, sorted), sourced from log metadata, never a directory
  * walk. The driver collect is partition-tuple-scale (thousands), not
  * file-scale. */
case class GraftShowPartitionsCommand(table: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] =
    Seq(AttributeReference("partition", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    MiniDelta.showPartitions(spark, table).collect().toSeq
}

/** `SHOW TBLPROPERTIES graft.<alias> [('key')]` — the table's
  * configuration (the `delta.*` properties the log carries), sorted;
  * with an explicit key, just that row (absent key -> zero rows, the
  * DSv2 exec's contract). Raw parquet aliases report no properties. */
case class GraftShowTablePropertiesCommand(table: String,
    propertyKey: Option[String]) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val props = MiniDelta.tableConfig(spark, table)
    propertyKey match {
      case Some(k) => props.get(k).map(v => Row(k, v)).toSeq
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** `TRUNCATE TABLE graft.<alias>` → [[MiniDelta.truncate]]: one
  * streamed metadata commit tombstoning every live file; schema,
  * layout and properties survive. */
case class GraftTruncateCommand(table: String, readOnly: Boolean)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.Attribute
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    GraftDml.requireTable(spark, table, "TRUNCATE TABLE")
    MiniDelta.truncate(spark, table, readOnly)
    MiniDelta.invalidateSnapshot(table)
    Seq.empty
  }
}

/** `SHOW COLUMNS FROM graft.<alias>` — the declared (logical) column
  * names; raw parquet aliases fall back to the footer schema. Matches
  * Spark's single-`col_name`-column output shape. */
case class GraftShowColumnsCommand(table: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] =
    Seq(AttributeReference("col_name", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val schema = MiniDelta.latestSchema(spark, table)
      .getOrElse(spark.read.parquet(table).schema)
    schema.fieldNames.toSeq.map(Row(_))
  }
}

/** `SHOW CREATE TABLE graft.<alias>` — the re-runnable DDL for the
  * declared contract: columns (logical names + NOT NULL), USING delta,
  * partition layout, LOCATION, and the `delta.*` TBLPROPERTIES. Raw
  * parquet aliases render from the footer schema with no properties.
  * Spark's single-`createtab_stmt`-column output shape. */
case class GraftShowCreateTableCommand(alias: String, table: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] =
    Seq(AttributeReference("createtab_stmt", StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val schema = MiniDelta.latestSchema(spark, table)
      .getOrElse(spark.read.parquet(table).schema)
    // full-fidelity column clauses: DEFAULT, GENERATED ALWAYS AS
    // (expr), and IDENTITY specs render back out, so the statement
    // re-creates the table's whole write contract, not just its shape
    val cols = schema.fields.map { f =>
      val m = f.metadata
      val dflt =
        if (!m.contains("CURRENT_DEFAULT")) ""
        else s" DEFAULT ${m.getString("CURRENT_DEFAULT")}"
      val gen =
        if (m.contains("delta.generationExpression"))
          s" GENERATED ALWAYS AS " +
            s"(${m.getString("delta.generationExpression")})"
        else if (m.contains("delta.identity.start")) {
          val st = m.getLong("delta.identity.start")
          val sp =
            if (m.contains("delta.identity.step"))
              m.getLong("delta.identity.step")
            else 1L
          val kind =
            if (m.contains("delta.identity.allowExplicitInsert") &&
                m.getBoolean("delta.identity.allowExplicitInsert"))
              "BY DEFAULT" else "ALWAYS"
          s" GENERATED $kind AS IDENTITY " +
            s"(START WITH $st INCREMENT BY $sp)"
        } else ""
      s"  `${f.name}` ${f.dataType.sql}" +
        (if (f.nullable) "" else " NOT NULL") + dflt + gen
    }.mkString(",\n")
    val parts = MiniDelta.partitionColumns(spark, table)
    val partClause =
      if (parts.isEmpty) ""
      else parts.mkString("\nPARTITIONED BY (", ", ", ")")
    val clusterCols = MiniDelta.clusteringColumns(spark, table)
    val clusterClause =
      if (clusterCols.isEmpty) ""
      else clusterCols.map(c => s"`$c`")
        .mkString("\nCLUSTER BY (", ", ", ")")
    val props = MiniDelta.tableConfig(spark, table).toSeq.sortBy(_._1)
    val propClause =
      if (props.isEmpty) ""
      else props.map { case (k, v) => s"  '$k' = '$v'" }
        .mkString("\nTBLPROPERTIES (\n", ",\n", ")")
    Seq(Row(
      s"CREATE TABLE graft.$alias (\n$cols)\nUSING delta" +
        s"$partClause$clusterClause\nLOCATION '$table'$propClause"))
  }
}

/** `[CREATE OR] REPLACE TABLE graft.<alias> (...)` →
  * [[GraftDdl.replace]]: swap-and-truncate on a registered alias,
  * plain CREATE on an unregistered one (OR CREATE form only). */
case class GraftReplaceTableCommand(alias: String,
    tableSchema: org.apache.spark.sql.types.StructType,
    partCols: Seq[String], location: Option[String],
    properties: Map[String, String], orCreate: Boolean)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.Attribute
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    GraftDdl.replace(spark, alias, tableSchema, partCols, location,
      properties, orCreate)
    Seq.empty
  }
}

/** `CREATE OR REPLACE TABLE graft.<alias> [PARTITIONED BY ...] AS
  * SELECT ...` (rule-intercepted): [[GraftDdl.replace]] swaps the
  * contract and tombstones the old contents in ONE commit on the SAME
  * log, then the query rows append — table identity and history
  * survive, exactly like the column-list REPLACE form.
  *
  * ORDERING CONTRACT (pinned by the "self-referential RTAS" spec): a
  * query reading the table being replaced must see the PRE-replace
  * rows. That holds because `ofRows` ANALYZES the query before
  * `GraftDdl.replace` runs, and analysis pins the graft relation's
  * concrete file list eagerly (readFiltered collects the snapshot
  * manifest at plan-build time); the replace commit only tombstones
  * log entries — the files themselves stay on disk until VACUUM, so
  * the pinned scan still reads them during the post-replace append.
  * If the read path ever goes lazy (deferring the manifest to
  * execution), this command must materialize the source file list (or
  * the rows) BEFORE calling replace — the spec exists to catch exactly
  * that regression. */
case class GraftReplaceTableAsSelectCommand(alias: String,
    query: LogicalPlan, partCols: Seq[String], location: Option[String],
    properties: Map[String, String], orCreate: Boolean)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.Attribute
  override val output: Seq[Attribute] = Seq.empty
  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    // analysis happens HERE — before replace — pinning source files
    val src = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, query)
    val path = GraftDdl.replace(spark, alias, src.schema, partCols,
      location, properties, orCreate)
    MiniDelta.append(spark, src, path, partCols)
    MiniDelta.invalidateSnapshot(path)
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> ADD CONSTRAINT c CHECK (...)` →
  * [[MiniDelta.addConstraint]]: existing rows are validated BEFORE the
  * invariant arms (Delta's rule), duplicates refuse. */
case class GraftAddConstraintCommand(table: String, readOnly: Boolean,
    name: String, condition: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MiniDelta.addConstraint(spark, table, name, condition,
      readOnly = readOnly)
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> DROP CONSTRAINT [IF EXISTS] c` →
  * [[MiniDelta.dropConstraint]]. */
case class GraftDropConstraintCommand(table: String, readOnly: Boolean,
    name: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val known = MiniDelta.tableConfig(spark, table)
      .contains(s"delta.constraints.$name")
    if (!known && ifExists) return Seq.empty
    MiniDelta.dropConstraint(spark, table, name, readOnly = readOnly)
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> RENAME COLUMN a TO b` →
  * [[MiniDelta.renameColumn]] (metadata-only; needs name-mode column
  * mapping, which the engine command explains by name). */
case class GraftRenameColumnCommand(table: String, readOnly: Boolean,
    from: Seq[String], to: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MiniDelta.renameColumn(spark, table, from, to, readOnly = readOnly)
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> CLUSTER BY (cols)` / `CLUSTER BY NONE`
  * → [[MiniDelta.setClusterBy]] (empty cols = NONE). */
case class GraftClusterByCommand(table: String, readOnly: Boolean,
    cols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MiniDelta.setClusterBy(spark, table, cols, readOnly = readOnly)
    Seq.empty
  }
}

/** One ALTER COLUMN change, parsed — each variant maps to one
  * metadata-only engine commit. */
sealed trait GraftColumnChange
object GraftColumnChange {
  /** TYPE <wider> → [[MiniDelta.widenColumnType]] (typeWidening). */
  case class Type(t: org.apache.spark.sql.types.DataType)
    extends GraftColumnChange
  /** SET DEFAULT e / DROP DEFAULT (`None`) →
    * [[MiniDelta.setColumnDefault]]. */
  case class Default(sql: Option[String]) extends GraftColumnChange
  /** COMMENT 'txt' → [[MiniDelta.setColumnComment]] ('' clears). */
  case class Comment(text: String) extends GraftColumnChange
  /** DROP NOT NULL (true) → [[MiniDelta.setColumnNullability]];
    * SET NOT NULL (false) refuses there with the CHECK guidance. */
  case class Nullability(nullable: Boolean) extends GraftColumnChange
  /** FIRST (`None`) / AFTER other (`Some`) →
    * [[MiniDelta.moveColumn]]. */
  case class Position(after: Option[String]) extends GraftColumnChange
}

/** `ALTER TABLE graft.<alias> ALTER COLUMN c <change>` — one engine
  * commit per change, in statement order. */
case class GraftAlterColumnCommand(table: String, readOnly: Boolean,
    changes: Seq[(Seq[String], GraftColumnChange)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    changes.foreach {
      case (c, GraftColumnChange.Type(t)) =>
        MiniDelta.widenColumnType(spark, table, c, t, readOnly = readOnly)
      case (c, GraftColumnChange.Default(sql)) =>
        MiniDelta.setColumnDefault(spark, table, c, sql,
          readOnly = readOnly)
      case (c, GraftColumnChange.Comment(txt)) =>
        MiniDelta.setColumnComment(spark, table, c, txt,
          readOnly = readOnly)
      case (c, GraftColumnChange.Nullability(n)) =>
        MiniDelta.setColumnNullability(spark, table, c, n,
          readOnly = readOnly)
      case (c, GraftColumnChange.Position(after)) =>
        MiniDelta.moveColumn(spark, table, c, after,
          readOnly = readOnly)
    }
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> DROP COLUMN a [, b ...]` →
  * [[MiniDelta.dropColumn]] per column, in order. */
case class GraftDropColumnsCommand(table: String, readOnly: Boolean,
    names: Seq[Seq[String]]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    names.foreach(MiniDelta.dropColumn(spark, table, _,
      readOnly = readOnly))
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> REPLACE COLUMNS (c1 T1, ...)` →
  * [[MiniDelta.replaceColumns]] (metadata-only; needs column
  * mapping, which the engine verb explains by name). */
case class GraftReplaceColumnsCommand(table: String,
    cols: Seq[org.apache.spark.sql.types.StructField],
    readOnly: Boolean = true) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (readOnly) throw new MiniDelta.ReadOnlyTableException(table)
    GraftDml.requireTable(spark, table, "ALTER TABLE REPLACE COLUMNS")
    MiniDelta.replaceColumns(spark, table, cols)
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> SET TBLPROPERTIES (...)` →
  * [[MiniDelta.setTableProperties]] (one metaData commit; enabling DVs
  * emits the table-feature protocol upgrade), under the alias's
  * read-only posture. */
case class GraftSetPropertiesCommand(table: String, readOnly: Boolean,
    properties: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MiniDelta.setTableProperties(spark, table, properties,
      readOnly = readOnly)
    Seq.empty
  }
}

/** `ALTER TABLE graft.<alias> UNSET TBLPROPERTIES [IF EXISTS] (...)` →
  * [[MiniDelta.unsetTableProperties]]. */
case class GraftUnsetPropertiesCommand(table: String, readOnly: Boolean,
    keys: Seq[String], ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MiniDelta.unsetTableProperties(spark, table, keys, ifExists = ifExists,
      readOnly = readOnly)
    Seq.empty
  }
}

/** `DESCRIBE [EXTENDED] graft.<alias>` — the declared schema (latest
  * metaData action; parquet footer schema for a raw-parquet alias) in
  * Spark's three-column DESCRIBE shape, a `# Partition Information`
  * section when partitioned, and under EXTENDED the engine's detail
  * block (location, format, posture). Metadata only. */
case class GraftDescribeTableCommand(table: String, readOnly: Boolean,
    isExtended: Boolean) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val governed = MiniDelta.tableExists(spark, table)
    val schema = MiniDelta.latestSchema(spark, table)
      .getOrElse(spark.read.parquet(table).schema)
    def commentOf(f: org.apache.spark.sql.types.StructField): String =
      if (f.metadata.contains("comment")) f.metadata.getString("comment")
      else null
    val cols = schema.map(f =>
      Row(f.name, f.dataType.simpleString, commentOf(f)))
    val parts = MiniDelta.partitionColumns(spark, table)
    val partSection =
      if (parts.isEmpty) Seq.empty
      else Row("# Partition Information", "", "") +:
        Row("# col_name", "data_type", "comment") +:
        parts.map { p =>
          val f = schema.find(_.name.equalsIgnoreCase(p))
          Row(p, f.map(_.dataType.simpleString).getOrElse("string"),
            f.map(commentOf).orNull)
        }
    val extSection =
      if (!isExtended) Seq.empty
      else Seq(
        Row("", "", ""),
        Row("# Detailed Table Information", "", ""),
        Row("Location", table, ""),
        Row("Provider", if (governed) "graft-delta" else "parquet", ""),
        Row("Read Only", readOnly.toString, ""))
    cols ++ partSection ++ extSection
  }
}

/** `table_changes('alias', start [, end])` — Delta's SQL surface for
  * the change feed, registered as a real table-valued function
  * (`injectTableFunction`, the same mechanism delta-spark uses) so
  * Spark's own TVF resolution serves it — no resolution-rule ordering
  * race against `ResolveTableValuedFunctions`, which throws on unknown
  * functions before injected rules run.
  *
  * The first argument names a registered graft alias — bare
  * (`'trades'`) or qualified (`'graft[.datalake].trades'`). Bounds are
  * commit versions (integer literals) or timestamps (string/timestamp
  * literals): the START bound resolves to the FIRST commit at or after
  * the timestamp (Delta's starting-timestamp rule; predating the table
  * -> version 0), the END bound to the LAST commit at or before it
  * (the time-travel rule). Output is [[MiniDelta.readCdf]]'s row-level
  * feed — table columns, `_change_type`, `_commit_version` — plus
  * `_commit_timestamp` joined broadcast from the window's commitInfo
  * timestamps (metadata-scale, O(window)). The engine reconstructs the
  * feed from commit file actions, so the `delta.enableChangeDataFeed`
  * property is not required — strictly more capable than real Delta's
  * refusal, documented divergence. */
object GraftTableChanges {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  def build(spark: SparkSession, args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"table_changes(table, start [, end]) takes 2 or 3 arguments; " +
        s"got ${args.length}")
    val entry = (args.head match {
      case Literal(s, StringType) if s != null =>
        val parts = s.toString.split('.').toSeq
        GraftSqlTables.resolve(parts)
          .orElse(GraftSqlTables.resolve("graft" +: parts))
      case other => throw new IllegalArgumentException(
        s"table_changes: the table must be a string literal, got " +
          s"${other.sql}")
    }).getOrElse(throw new IllegalArgumentException(
      s"table_changes: ${args.head.sql} is not a registered graft alias"))
    val startV = bound(spark, entry.path, args(1), isEnd = false)
    val endV =
      if (args.length == 3) bound(spark, entry.path, args(2), isEnd = true)
      else Long.MaxValue
    val cdf = MiniDelta.readCdf(spark, entry.path, startV - 1L, endV)
    val vts = MiniDelta.commitTimestamps(spark, entry.path, startV, endV)
    val tsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(vts.toSeq.map { case (v, ms) =>
        Row(v, new java.sql.Timestamp(ms)) }, 1),
      StructType(Seq(StructField("_commit_version", LongType),
        StructField("_commit_timestamp", TimestampType))))
    import org.apache.spark.sql.functions.{broadcast, col}
    cdf.join(broadcast(tsDf), Seq("_commit_version"), "left")
      .select(cdf.columns.map(col).toSeq :+ col("_commit_timestamp"): _*)
      .queryExecution.analyzed
  }

  private def bound(spark: SparkSession, path: String, e: Expression,
                    isEnd: Boolean): Long = {
    require(e.resolved && e.foldable,
      s"table_changes bounds must be literals, got ${e.sql}")
    e.dataType match {
      case org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType | LongType =>
        Cast(e, LongType).eval(null).asInstanceOf[Long]
      case StringType | TimestampType =>
        val micros = Cast(e, TimestampType,
          Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
        require(micros != null,
          s"table_changes bound ${e.sql} is not a valid timestamp")
        val ms = micros.asInstanceOf[Long] / 1000L
        if (isEnd) MiniDelta.versionAtTimestamp(spark, path, ms)
        else
          (try MiniDelta.versionAtTimestamp(spark, path, ms - 1) + 1L
          catch { case _: IllegalArgumentException => 0L })
      case other => throw new IllegalArgumentException(
        s"table_changes bounds must be versions or timestamps, got " +
          s"${e.sql}: $other")
    }
  }
}
