package graft.plans

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Names the `graft` catalog so multi-part identifiers
  * (`graft.datalake.t`) survive Spark's eager catalog resolution: with
  * no catalog of that name, the session catalog would reject the
  * two-part namespace (`requiresSinglePartNamespace`) in the same
  * analyzer iteration BEFORE [[GraftSqlRule]] could rewrite the
  * relation. Registered via
  * `spark.sql.catalog.graft=graft.plans.GraftCatalog` (Verify, Bench,
  * and TestSpark set it; a deployment adds one conf line).
  *
  * Tables deliberately resolve to "not found" here: `loadTable` always
  * throws, which Spark's relation resolution treats as "leave the
  * relation unresolved" — and the injected [[GraftSqlRule]], running
  * later in the same resolution batch, inlines the governed MiniDelta /
  * parquet scan instead. Routing reads through the rule (not the DSv2
  * load path) keeps SELECT, time travel, and INSERT on the exact same
  * code path for 2-part and 3-part names, with the alias registry
  * ([[GraftSqlTables]]) as the single source of truth
  * (/root/reference/src/config.rs:7 — alias -> storage mapping;
  * src/main.rs:115-141 — the one virtual bucket).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {
  private var catalogName: String = "graft"

  /** CREATE TABLE may declare `GENERATED ALWAYS AS (...)` and
    * `GENERATED ... AS IDENTITY` columns — Spark forwards their specs
    * (validated for determinism on its side) through the v2-column
    * metadata keys, which [[GraftDdl.translateColumnSpecs]] rewrites to
    * the Delta field-metadata keys the engine's writers uphold. */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE)

  /** Lifecycle maintenance via SQL `CALL graft.<proc>(...)` — see
    * [[GraftProcedures]]. Procedures live at the catalog's top level
    * only; a namespaced lookup (CALL graft.bogus.optimize) refuses like
    * the table side does, instead of silently resolving. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (ident.namespace.nonEmpty)
      throw new NoSuchNamespaceException(ident.namespace)
    GraftProcedures.load(ident.name)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    GraftProcedures.names
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  /** The reference exposes exactly one virtual bucket namespace
    * (src/main.rs:115-141). */
  override def listNamespaces(): Array[Array[String]] =
    Array(Array("datalake"))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (ns.sameElements(Array("datalake"))) Array.empty
    else throw new NoSuchNamespaceException(ns)

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("datalake"))

  override def loadNamespaceMetadata(ns: Array[String])
      : util.Map[String, String] =
    if (namespaceExists(ns)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(ns)

  override def createNamespace(ns: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are fixed (the reference's single virtual bucket)")

  override def alterNamespace(ns: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces are fixed")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft namespaces are fixed")

  override def listTables(ns: Array[String]): Array[Identifier] =
    if (namespaceExists(ns)) GraftSqlTables.aliases
      .map(a => Identifier.of(ns, a)).toArray
    else throw new NoSuchNamespaceException(ns)

  /** Always "not found": resolution falls through to [[GraftSqlRule]],
    * which inlines the governed scan for registered aliases; genuinely
    * unknown aliases then surface as TABLE_OR_VIEW_NOT_FOUND — the
    * reference's 404 (src/main.rs:503-512). */
  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)

  /** The registry truth, NOT the default loadTable probe (loadTable
    * throws by design, which would make every table "absent" — DROP
    * would 404 registered aliases and CREATE IF NOT EXISTS would
    * re-create them). */
  override def tableExists(ident: Identifier): Boolean =
    namespaceExists(ident.namespace) &&
      GraftSqlTables.resolve(Seq("graft", ident.name)).isDefined

  /** Plain `CREATE TABLE graft.<alias> (...) [PARTITIONED BY ...]
    * [LOCATION '...'] [TBLPROPERTIES (...)]` — the DSv2 exec routes
    * here. Registers the alias (writable) and commits an empty v0 with
    * the declared schema via [[GraftDdl.create]]; CTAS takes the
    * rule-intercepted command path instead (the exec's write half needs
    * a SupportsWrite table, while the engine's one write path is
    * MiniDelta.append). LOCATION is the physical root; without it the
    * catalog's `warehouse` option provides `<warehouse>/<alias>`. */
  /** The Column[] overload Spark's CreateTableExec actually calls:
    * generation expressions and identity specs ride the v2 Column
    * OBJECTS (the StructType conversion drops them), so this is where
    * they translate to the Delta field-metadata keys the engine's
    * writers uphold. */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    import org.apache.spark.sql.types.{MetadataBuilder, StructField}
    val fields = columns.map { c =>
      val base =
        if (c.metadataInJSON() == null) org.apache.spark.sql.types
          .Metadata.empty
        else org.apache.spark.sql.types.Metadata
          .fromJson(c.metadataInJSON())
      val b = new MetadataBuilder().withMetadata(base)
      if (c.comment() != null) b.putString("comment", c.comment())
      // DEFAULT <expr> → Spark's own CURRENT_DEFAULT/EXISTS_DEFAULT
      // field-metadata keys (delta-spark's wire shape); the engine's
      // writers MATERIALIZE the default into omitting writes and the
      // v0 protocol declares allowColumnDefaults
      val dv = c.defaultValue()
      if (dv != null) {
        require(dv.getSql != null && dv.getSql.nonEmpty,
          s"DEFAULT for ${c.name()} has no SQL form")
        b.putString("CURRENT_DEFAULT", dv.getSql)
        b.putString("EXISTS_DEFAULT", dv.getSql)
      }
      if (c.generationExpression() != null)
        b.putString("delta.generationExpression", c.generationExpression())
      val id = c.identityColumnSpec()
      if (id != null) {
        b.putLong("delta.identity.start", id.getStart)
        b.putLong("delta.identity.step", id.getStep)
        if (id.isAllowExplicitInsert)
          b.putBoolean("delta.identity.allowExplicitInsert", true)
      }
      StructField(c.name(), c.dataType(), c.nullable(), b.build())
    }
    createTable(ident, StructType(fields.toIndexedSeq), partitions,
      properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    import scala.jdk.CollectionConverters._
    val spark = org.apache.spark.sql.SparkSession.active
    val alias = ident.name.toLowerCase
    val (partCols, clusterCols) =
      GraftDdl.partitionAndClusterCols(partitions.toIndexedSeq)
    GraftDdl.create(spark, alias, schema, partCols,
      Option(properties.get(TableCatalog.PROP_LOCATION)),
      properties.asScala.toMap, clusterBy = clusterCols)
    GraftStaticTable(alias, schema, partitions)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new NoSuchTableException(ident)

  /** Metadata-only drop (external-table posture): unregister the alias
    * and invalidate its cached snapshots; the physical directory
    * survives — the reference never deletes a config-registered
    * table's storage either. */
  override def dropTable(ident: Identifier): Boolean = {
    val entry = GraftSqlTables.resolve(Seq("graft", ident.name))
    entry.foreach(e => graft.io.MiniDelta.invalidateSnapshot(e.path))
    GraftSqlTables.unregister(ident.name)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME in the graft catalog is not supported")
}

/** The static Table handed back by [[GraftCatalog.createTable]] —
  * bookkeeping only. Reads and writes never touch it: resolution routes
  * through [[GraftSqlRule]] (loadTable throws by design), so no
  * ScanBuilder/WriteBuilder is ever requested. */
case class GraftStaticTable(tableName: String, tableSchema: StructType,
    partitions: Array[Transform]) extends Table {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = partitions
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
}

/** Table-lifecycle maintenance as SQL stored procedures (Spark 4's
  * `CALL` + ProcedureCatalog API — the same surface Iceberg exposes its
  * maintenance through):
  *
  *   CALL graft.history('trades')
  *   CALL graft.vacuum('trades', 3600000)
  *   CALL graft.optimize('trades')        -- bin-packing compaction
  *   CALL graft.zorder('trades', 'a,b')   -- multi-dimensional cluster
  *   CALL graft.restore('trades', 3)
  *   CALL graft.clone('trades', 'fork_alias')  -- both sides aliases
  *   CALL graft.convert_to_delta('raw_dir_alias')
  *   CALL graft.checkpoint('trades')
  *   CALL graft.cleanup_logs('trades')
  *
  * Tables are addressed by ALIAS (the reference's client contract, like
  * the rest of the SQL front door); mutating procedures enforce the
  * alias's read-only posture. Results come back as rows (LocalScan —
  * driver-side metadata, never data-scale).
  */
object GraftProcedures {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  import graft.io.MiniDelta

  private def str(s: String): UTF8String = UTF8String.fromString(s)

  /** Alias -> physical path; `write=true` also enforces the alias's
    * read-only posture BEFORE any work. */
  private def pathOf(alias: String, write: Boolean): String = {
    val e = GraftSqlTables.resolve(Seq("graft", alias)).getOrElse(
      throw new IllegalArgumentException(
        s"unknown graft alias '$alias' — register it first " +
          "(GraftSqlTables.register)"))
    if (write && e.readOnly)
      throw new MiniDelta.ReadOnlyTableException(e.path)
    e.path
  }

  private def latestVersionOf(spark: SparkSession, path: String): Long = {
    val v = MiniDelta.latestVersion(spark, path)
    require(v >= 0,
      s"$path has no _delta_log — nothing to checkpoint " +
        "(convert_to_delta promotes a raw parquet directory)")
    v
  }

  /** One procedure: unbound == bound (no overloads; Spark aligns and
    * casts the CALL's arguments to `params` by position or name). */
  private abstract class P(
      override val name: String,
      params: Seq[(String, DataType)],
      out: StructType) extends UnboundProcedure with BoundProcedure {
    override def description: String = s"graft $name"
    override def bind(input: StructType): BoundProcedure = this
    override def parameters: Array[ProcedureParameter] =
      params.map { case (n, t) => ProcedureParameter.in(n, t).build() }
        .toArray
    override def isDeterministic: Boolean = false
    protected def execute(spark: SparkSession,
                          args: InternalRow): Seq[InternalRow]
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val rs = execute(SparkSession.active, input).toArray
      java.util.Collections.singletonList[Scan](new LocalScan {
        override def readSchema: StructType = out
        override def rows: Array[InternalRow] = rs
      }).iterator()
    }
  }

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)

  private val versionOut =
    StructType(Seq(StructField("version", LongType)))

  private val procedures: Map[String, UnboundProcedure] = Seq(
    new P("history", Seq("table" -> StringType), StructType(Seq(
      StructField("version", LongType),
      StructField("operation", StringType),
      StructField("n_added", LongType),
      StructField("n_removed", LongType)))) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] =
        MiniDelta.history(spark,
            pathOf(args.getUTF8String(0).toString, write = false))
          .collect().toSeq.map(r => row(r.getLong(0), str(r.getString(1)),
            r.getLong(2), r.getLong(3)))
    },
    new P("detail", Seq("table" -> StringType), StructType(Seq(
      StructField("format", StringType),
      StructField("location", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("clusteringColumns", ArrayType(StringType)),
      StructField("numFiles", LongType),
      StructField("sizeInBytes", LongType),
      StructField("numRows", LongType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("tableFeatures", ArrayType(StringType))))) {
      // DESCRIBE DETAIL as a procedure (Spark's parser has no DESCRIBE
      // DETAIL verb; Delta adds one via its parser extension — the CALL
      // surface is the engine's equivalent, like Iceberg's)
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] = {
        val df = MiniDelta.detail(spark,
          pathOf(args.getUTF8String(0).toString, write = false))
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToCatalystConverter(df.schema)
        df.collect().toSeq.map(conv(_).asInstanceOf[InternalRow])
      }
    },
    new P("vacuum", Seq("table" -> StringType, "retain_ms" -> LongType),
      StructType(Seq(StructField("n_deleted", LongType)))) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] = {
        val deleted = MiniDelta.vacuum(spark,
          pathOf(args.getUTF8String(0).toString, write = true),
          retainMs = args.getLong(1))
        Seq(row(deleted.size.toLong))
      }
    },
    new P("optimize", Seq("table" -> StringType), versionOut) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] = {
        val p = pathOf(args.getUTF8String(0).toString, write = true)
        Seq(row(MiniDelta.compact(spark, p,
          MiniDelta.partitionColumns(spark, p))))
      }
    },
    new P("zorder",
      Seq("table" -> StringType, "by" -> StringType), versionOut) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] = {
        val p = pathOf(args.getUTF8String(0).toString, write = true)
        val cols = args.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "zorder needs a comma-separated column list")
        Seq(row(MiniDelta.compact(spark, p,
          MiniDelta.partitionColumns(spark, p), zOrderBy = cols)))
      }
    },
    new P("restore",
      Seq("table" -> StringType, "version" -> LongType), versionOut) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] =
        Seq(row(MiniDelta.restore(spark,
          pathOf(args.getUTF8String(0).toString, write = true),
          args.getLong(1))))
    },
    new P("clone",
      Seq("source" -> StringType, "target" -> StringType), versionOut) {
      // the TARGET is an alias too — writing to an arbitrary raw path
      // from SQL would bypass the per-alias write governance the front
      // door exists to enforce; register the fork's path first
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] =
        Seq(row(MiniDelta.cloneShallow(spark,
          pathOf(args.getUTF8String(0).toString, write = false),
          pathOf(args.getUTF8String(1).toString, write = true))))
    },
    new P("convert_to_delta", Seq("table" -> StringType), versionOut) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] =
        Seq(row(MiniDelta.convertToDelta(spark,
          pathOf(args.getUTF8String(0).toString, write = true))))
    },
    new P("checkpoint", Seq("table" -> StringType), versionOut) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] = {
        val p = pathOf(args.getUTF8String(0).toString, write = true)
        val v = latestVersionOf(spark, p)
        MiniDelta.writeCheckpoint(spark, p, v)
        Seq(row(v))
      }
    },
    new P("cleanup_logs", Seq("table" -> StringType),
      StructType(Seq(StructField("n_deleted", LongType)))) {
      override protected def execute(spark: SparkSession,
          args: InternalRow): Seq[InternalRow] =
        Seq(row(MiniDelta.cleanupLogs(spark,
          pathOf(args.getUTF8String(0).toString, write = true))
          .size.toLong))
    }
  ).map(p => p.name -> (p: UnboundProcedure)).toMap

  def names: Seq[String] = procedures.keySet.toSeq.sorted

  def load(name: String): UnboundProcedure =
    procedures.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown graft procedure '$name' — available: " +
          names.mkString(", ")))
}
