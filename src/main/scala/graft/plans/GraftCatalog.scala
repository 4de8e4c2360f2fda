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
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = "graft"

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

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "CREATE TABLE in the graft catalog is not supported: register an " +
        "alias (GraftSqlTables.register) and INSERT INTO it instead")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new NoSuchTableException(ident)

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME in the graft catalog is not supported")
}
