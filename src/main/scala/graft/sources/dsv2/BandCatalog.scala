package graft.sources.dsv2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A V2 `TableCatalog` that makes band stores SQL-addressable: register
  * it as `spark.sql.catalog.<name> = graft.sources.dsv2.BandCatalog`
  * (plus `…<name>.warehouse = <dir>`) and the whole SQL DDL/DML surface
  * routes through the same [[BandStoreTable]] the path API uses —
  * `CREATE TABLE`, `INSERT INTO` (append commit), `INSERT OVERWRITE`
  * (truncate commit), `SELECT` with every pushdown, `DELETE FROM …
  * WHERE band …` (the metadata-only manifest rewrite), and `SELECT …
  * VERSION AS OF n` (time travel through
  * `loadTable(ident, version)` → a read-only pinned snapshot).
  *
  * Layout: one directory per identifier under the warehouse root
  * (namespace levels become path segments); a directory IS a table when
  * it holds a manifest, which `createTable` publishes empty — so
  * existence, atomicity and history all ride the store's own commit
  * protocol and the catalog itself keeps NO state beyond the filesystem.
  * That is deliberate: at cluster scale any node can resolve a table
  * from the shared filesystem alone, with no metastore round-trip (the
  * documented trade-off: no cross-table transactions, single-maintainer
  * maintenance — same stance as the store's compact/vacuum).
  */
class BandCatalog extends TableCatalog {
  private var catalogName: String = _
  private var warehouse: Path = _

  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog $name: set spark.sql.catalog.$name.warehouse to the store root")
    warehouse = new Path(w)
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): Path =
    (ident.namespace() :+ ident.name())
      .foldLeft(warehouse)((p, seg) => new Path(p, seg))

  private def isTable(dir: Path): Boolean = {
    val f = BandStore.fs(dir, conf)
    f.exists(new Path(dir, BandStore.ManifestFile))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = namespace.foldLeft(warehouse)((q, seg) => new Path(q, seg))
    val f = BandStore.fs(p, conf)
    if (!f.exists(p)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(p).filter(_.isDirectory)
      .filter(d => isTable(d.getPath))
      .map(d => Identifier.of(namespace, d.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = isTable(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    new BandStoreTable(dir.toString)
  }

  /** SQL `VERSION AS OF v` — a read-only pinned snapshot. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft-bands: VERSION AS OF takes an integer manifest version, " +
          s"got '$version'")
    }
    new BandStoreTable(dir.toString, Some(v))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "graft-bands: TIMESTAMP AS OF is not supported — manifest versions " +
        "carry no wall-clock; use VERSION AS OF <n>")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    require(schema.isEmpty || schema == BandStore.Schema,
      s"graft-bands tables have the fixed schema " +
        s"${BandStore.Schema.simpleString}; got ${schema.simpleString}")
    require(partitions.isEmpty,
      "graft-bands tables are band-partitioned by construction (one file " +
        "per band); PARTITIONED BY is not supported")
    val dir = dirOf(ident)
    require(!isTable(dir),
      s"table ${ident.toString} already exists in catalog $catalogName")
    // publishing an empty manifest IS table creation: existence and
    // every later commit ride the same atomic-rename protocol
    BandStore.writeManifest(dir, conf, Seq.empty)
    new BandStoreTable(dir.toString)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-bands: the store schema is fixed; ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) return false
    BandStore.fs(dir, conf).delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = dirOf(newIdent)
    val f = BandStore.fs(from, conf)
    require(!f.exists(to), s"rename target ${newIdent.toString} exists")
    f.mkdirs(to.getParent)
    require(f.rename(from, to),
      s"cannot rename ${oldIdent.toString} to ${newIdent.toString}")
  }
}
