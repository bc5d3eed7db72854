package graft.sources.dsv2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
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
class BandCatalog extends TableCatalog with ProcedureCatalog
    with FunctionCatalog {
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

  // ------------------------------------------------- stored procedures

  /** Store maintenance as SQL: `CALL <cat>.system.compact('t')` and
    * `CALL <cat>.system.vacuum('t', <retain_last>)` run the same
    * [[BandStoreMaintenance]] operations the Scala API exposes, each
    * returning its counters as a one-row result — so an operator (or a
    * scheduled SQL job) maintains the store without any Scala. The
    * single-maintainer stance is inherited unchanged.
    */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array(Identifier.of(namespace, "compact"),
        Identifier.of(namespace, "vacuum"))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"catalog $catalogName: procedures live in the 'system' namespace; " +
        s"got ${ident.toString}")
    def pathOf(table: String): String = {
      val d = new Path(warehouse, table)
      require(isTable(d),
        s"catalog $catalogName: no band-store table '$table' to maintain")
      d.toString
    }
    ident.name() match {
      case "compact" => BandProcedures.compact(pathOf)
      case "vacuum" => BandProcedures.vacuum(pathOf)
      case other => throw new UnsupportedOperationException(
        s"catalog $catalogName: no procedure 'system.$other' " +
          "(available: compact, vacuum)")
    }
  }

  // --------------------------------------------------------- functions

  /** The engine's deterministic hashes as SQL-callable V2 functions
    * (`SELECT <cat>.system.fnv1a64(text) …`): the same code paths the
    * Catalyst expressions in `graft.functions.hashes` use, so a SQL-only
    * consumer computes bucket/fingerprint values bit-identical to the
    * engine's own (the portability contract the Go-golden-vector tests
    * pin for the expressions). Each carries the MAGIC invoke method, so
    * calls compile to a direct static-style invocation, not a row-boxing
    * `produceResult` path.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      BandFunctions.all.keys.toArray.sorted.map(Identifier.of(namespace, _))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction = {
    require(ident.namespace().sameElements(Array("system")),
      s"catalog $catalogName: functions live in the 'system' namespace; " +
        s"got ${ident.toString}")
    BandFunctions.all.getOrElse(ident.name(),
      throw new UnsupportedOperationException(
        s"catalog $catalogName: no function 'system.${ident.name()}' " +
          s"(available: ${BandFunctions.all.keys.toSeq.sorted.mkString(", ")})"))
  }
}

/** String → BIGINT hash functions, bindable by any V2 FunctionCatalog.
  * One class per function so the MAGIC `invoke(UTF8String): Long` method
  * resolves unambiguously.
  */
private[dsv2] object BandFunctions {
  abstract class StringHash(fnName: String, desc: String)
      extends UnboundFunction with ScalarFunction[java.lang.Long] {
    override def name(): String = fnName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType,
        s"$fnName takes exactly one STRING argument; got " +
          inputType.simpleString)
      this
    }
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def isDeterministic: Boolean = true
    def invoke(s: UTF8String): Long
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getUTF8String(0))
  }

  class Fnv1a64Fn extends StringHash("fnv1a64",
    "FNV-1a 64-bit hash of a string's UTF-8 bytes") {
    override def invoke(s: UTF8String): Long = graft.functions.FnvHash.hash64(s)
  }
  class IHashFn extends StringHash("ihash",
    "the reference engine's bucket hash: fnv1a32 & 0x7fffffff") {
    override def invoke(s: UTF8String): Long =
      graft.functions.FnvHash.ihash(s).toLong
  }
  class Poly31Fn extends StringHash("poly31",
    "Rabin-Karp base-31 rolling fingerprint over code points, mod 1e9+7") {
    override def invoke(s: UTF8String): Long = graft.functions.FnvHash.poly31(s)
  }

  val all: Map[String, UnboundFunction] = Map(
    "fnv1a64" -> new Fnv1a64Fn,
    "ihash" -> new IHashFn,
    "poly31" -> new Poly31Fn)
}

private[dsv2] object BandProcedures {
  private def spark = org.apache.spark.sql.SparkSession.active

  /** A completed procedure's one-row counters result. */
  private def counters(names: Seq[String], values: Seq[Int]): Scan =
    new LocalScan {
      override def readSchema(): StructType =
        StructType(names.map(StructField(_, IntegerType, nullable = false)))
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(
          values.map(java.lang.Integer.valueOf(_): Any).toArray))
    }

  private def oneShot(procName: String, procDesc: String,
                      params: Array[ProcedureParameter],
                      run: InternalRow => Scan): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = procDesc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = procDesc
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false // mutates the store
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            java.util.List.of(run(input)).iterator()
        }
    }

  def compact(pathOf: String => String): UnboundProcedure =
    oneShot("compact",
      "merge each band's files (optionally doc_id-range-clustered into " +
        "files_per_band files per band); publishes a new manifest version",
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("files_per_band", IntegerType)
          .defaultValue("1").build()),
      { input =>
        val perBand = if (input.isNullAt(1)) 1 else input.getInt(1)
        val (before, after) = BandStoreMaintenance.compact(
          spark, pathOf(input.getUTF8String(0).toString), perBand)
        counters(Seq("files_before", "files_after"), Seq(before, after))
      })

  def vacuum(pathOf: String => String): UnboundProcedure =
    oneShot("vacuum",
      "drop manifest versions beyond retain_last and delete unreachable files",
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("retain_last", IntegerType)
          .defaultValue("1").build()),
      { input =>
        val retain = if (input.isNullAt(1)) 1 else input.getInt(1)
        val (versions, files) = BandStoreMaintenance.vacuum(
          spark, pathOf(input.getUTF8String(0).toString), retain)
        counters(Seq("versions_dropped", "files_deleted"),
          Seq(versions, files))
      })
}
