package graft

import graft.operators.Layout
import graft.queries.Relational
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout and SQL-extension coverage: partition pruning on a
  * Hive-partitioned layout, ORC as an additional columnar format, and the
  * graft SQL function surface (both installation paths).
  */
class StorageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned write prunes non-matching partitions at planning time") {
    val dir = TestSpark.tempDir("graft-part").toString
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    Layout.writePartitioned(docs, dir, "lang")
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), not in
    // the row-level data filters
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("lang"), plan)
    val expected = docs.filter(col("lang") === "en").count()
    assert(q.count() === expected)
  }

  test("orc sink/source roundtrips a query result") {
    val df = Relational.defs("q01_pricing_summary")(spark, TestSpark.sf0001)
    val dir = TestSpark.tempDir("graft-orc")
    df.write.orc(s"$dir/orc")
    val back = spark.read.schema(df.schema).orc(s"$dir/orc")
    assert(back.collect().map(_.toString).sorted.toSeq ===
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("GraftFunctions.register exposes native expressions to SQL") {
    val s = spark.newSession() // own registry: the shared session stays clean
    graft.functions.GraftFunctions.register(s)
    val r = s.sql(
      """SELECT fnv1a64('hello') AS a, fnv1a_ihash('hello') AS b,
        |       md5_prefix60('hello') AS c,
        |       vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
      .collect()(0)
    // golden values from the library's column API (already property-tested)
    import org.apache.spark.sql.{functions => F}
    val viaColumns = s.range(1).select(
      graft.functions.hashes.fnv1a64(F.lit("hello")),
      graft.functions.hashes.fnv1aIHash(F.lit("hello")),
      graft.functions.hashes.portableHash60(F.lit("hello"))).collect()(0)
    assert(r.getLong(0) === viaColumns.getLong(0))
    assert(r.getLong(1) === viaColumns.getLong(1))
    assert(r.getLong(2) === viaColumns.getLong(2))
    assert(r.getDouble(3) === 11.0)
    // the shared session must NOT see the registration
    intercept[Exception](spark.sql("SELECT fnv1a64('x')").collect())
  }

  test("GraftExtensions injects the same functions via the builder hook") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftShims.functionRegistry(spark).clone()
    org.apache.spark.sql.GraftShims.registerInjectedFunctions(ext, reg)
    for (name <- Seq("fnv1a64", "fnv1a_ihash", "md5_prefix60", "poly31_hash", "vec_dot"))
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not injected")
  }
}
