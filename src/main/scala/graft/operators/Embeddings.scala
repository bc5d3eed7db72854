package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-column operators for a training-data pipeline: per-vector
  * statistics, L2 normalization, and per-label centroids. The embeddings
  * table carries `Array[Float]`; all math widens to double FIRST and folds
  * left-to-right, so the per-vector reductions are bit-identical to the
  * oracle's list functions (same IEEE op sequence).
  *
  * Cross-row reductions (centroids) cannot rely on accumulation order —
  * Spark's partial aggregation sums in partition order. Components are
  * therefore rounded to 6 decimals (exact: no float widens to an exact
  * 7th-decimal midpoint, floats being dyadic rationals) and summed as
  * DECIMAL(18,6), which is order-independent; only the final mean leaves
  * as double. Same pattern as the money columns in [[graft.queries.Relational]].
  *
  * Scale notes: stats/normalize are scan-stage only. Centroids explode to
  * (row x dim) before the partial agg — shuffle volume is O(labels x dim),
  * independent of row count, because the map-side combine collapses each
  * partition to its local per-(label,pos) sums.
  */
object Embeddings {

  private def sq(c: Column): Column = c * c

  /** Left-fold sum of squares in double — matches DuckDB's
    * list_aggregate(list_transform(CAST(e AS DOUBLE[]), x -> x*x), 'sum').
    */
  def l2NormSq(e: Column): Column =
    aggregate(e, lit(0.0), (acc, x) => acc + sq(x.cast("double")))

  /** Per-vector statistics: dimension, L2 norm, max |component|.
    * Norms are rounded to 6 decimals at the boundary (sqrt of the exact
    * same double is exact, but downstream joins shouldn't key on a raw
    * 17-digit double).
    */
  def stats(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(sqrt(l2NormSq(col("embedding"))), 6).as("l2_norm"),
      round(array_max(transform(col("embedding"), x => abs(x.cast("double")))), 6)
        .as("max_abs"))

  /** L2-normalized copy of the embedding column (unit vectors — the form
    * cosine-similarity pipelines cache). Zero vectors pass through as-is.
    */
  def normalized(emb: DataFrame, out: String = "unit"): DataFrame = {
    val n = sqrt(l2NormSq(col("embedding")))
    emb.withColumn(out,
      when(n === 0.0, col("embedding").cast("array<double>"))
        .otherwise(transform(col("embedding"), x => x.cast("double") / n)))
  }

  /** Per-label centroids, one row per (label, component position). */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        (sum(round(col("x").cast("double"), 6).cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")

  /** Int8 scalar quantization — the standard 4× embedding compression for
    * ANN serving: per-vector scale = max|x|/127, code_i = round-half-up of
    * x_i/scale. floor(x·127/m + 0.5) is used instead of round() because
    * half-up is engine-portable while round() is banker's in some engines.
    * Zero vectors quantize to all-zero codes with scale 0. The checked
    * output carries order-independent integer summaries of the codes
    * (sum/min/max — exact in any engine); the codes themselves stay
    * distributed, scan-stage only.
    */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("m", array_max(transform(col("v"), x => abs(x))))
      .withColumn("q",
        when(col("m") === 0.0, transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"),
            x => floor(x * lit(127.0) / col("m") + lit(0.5)).cast("bigint"))))
      .select(
        col("vec_id"),
        round(col("m") / 127.0, 6).as("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))

  // --- driver-checked query surface ---

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_stats" -> ((s, d) =>
      stats(Tables.load(s, d, "embeddings")).orderBy("vec_id")),
    "emb_centroids" -> ((s, d) =>
      centroids(Tables.load(s, d, "embeddings"))),
    "emb_quantize" -> ((s, d) =>
      quantizeInt8(Tables.load(s, d, "embeddings")).orderBy("vec_id")),
  )

  def oracle: Map[String, String] = Map(
    "emb_stats" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
        |                                          x -> x * x), 'sum')), 6) AS l2_norm,
        | round(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 6) AS max_abs
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "emb_quantize" ->
      """SELECT vec_id,
        | round(m / 127.0, 6) AS scale,
        | CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
        | CAST(list_min(q) AS BIGINT) AS q_min,
        | CAST(list_max(q) AS BIGINT) AS q_max
        |FROM (
        |  SELECT vec_id, m,
        |    CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS m
        |        FROM embeddings))
        |ORDER BY vec_id""".stripMargin,
    "emb_centroids" ->
      """SELECT label, pos,
        | CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS centroid,
        | count(*) AS n
        |FROM (SELECT label,
        |        CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
        |        CAST(unnest(embedding) AS DOUBLE) AS x
        |      FROM embeddings)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
