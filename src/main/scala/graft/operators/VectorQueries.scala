package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-column aggregation operators: per-label centroids and int8
  * scalar quantization — the storage/serving side of a vector pipeline
  * (cluster stats for IVF coarse quantizers; int8 codes shrink a 100 TB
  * embedding corpus 4× and are what a production ANN index stores).
  *
  * Oracle parity notes: float32 → double widening is exact in both engines
  * (`embedding::DOUBLE[]` / `CAST(... AS ARRAY<DOUBLE>)`); per-dimension
  * sums route through DECIMAL(18,9) so the reduction is order-independent;
  * quantization uses `floor` (exact) rather than engine-rounding CASTs.
  */
object VectorQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- Q77
    // Per-label centroids, one scalar row per (label, dimension): explode
    // the 64-dim vectors and two-phase aggregate. At scale this is a single
    // shuffle on (label, dim) with partial map-side sums — no vector ever
    // materializes on the driver.
    Q("q77_embed_centroids", Some("""
      SELECT label, CAST(i AS INT) AS dim,
        round(CAST(SUM(CAST(v[i + 1] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
          AS centroid,
        COUNT(*) AS n_vectors
      FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings), range(0, 64) t(i)
      GROUP BY label, i""")) { (s, dir) =>
      Tables.t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(
          (sum(col("x").cast(DecimalType(18, 9))).cast("double") / count(lit(1)))
            .as("raw"),
          count(lit(1)).as("n_vectors"))
        .select(col("label"), col("dim"), round(col("raw"), 6).as("centroid"),
          col("n_vectors"))
    },

    // ---------------------------------------------------------------- Q78
    // Int8 scalar quantization per vector: scale = max|x|, code_i =
    // floor(x_i * 127 / scale). Emits scalar summaries (sum/min/max of the
    // integer codes) — exact integer arithmetic, order-independent — plus
    // the rounded scale. The codes themselves would be the stored payload.
    // A zero vector (scale = 0) quantizes to all-zero codes by definition —
    // the CASE guard keeps the division away from 0/0 NaN, whose BIGINT
    // cast differs between engines. (The fixture has no zero vectors; a
    // real corpus can.)
    Q("q78_embed_quantize", Some("""
      WITH q AS (
        SELECT vec_id,
          list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale,
          embedding::DOUBLE[] AS v
        FROM embeddings)
      SELECT vec_id, round(scale, 6) AS scale,
        CAST(list_sum(list_transform(v, x -> CASE WHEN scale = 0 THEN 0 ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END)) AS BIGINT) AS qsum,
        CAST(list_min(list_transform(v, x -> CASE WHEN scale = 0 THEN 0 ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END)) AS BIGINT) AS qmin,
        CAST(list_max(list_transform(v, x -> CASE WHEN scale = 0 THEN 0 ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END)) AS BIGINT) AS qmax
      FROM q""")) { (s, dir) =>
      Tables.t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> abs(x)), CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, x))").as("scale"),
          col("embedding").cast("array<double>").as("v"))
        .selectExpr("vec_id", "round(scale, 6) AS scale",
          "CAST(aggregate(transform(v, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END), CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT) AS qsum",
          "CAST(array_min(transform(v, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END)) AS BIGINT) AS qmin",
          "CAST(array_max(transform(v, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) ELSE CAST(floor(x * 127.0 / scale) AS BIGINT) END)) AS BIGINT) AS qmax")
    }
  )
}
