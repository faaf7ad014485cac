package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.plans.GraftExtensions

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim):
  * brute-force cosine top-k as the correctness baseline and a
  * sign-hyperplane LSH bucketed variant as the scale path.
  *
  * Hot path: the codegen'd [[graft.functions.DotProduct]] expression
  * (`graft_dot`) — the higher-order-function composition it replaces is
  * CodegenFallback in Spark and was ~10× slower on the all-pairs queries.
  * Norms are computed once per vector and joined, so each candidate pair
  * costs exactly one 64-float dot product inside whole-stage codegen.
  *
  * Cross-engine determinism: `graft_dot` accumulates strictly
  * left-to-right in double (bit-identical to the DuckDB oracle's
  * `list_reduce` rendering); cosine = dot / (sqrt(dot(a,a)) *
  * sqrt(dot(b,b))) with the left vector's norm always first, so products
  * round identically and ranking on the raw double is stable.
  *
  * Scale design: the query set is the small side and is broadcast — the
  * big embeddings table is scanned once, never shuffled, for brute force.
  * The LSH variant replaces the all-pairs product with an equi-join on
  * bucket key: shuffle partitions by bucket, candidate count bounded by
  * bucket sizes (expected n/2^bits per bucket). Top-k per query goes
  * through `row_number` over a per-query window.
  */
object Similarity {

  /** Reference (slow-path) cosine via builtin higher-order functions —
    * kept as the numerics oracle for [[graft.functions.DotProduct]];
    * specs assert bit-equality between the two.
    */
  /** Reference dot product via builtin HOFs — the null-semantics oracle
    * for `graft_dot` (ragged lengths / null elements fold to NULL).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column = {
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val dot = dotHof(a, b)
    val na = fold(transform(a, x => x.cast("double") * x.cast("double")))
    val nb = fold(transform(b, x => x.cast("double") * x.cast("double")))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Embeddings with the L2 norm precomputed once per vector. */
  private def withNorm(s: SparkSession, d: String): DataFrame = {
    GraftExtensions.ensureRegistered(s)
    embeddings(s, d)
      .withColumn("nrm", sqrt(expr("graft_dot(embedding, embedding)")))
  }

  /** DuckDB rendering of the same strict-left-fold cosine. */
  private def cosineSql(a: String, b: String): String = {
    def fold(items: String) =
      s"list_reduce(list_prepend(0.0, $items), (acc, x) -> acc + x)"
    val dot = fold(s"list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)")
    val na = fold(s"list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)")
    val nb = fold(s"list_transform(range(1, len($b)+1), i -> $b[i]::DOUBLE * $b[i]::DOUBLE)")
    s"$dot / (sqrt($na) * sqrt($nb))"
  }

  /** S1 — brute-force cosine top-k: for each query vector (vec_id < 10),
    * the 5 nearest neighbors among all other vectors. The query side is
    * broadcast; the full table is scanned exactly once.
    */
  def s1BruteForceTopK(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(s, d)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("vec_id"))
    emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        expr("graft_dot(qe, embedding)") / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        r6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val s1Sql: String = {
    val cos = cosineSql("q.qe", "e.embedding")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
      |  FROM embeddings WHERE vec_id < 10)
      |SELECT query_id, neighbor_id, rank, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim FROM (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    $cos AS cos,
      |    row_number() OVER (PARTITION BY q.query_id
      |      ORDER BY $cos DESC, e.vec_id) AS rank
      |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id) t
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** S2 — sign-hyperplane LSH near-dup pairs: bucket key = sign bits of
    * the first 8 components (axis-aligned hyperplanes); exact cosine only
    * within buckets; report pairs with cosine ≥ 0.3.
    */
  def s2LshNearDup(s: SparkSession, d: String): DataFrame = {
    val keyed = withNorm(s, d).withColumn("bucket",
      concat((1 to 8).map(i =>
        when(try_element_at(col("embedding"), lit(i)) >= 0f, lit("1"))
          .otherwise(lit("0"))): _*))
    keyed.as("a").join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        expr("graft_dot(a.embedding, b.embedding)") /
          (col("a.nrm") * col("b.nrm")))
      .filter(r6(col("cos")) >= 0.3)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        r6(col("cos")).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  val s2Sql: String = {
    val bucket = (1 to 8)
      .map(i => s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END")
      .mkString(" || ")
    val cos = cosineSql("a.embedding", "b.embedding")
    s"""WITH keyed AS (SELECT vec_id, embedding, $bucket AS bucket
      |  FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  floor(($cos) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
      |FROM keyed a JOIN keyed b
      |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE floor(($cos) * 1000000.0 + 0.5) / 1000000.0 >= 0.3
      |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** S3 — exact embedding near-dup detection: all pairs with cosine ≥ 0.35
    * (brute force; the recall reference for what S2 approximates).
    * At 100 TB this is the one operator that cannot stay all-pairs — the
    * LSH variant (S2) is the production path; this exists as the recall
    * reference and for bounded candidate sets.
    */
  def s3EmbeddingNearDup(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(s, d).select(col("vec_id"), col("embedding"), col("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        expr("graft_dot(a.embedding, b.embedding)") /
          (col("a.nrm") * col("b.nrm")))
      .filter(r6(col("cos")) >= 0.35)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        r6(col("cos")).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  val s3Sql: String = {
    val cos = cosineSql("a.embedding", "b.embedding")
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, floor(($cos) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE floor(($cos) * 1000000.0 + 0.5) / 1000000.0 >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** S4 — IVF-style ANN: a deterministic coarse quantizer (the first 8
    * vectors act as centroids), every vector assigned to its nearest
    * centroid (one broadcast pass), queries probe only their own cell.
    * The second scale path next to sign-LSH (S2): assignment is
    * O(n × k) with the centroid set broadcast, and the probe join is an
    * equi-join on cell id — the full table is never self-joined.
    */
  def s4IvfTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(s, d)
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
        col("nrm").as("cnrm"))
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(desc("ccos"), col("cent_id"))
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("ccos",
        expr("graft_dot(embedding, ce)") / (col("nrm") * col("cnrm")))
      .withColumn("crn", row_number().over(assignW))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"))
    val q = assigned.filter(col("vec_id") >= 8 && col("vec_id") < 13)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qnrm"), col("cent_id").as("qcell"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("vec_id"))
    assigned.join(broadcast(q),
        col("cent_id") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        expr("graft_dot(qe, embedding)") / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(probeW))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        r6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val s4Sql: String = {
    val assignCos = cosineSql("e.embedding", "c.ce")
    val probeCos = cosineSql("q.qe", "a.embedding")
    s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS ce
      |  FROM embeddings WHERE vec_id < 8),
      |assigned AS (
      |  SELECT vec_id, embedding, cent_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY $assignCos DESC, c.cent_id) AS crn
      |    FROM embeddings e CROSS JOIN cent c) t
      |  WHERE crn = 1),
      |q AS (SELECT vec_id AS query_id, embedding AS qe, cent_id AS qcell
      |  FROM assigned WHERE vec_id >= 8 AND vec_id < 13)
      |SELECT query_id, neighbor_id, rank,
      |  floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim FROM (
      |  SELECT q.query_id, a.vec_id AS neighbor_id,
      |    $probeCos AS cos,
      |    row_number() OVER (PARTITION BY q.query_id
      |      ORDER BY $probeCos DESC, a.vec_id) AS rank
      |  FROM q JOIN assigned a
      |    ON a.cent_id = q.qcell AND a.vec_id <> q.query_id) t
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** S5 — per-label centroids: embeddings exploded to (label, dim, v)
    * long form — the layout that scales (vector ops become plain grouped
    * aggregation, partial-agg combined; no array state in the
    * aggregator) — then exact decimal-backed means per (label, dim).
    */
  def s5LabelCentroids(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), r6(davg(col("v"))).as("centroid_v"))
      .filter(col("dim") < 4) // bounded output; every dim computes identically
      .orderBy("label", "dim")

  val s5Sql: String =
    """SELECT label, dim, count(*) AS n,
      |  floor((CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(v))
      |        * 1000000.0 + 0.5) / 1000000.0 AS centroid_v
      |FROM (
      |  SELECT label,
      |    unnest(generate_series(0, len(embedding) - 1)) AS dim,
      |    unnest(embedding) AS v
      |  FROM embeddings)
      |WHERE dim < 4
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s5_label_centroids" -> s5LabelCentroids,
    "s1_bruteforce_topk" -> s1BruteForceTopK,
    "s2_lsh_neardup" -> s2LshNearDup,
    "s3_embedding_neardup" -> s3EmbeddingNearDup,
    "s4_ivf_topk" -> s4IvfTopK,
  )

  val oracle: Map[String, String] = Map(
    "s5_label_centroids" -> s5Sql,
    "s1_bruteforce_topk" -> s1Sql,
    "s2_lsh_neardup" -> s2Sql,
    "s3_embedding_neardup" -> s3Sql,
    "s4_ivf_topk" -> s4Sql,
  )
}
