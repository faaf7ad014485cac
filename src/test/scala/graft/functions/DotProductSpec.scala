package graft.functions

import graft.{SparkSpecBase, Tables}
import graft.plans.GraftExtensions
import graft.queries.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpecBase {

  test("graft_dot matches the HOF fold bit-for-bit on real embeddings") {
    GraftExtensions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(
        (expr("graft_dot(a.embedding, b.embedding)") /
          (sqrt(expr("graft_dot(a.embedding, a.embedding)")) *
            sqrt(expr("graft_dot(b.embedding, b.embedding)")))).as("fast"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("ref"))
    // bit-identical, not approximately equal: same fold order by contract
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
    assert(pairs.count() == 2500)
  }

  test("graft_dot basics: empty, mismatched lengths, nulls") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)), // 32.0
      (Array[Float](), Array[Float]()), // 0.0
    ).toDF("a", "b")
    val r = df.select(expr("graft_dot(a, b)")).collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(32.0, 0.0))
    val n = Seq((Option.empty[Array[Float]], Option(Array(1f))))
      .toDF("a", "b").select(expr("graft_dot(a, b)")).head()
    assert(n.isNullAt(0))
  }

  test("graft_dot matches HOF null semantics: ragged lengths and null elements → NULL") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    // zip_with pads the short side with nulls → null products → null fold;
    // graft_dot must agree, not silently truncate to min-length.
    val ragged = Seq((Array(1f, 2f), Array(3f)))
      .toDF("a", "b")
    assert(ragged.select(expr("graft_dot(a, b)")).head().isNullAt(0))
    assert(ragged.select(
      Similarity.dotHof(col("a"), col("b")).as("d")).head().isNullAt(0))
    val nullElem = Seq((Seq(Option(1f), None), Seq(Option(3f), Option(4f))))
      .toDF("a", "b")
    assert(nullElem.select(expr("graft_dot(a, b)")).head().isNullAt(0))
    assert(nullElem.select(
      Similarity.dotHof(col("a"), col("b")).as("d")).head().isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f))).toDF("a", "b")
    val viaCodegen = df.select(expr("graft_dot(a, b)")).head().getDouble(0)
    val interpreted = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.1f, -0.2f, 0.3f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(-0.4f, 0.5f, 0.6f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
      .eval(null).asInstanceOf[Double]
    assert(viaCodegen == interpreted)
  }
}
