package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** o18 — field-id rename/drop schema evolution. Extends the
  * SchemaEvolutionSpec (o17, ADD-by-name) coverage with the two
  * contracts name-tracking cannot give (r17 verdict ask #3, the public
  * Iceberg spec behavior):
  *
  *  - RENAME-PRESERVES: a renamed column keeps reading history's data
  *    (same field id, same bytes) under the new name;
  *  - DROP-NEVER-RESURRECTS: a dropped-then-re-added NAME gets a fresh
  *    id and reads NULL over history even though the old bytes are
  *    physically present in the files.
  */
class FieldIdEvolutionSpec extends SparkSpecBase {

  private def table(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("k", "name", "note")
  }

  test("rename preserves history: new name, same field id, same bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o18s_")
    val base = dir.toString
    try {
      val fields = Seq(Warehouse.O18Field(1, "k", "bigint"),
        Warehouse.O18Field(2, "name", "string"),
        Warehouse.O18Field(3, "note", "string"))
      Warehouse.o18Stage(base, "t0",
        table(Seq((1L, "ada", "x"), (2L, "bob", "y"))), fields)
      assert(Warehouse.o18Commit(base, 0, "t0", fields))
      // rename name -> full_name: METADATA ONLY
      assert(Warehouse.o18Commit(base, 1, "t0",
        Seq(Warehouse.O18Field(1, "k", "bigint"),
          Warehouse.O18Field(2, "full_name", "string"),
          Warehouse.O18Field(3, "note", "string"))))
      val v1 = Warehouse.o18Read(spark, base, 1)
      assert(v1.schema.fieldNames.toSeq == Seq("k", "full_name", "note"))
      assert(v1.orderBy("k").select("full_name")
        .collect().map(_.getString(0)).toSeq == Seq("ada", "bob"),
        "the renamed column must read history's values")
      // time travel stays faithful: v0 still exposes the OLD name
      assert(Warehouse.o18Read(spark, base, 0)
        .schema.fieldNames.toSeq == Seq("k", "name", "note"))
      // and nothing was rewritten: both versions resolve the same token
      val s0 = java.nio.file.Files.readString(dir.resolve("schema-0"))
      val s1 = java.nio.file.Files.readString(dir.resolve("schema-1"))
      assert(s0.split("\n").head == s1.split("\n").head,
        "a rename must commit the SAME data token")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("drop-then-re-add reads NULL over history — old bytes never resurrect") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o18s_")
    val base = dir.toString
    try {
      val fields = Seq(Warehouse.O18Field(1, "k", "bigint"),
        Warehouse.O18Field(2, "name", "string"),
        Warehouse.O18Field(3, "note", "string"))
      Warehouse.o18Stage(base, "t0",
        table(Seq((1L, "ada", "secret"), (2L, "bob", "hidden"))), fields)
      assert(Warehouse.o18Commit(base, 0, "t0", fields))
      // drop note (id 3), then re-add the NAME note under a fresh id 4
      assert(Warehouse.o18Commit(base, 1, "t0",
        Seq(Warehouse.O18Field(1, "k", "bigint"),
          Warehouse.O18Field(2, "name", "string"))))
      assert(Warehouse.o18Commit(base, 2, "t0",
        Seq(Warehouse.O18Field(1, "k", "bigint"),
          Warehouse.O18Field(2, "name", "string"),
          Warehouse.O18Field(4, "note", "string"))))
      // the old bytes ARE in the files — the NULL below is the id
      // mechanism, not absent data
      assert(spark.read.parquet(s"$base/data-t0").columns.contains("f3"))
      val v2 = Warehouse.o18Read(spark, base, 2)
      assert(v2.filter(col("note").isNotNull).count() == 0,
        "a re-added name must NOT resurrect the dropped column's bytes")
      // the dropped version simply has no such column
      assert(!Warehouse.o18Read(spark, base, 1)
        .schema.fieldNames.contains("note"))
      // an uncommitted version fails loudly (the o12/o16 read discipline)
      assertThrows[IllegalArgumentException] {
        Warehouse.o18Read(spark, base, 9)
      }
      // and a racing duplicate commit of the same version loses loudly
      assert(!Warehouse.o18Commit(base, 2, "t0", fields),
        "schema-version create must be CAS, not last-writer-wins")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("schema serialization survives delimiter-bearing dtypes and rejects reserved names") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o18s_")
    val base = dir.toString
    try {
      // decimal(10,2) carries a comma — the r18 ADVICE corruption case
      // under the old comma-separated field list
      val fields = Seq(Warehouse.O18Field(1, "k", "bigint"),
        Warehouse.O18Field(2, "price", "decimal(10,2)"))
      import spark.implicits._
      Warehouse.o18Stage(base, "t0",
        Seq((1L, BigDecimal("12.34")), (2L, BigDecimal("0.99")))
          .toDF("k", "price"), fields)
      assert(Warehouse.o18Commit(base, 0, "t0", fields))
      val v0 = Warehouse.o18Read(spark, base, 0)
      assert(v0.schema("price").dataType ==
        org.apache.spark.sql.types.DecimalType(10, 2),
        "a comma-bearing dtype must round-trip the schema file intact")
      assert(v0.orderBy("k").select("price").collect()
        .map(_.getDecimal(0).toPlainString).toSeq == Seq("12.34", "0.99"))
      // a name carrying the ':' separator (or a newline) is rejected at
      // COMMIT time, never silently mis-split at read time
      assertThrows[IllegalArgumentException] {
        Warehouse.o18Commit(base, 1, "t0",
          Seq(Warehouse.O18Field(1, "k:bad", "bigint")))
      }
      assertThrows[IllegalArgumentException] {
        Warehouse.o18Commit(base, 1, "t0",
          Seq(Warehouse.O18Field(1, "k", "big\nint")))
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
