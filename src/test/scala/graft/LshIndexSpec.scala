package graft

import graft.operators.{Dedup, LshIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LshIndexSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("probe from the persisted index equals the recompute-both-sides op (q71)") {
    val fromIndex = LshIndex.probe(spark, sf).collect().map(_.toSeq).toSet
    val recomputed = Dedup.crossCorpusNearDup(spark, sf).collect().map(_.toSeq).toSet
    assert(fromIndex === recomputed)
    assert(fromIndex.nonEmpty)
  }

  test("candidate join reads the index bucketed: exactly one exchange (probe side)") {
    LshIndex.buildIndex(spark, sf)
    val batch = Tables.documents(spark, sf)
      .filter(!col("source").isin(LshIndex.corpusSources: _*))
    val sigB = Dedup.signaturesRowLevel(batch)
    val idxBands = spark.table(LshIndex.tbl("bands", sf))
    // At sf0.001 AQE just broadcasts the tiny index; disable broadcast to
    // exercise the shuffle-join regime the bucketing exists for.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = idxBands.as("a").join(Dedup.bandsOf(sigB).as("b"),
          col("a.bkey") === col("b.bkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  /** A distinct data dir backed by the same parquet (symlink), so the
    * mutation tests can't pollute the other tests' index for `sf`. Table
    * names canonicalize the path (sha-256 of toRealPath), so a mere
    * spelling variant like "sf/." would now share sf's index — the old
    * trick this replaces.
    */
  private def newLinkedDir(): String = {
    val t = java.nio.file.Files.createTempDirectory("graft_lshidx_spec_")
    t.toFile.deleteOnExit()
    java.nio.file.Files.createSymbolicLink(
      t.resolve("documents.parquet"),
      java.nio.file.Paths.get(sf, "documents.parquet").toRealPath())
    // scratch corpus → purge its warehouse lineage at JVM exit
    WarehouseGC.registerScratchPurge(spark, t.toString)
    t.toString
  }
  private lazy val linkedDir: String = newLinkedDir()

  test("two spellings of one dir share one index (canonicalized namespace)") {
    assert(LshIndex.tbl("bands", sf) === LshIndex.tbl("bands", sf + "/."))
    assert(LshIndex.tbl("bands", sf) !== LshIndex.tbl("bands", linkedDir))
  }

  test("append folds a batch into the index; later probes dedup against it") {
    val d = linkedDir
    val batchAll = Tables.documents(spark, d)
      .filter(!col("source").isin(LshIndex.corpusSources: _*))
    val half1 = batchAll.filter(col("doc_id") % 2 === 0)
    val half2 = batchAll.filter(col("doc_id") % 2 === 1)
    val before = LshIndex.probe(spark, d, batchOpt = Some(half2))
      .collect().map(_.toSeq).toSet
    LshIndex.append(spark, half1, d)
    val after = LshIndex.probe(spark, d, batchOpt = Some(half2))
      .collect().map(_.toSeq).toSet
    // the appended docs can only ADD pairs, and every new pair's corpus
    // side is an appended (even) doc
    assert(before.subsetOf(after))
    val newPairs = after -- before
    assert(newPairs.nonEmpty) // replicas straddle the parity split
    assert(newPairs.forall(r => r.head.asInstanceOf[Long] % 2 == 0))

    // A probe whose batch OVERLAPS appended docs (the default batch =
    // all non-corpus sources, after half1 was appended) must not emit
    // self-pairs or duplicated rows: overlapping docs are anti-joined
    // off the batch side, so the result equals the disjoint-batch probe.
    val overlapping = LshIndex.probe(spark, d).collect().map(_.toSeq)
    assert(overlapping.forall(r => r.head != r(1)), "self-pair emitted")
    assert(overlapping.length === overlapping.distinct.length, "duplicated rows")
    assert(overlapping.toSet === after)

    // re-appending the same batch is a no-op (idempotent append): the
    // sizes table keeps exactly one row per doc
    LshIndex.append(spark, half1, d)
    val sizes = spark.table(LshIndex.tbl("sizes", d))
    assert(sizes.groupBy("doc_id").count().filter(col("count") > 1).count() === 0L)
    assert(LshIndex.probe(spark, d).collect().map(_.toSeq).toSet === after)

    // compaction merges the append-accumulated small files, keeps the
    // bucketed layout (zero index-side exchange), and changes nothing
    def bandFiles(): Long = {
      val loc = spark.sql(
        s"DESCRIBE TABLE EXTENDED `${LshIndex.tbl("bands", d)}`")
        .filter(col("col_name") === "Location").head.getString(1)
      val p = java.nio.file.Paths.get(java.net.URI.create(loc).getPath)
      val st = java.nio.file.Files.list(p)
      try st.filter(_.getFileName.toString.startsWith("part-")).count()
      finally st.close()
    }
    val before_files = bandFiles()
    LshIndex.compact(spark, d)
    assert(bandFiles() < before_files, s"compaction did not shrink $before_files files")
    assert(LshIndex.probe(spark, d).collect().map(_.toSeq).toSet === after)
    val plan = spark.table(LshIndex.tbl("bands", d)).queryExecution
      .executedPlan.toString
    assert(plan.contains("Bucketed: true") || plan.contains("SelectedBucketsCount")
      || !plan.contains("Exchange"), plan.take(500))
  }

  test("crashed append (data landed, marker not) is RETRIED, not skipped; probe survives the duplicates") {
    val d = newLinkedDir()
    val batchAll = Tables.documents(spark, d)
      .filter(!col("source").isin(LshIndex.corpusSources: _*))
    val half1 = batchAll.filter(col("doc_id") % 2 === 0)
    val half2 = batchAll.filter(col("doc_id") % 2 === 1)
    LshIndex.buildIndex(spark, d)
    val committedT = LshIndex.tbl("committed", d)
    val corpusCommitted = spark.table(committedT).collect().map(_.getLong(0))
    // clean reference: append half1, probe half2
    LshIndex.append(spark, half1, d)
    val clean = LshIndex.probe(spark, d, batchOpt = Some(half2))
      .collect().map(_.toSeq).toSet
    // simulate the crash window: half1's DATA rows are in the four data
    // tables, but the committed marker write never landed — rewind
    // `committed` to its pre-append content
    spark.sql(s"DROP TABLE `$committedT`")
    import spark.implicits._
    corpusCommitted.toSeq.toDF("doc_id")
      .write.bucketBy(LshIndex.Buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(committedT)
    // the RETRY re-appends half1 (round-4 advice: the old sizes-keyed
    // idempotence skipped it, silently losing the docs) → data tables
    // now hold duplicate rows for half1
    LshIndex.append(spark, half1, d)
    val sigsT = spark.table(LshIndex.tbl("sigs", d))
    assert(sigsT.groupBy("doc_id").count().filter(col("count") > 1).count() > 0L,
      "retry did not re-append (no duplicates found — idempotence key still wrong?)")
    // probes are insensitive to the duplicate residue: same pairs, same
    // jaccards, no self-pairs, no duplicated result rows
    val probed = LshIndex.probe(spark, d, batchOpt = Some(half2)).collect().map(_.toSeq)
    assert(probed.length === probed.distinct.length, "duplicated result rows")
    assert(probed.forall(r => r.head != r(1)), "self-pair emitted")
    assert(probed.toSet === clean)
    // and half1 is back on the index side for the DEFAULT probe (docs
    // not silently vanished): committed covers half1 again
    val committedNow = spark.table(committedT).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val half1Ids = half1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half1Ids.subsetOf(committedNow))
  }

  test("paragraphDedup equals an independent window-based implementation") {
    val para = 20
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val paras = Tables.documents(spark, sf)
      .select(col("doc_id"), toks.as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(1), size(col("ts")), lit(para))).as("st"))
      .select(col("doc_id"), col("st"),
        array_join(slice(col("ts"), col("st"), lit(para)), " ").as("ptext"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ptext")).orderBy(col("doc_id"), col("st"))
    val expected = paras
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("st"), col("ptext"))).as("ps"))
      .select(col("doc_id"),
        array_join(transform(array_sort(col("ps")), p => p.getField("ptext")), " ")
          .as("text"),
        size(col("ps")).cast("long").as("n_kept"))
      .collect().map(_.toSeq).toSet
    val got = Dedup.paragraphDedup(spark, sf).collect().map(_.toSeq).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("dedupKeepBest: keeper is the longest cluster member, mapping covers clustered docs") {
    val mapping = Dedup.dedupKeepBest(spark, sf)
    val ntok = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
    // keeper length ≥ every member's length within the same mapping group
    val bad = mapping.as("m")
      .join(ntok.as("td"), col("m.doc_id") === col("td.doc_id"))
      .join(ntok.as("tk"), col("m.keeper") === col("tk.doc_id"))
      .filter(col("td.n") > col("tk.n"))
    assert(bad.count() === 0L)
    // the mapped doc set = docs appearing in any near-dup pair
    val pairs = Dedup.minhashLsh(spark, sf)
    val paired = pairs.select(col("a").as("doc_id"))
      .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
    assert(mapping.select("doc_id").exceptAll(paired).count() === 0L)
    assert(paired.exceptAll(mapping.select("doc_id")).count() === 0L)
    // every keeper maps to itself
    val keepers = mapping.select(col("keeper").as("doc_id")).distinct()
    val selfMapped = mapping.filter(col("doc_id") === col("keeper"))
      .select("doc_id").distinct()
    assert(keepers.exceptAll(selfMapped).count() === 0L)
  }
}
