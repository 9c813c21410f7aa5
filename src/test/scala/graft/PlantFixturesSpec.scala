package graft

import graft.pipeline.PipelineOps
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r8 #2: the planted-fixture pattern must be deployment-clean.
  * The oracle gate plants deterministic fixtures inside some operators'
  * SQL (PII suffixes, URL synthesis, HTML templates, syndicated blocks,
  * snapshot splits) so every outcome class is populated at tiny SF; with
  * `spark.graft.plantFixtures=false` each affected operator must read its
  * REAL input instead and the fixture content must vanish. The snapshot
  * operators (p48, p52) then read user-registered views — the deployment
  * catalog contract — which this spec registers explicitly.
  */
class PlantFixturesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def withPlantOff[A](body: => A): A = {
    spark.conf.set("spark.graft.plantFixtures", "false")
    try body finally spark.conf.unset("spark.graft.plantFixtures")
  }

  /** Off-mode runs don't bind the catalog themselves — that's the
    * deployment contract — so the spec binds the raw corpus. */
  private def bindDocs(): Unit =
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")

  test("config validates") {
    spark.conf.set("spark.graft.plantFixtures", "maybe")
    try {
      val e = intercept[IllegalArgumentException](
        PipelineOps.queries("p38_pii_redact")(spark, dir))
      assert(e.getMessage.contains("plantFixtures"))
    } finally spark.conf.unset("spark.graft.plantFixtures")
  }

  test("p38 off: no planted PII — text passes through unredacted") {
    bindDocs()
    val rows = withPlantOff(PipelineOps.queries("p38_pii_redact")(spark, dir))
      .selectExpr("sum(n_emails + n_ips + n_phones) AS hits", "count(*) AS n")
      .head()
    assert(rows.getLong(1) == 500)
    assert(rows.getLong(0) == 0L,
      "the gate corpus has no natural PII; off-mode must not plant any")
    // and the checksum is of the RAW text (t = text, no suffix)
    val chk = withPlantOff(PipelineOps.queries("p38_pii_redact")(spark, dir))
      .createOrReplaceTempView("p38_off")
    val diff = spark.sql(
      """SELECT count(*) FROM p38_off o JOIN documents d ON o.doc_id = d.doc_id
         WHERE o.red_checksum != md5(d.text)""").head().getLong(0)
    assert(diff == 0L, "off-mode checksum must be md5 of the raw text")
  }

  test("p43 off: ASCII corpus is NFC-invariant — no planted suffix") {
    bindDocs()
    val bad = withPlantOff(PipelineOps.queries("p43_unicode_nfc")(spark, dir))
      .filter("len_raw != len_nfc").count()
    assert(bad == 0L, "without the planted combining-char suffix, NFC is identity")
  }

  test("p45 off: reads the real url column") {
    withPlantOff {
      spark.sql(
        """SELECT * FROM VALUES
             (1L, 'HTTP://WWW.Example.COM:80/x?b=2&a=1#frag'),
             (2L, 'https://plain.org/y')
           AS t(doc_id, url)""").createOrReplaceTempView("documents")
      val got = PipelineOps.queries("p45_url_normalize")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "example.com"), (2L, "plain.org")),
        s"hosts must come from the url column, got $got")
    }
  }

  test("p47 off: lines are the text's real newline structure") {
    bindDocs()
    val rows = withPlantOff(PipelineOps.queries("p47_boilerplate_lines")(spark, dir))
      .selectExpr("max(n_lines) AS mx", "sum(n_removed) AS rm").head()
    // gate texts are single-line: split(text, '\n') yields exactly one line
    // per doc and no line recurs across >= dfMin docs
    assert(rows.getLong(0) == 1L)
    assert(rows.getLong(1) == 0L)
  }

  test("p63 off: paragraphs are the text's real blank-line structure") {
    bindDocs()
    val rows = withPlantOff(PipelineOps.queries("p63_paragraph_dedup")(spark, dir))
      .selectExpr("max(n_paras) AS mx", "sum(n_removed) AS rm", "count(*) AS n").head()
    // gate texts have no blank lines: split(text, '\n\n') is one paragraph
    // per doc, so keep-first dedup reduces to whole-text exact dedup —
    // removals = docs minus distinct texts, not the planted fixture's count
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val expect = docs.count() - docs.selectExpr("count(DISTINCT text)").head().getLong(0)
    assert(rows.getLong(0) == 1L)
    assert(rows.getLong(1) == expect)
    assert(rows.getLong(2) == docs.count())
  }

  test("p48 off: classifies a real base/batch view pair") {
    withPlantOff {
      spark.sql("SELECT * FROM VALUES (1L, 'shared doc'), (2L, 'base only') AS t(doc_id, text)")
        .createOrReplaceTempView("documents_base")
      spark.sql("SELECT * FROM VALUES (10L, 'Shared DOC'), (11L, 'fresh content') AS t(doc_id, text)")
        .createOrReplaceTempView("documents_batch")
      val got = PipelineOps.queries("p48_bloom_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((10L, "dup_of_base"), (11L, "new_unique")),
        s"off-mode must classify against the real views, got $got")
    }
  }

  test("p52 off: diffs real snapshot views") {
    withPlantOff {
      spark.sql(
        """SELECT * FROM VALUES (1L, 'a'), (2L, 'b'), (3L, 'c')
           AS t(doc_id, text)""").createOrReplaceTempView("documents_v1")
      spark.sql(
        """SELECT * FROM VALUES (2L, 'b'), (3L, 'c CHANGED'), (4L, 'd')
           AS t(doc_id, text)""").createOrReplaceTempView("documents_v2")
      val got = PipelineOps.queries("p52_snapshot_diff")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("added" -> 1L, "removed" -> 1L,
        "content_changed" -> 1L, "unchanged" -> 1L), s"got $got")
    }
  }

  test("p54 off: the syndicated block is not planted") {
    bindDocs()
    val on = PipelineOps.queries("p54_substring_dedup")(spark, dir)
      .filter("doc_id % 5 = 0").selectExpr("sum(n_tokens)").head().getLong(0)
    val off = withPlantOff(PipelineOps.queries("p54_substring_dedup")(spark, dir))
      .filter("doc_id % 5 = 0").selectExpr("sum(n_tokens)").head().getLong(0)
    // the planted block adds 12 tokens to every 5th doc
    assert(on > off, s"planted token counts must exceed clean counts ($on vs $off)")
  }

  test("p58 off: the text column IS the page — no planted template") {
    bindDocs()
    val rows = withPlantOff(PipelineOps.queries("p58_html_extract")(spark, dir))
      .selectExpr("count(*) AS n",
        "sum(CASE WHEN title = '' THEN 0 ELSE 1 END) AS titled",
        "sum(leaked) AS leaked").head()
    assert(rows.getLong(0) == 500)
    assert(rows.getLong(1) == 0L, "no planted <title> template in off-mode")
    assert(rows.getLong(2) == 0L)
  }

  test("p60 off: no planted twins — no doc_id above the twin offset") {
    bindDocs()
    val twins = withPlantOff(PipelineOps.queries("p60_simhash_pairs")(spark, dir))
      .filter(s"idb >= ${1099511627776L}").count()
    assert(twins == 0L, "twin ids (offset 2^40) must vanish with planting off")
  }

  test("p69 off: no planted continuations — no doc_id above the continuation offset") {
    bindDocs()
    val planted = withPlantOff(PipelineOps.queries("p69_boundary_overlap")(spark, dir))
      .filter(s"b_id >= ${2199023255552L} OR a_id >= ${2199023255552L}").count()
    assert(planted == 0L, "continuation ids (offset 2^41) must vanish with planting off")
  }

  test("p76 off: no planted continuations — no merged pair carries a continuation id") {
    bindDocs()
    val planted = withPlantOff(PipelineOps.queries("p76_stitch_merge")(spark, dir))
      .filter(s"b_id >= ${2199023255552L} OR a_id >= ${2199023255552L}").count()
    assert(planted == 0L, "continuation ids (offset 2^41) must vanish with planting off")
  }

  test("p70 off: the ASCII gate corpus is fully clean") {
    bindDocs()
    val dirty = withPlantOff(PipelineOps.queries("p70_mojibake_score")(spark, dir))
      .filter("NOT is_clean").count()
    assert(dirty == 0L, "without the planted damage every gate doc is clean")
  }

  test("p74 off: no reformatted twins — every cluster is a singleton") {
    bindDocs()
    val rows = withPlantOff(PipelineOps.queries("p74_cluster_rep")(spark, dir))
    assert(rows.filter(s"doc_id >= ${8796093022208L}").count() == 0L,
      "twin ids (offset 2^43) must vanish with planting off")
    assert(rows.filter("n_members > 1 OR NOT is_rep").count() == 0L,
      "the gate corpus has no organic normalized duplicates")
  }

  test("p72 off: no mirror sources — the gate corpus has zero cross-source dups") {
    bindDocs()
    val rows = withPlantOff(PipelineOps.queries("p72_source_overlap")(spark, dir))
    assert(rows.filter("src_a LIKE 'mir_%' OR src_b LIKE 'mir_%'").count() == 0L,
      "mirror sources must vanish with planting off")
    assert(rows.count() == 0L,
      "the word-soup gate corpus has no organic cross-source exact duplicates")
  }
}
