package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Clean, Scd2, Upsert}

/** Property-style randomized checks (seeded → deterministic) for the
  * cleaning expressions and SCD2/upsert invariants, per SURVEY §5.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("hash buckets: every id lands in [0,100) and every split covers it") {
    val ids = (1L to 5000L).toDF("id")
    val buckets = ids.select(graft.operators.Curation.hashBucket(col("id")).as("b"))
    assert(buckets.filter(col("b") < 0 || col("b") >= 100).isEmpty)
    // split assignment is total: every row gets exactly one label
    val split = graft.operators.Curation.hashSplit(
      ids, "id", Seq("a" -> 33, "b" -> 33, "c" -> 34))
    assert(split.filter(col("split").isNull).isEmpty)
    assert(split.count() == 5000)
    // boundary exactness: bucket < 33 ⇔ 'a'
    assert(split
      .withColumn("b", graft.operators.Curation.hashBucket(col("id")))
      .filter((col("b") < 33) =!= (col("split") === "a")).isEmpty)
  }

  test("price parser: any dotted/suffixed rendering parses back to the value") {
    val rnd = new Random(11)
    def dotted(v: Long): String = // locale-independent thousands dots
      v.toString.reverse.grouped(3).mkString(".").reverse
    val cases = Seq.fill(300) {
      val v = math.abs(rnd.nextLong()) % 1000000000L
      val s = if (rnd.nextBoolean()) dotted(v) else v.toString
      val suffix = Seq("đ", "₫", "", "đ ")(rnd.nextInt(4))
      (s + suffix, v)
    }
    val df = cases.toDF("raw", "expected")
    val bad = df
      .withColumn("parsed", Clean.parsePrice(col("raw")).cast("long"))
      .filter(col("parsed") =!= col("expected"))
    assert(bad.count() == 0, bad.take(3).mkString(","))
  }

  test("ram/storage split: combined fields split exactly; singles route by the 64GB rule") {
    val rnd = new Random(12)
    val pairs = Seq.fill(200)((1 + rnd.nextInt(2048), 1 + rnd.nextInt(2048)))
    val df = pairs.toDF("a", "b").withColumn(
      "raw", concat(col("a"), lit(" GB - "), col("b"), lit(" GB")))
    val (ram, storage) = Clean.splitRamStorage(col("raw"))
    val bad = df.select(col("a"), col("b"), ram.as("ram"), storage.as("storage"))
      .filter(col("ram") =!= col("a") || col("storage") =!= col("b")).count()
    assert(bad == 0)

    val singles = Seq("8 GB", "256 GB", "63 GB", "64 GB").toDF("raw")
    val (r2, s2) = Clean.splitRamStorage(col("raw"))
    val got = singles.select(col("raw"), r2.as("r"), s2.as("s"))
      .collect().map(x => x.getString(0) -> ((x.getInt(1), x.getInt(2)))).toMap
    assert(got("8 GB") == ((8, -1)) && got("63 GB") == ((63, -1)))
    assert(got("256 GB") == ((-1, 256)) && got("64 GB") == ((-1, 64)))
  }

  test("scd2 invariants hold over random multi-round mutation sequences") {
    val sentinel = lit(Scd2.SentinelTs).cast("timestamp_ntz")
    val rnd = new Random(13)
    (1 to 3).foreach { trial =>
      val rounds = Seq.fill(4)(
        Seq.fill(25)((1 + rnd.nextInt(40), 1 + rnd.nextInt(9))).distinctBy(_._1))
      var history = Scd2.emptyHistory(Seq((1, 1)).toDF("key", "attr"), "timestamp_ntz")
      rounds.zipWithIndex.foreach { case (snapshot, i) =>
        val snap = snapshot.toDF("key", "attr")
        val ts = lit(f"2024-01-${i + 1}%02d 00:00:00").cast("timestamp_ntz")
        history = Scd2.apply(history, snap, Seq("key"), Seq("key"), Seq("attr"), ts, sentinel)
      }
      val current = history.filter(col("expired_at") === sentinel).cache()
      // ≤ 1 current row per key
      assert(current.groupBy("key").count().filter(col("count") > 1).count() == 0,
        s"trial $trial: duplicate current rows")
      // every key ever staged has exactly one current row
      val staged = rounds.flatten.map(_._1).toSet
      assert(current.select("key").distinct().count() == staged.size, s"trial $trial")
      // expiry never precedes creation
      assert(history.filter(col("expired_at") < col("created_at")).count() == 0, s"trial $trial")
      // the current attr for a key equals its LAST staged value
      val lastStaged = rounds.zipWithIndex
        .flatMap { case (snap, i) => snap.map { case (k, a) => (k, i, a) } }
        .groupBy(_._1).map { case (k, vs) => (k, vs.maxBy(_._2)._3) }
      val bad = current.select("key", "attr").collect()
        .count(r => lastStaged(r.getInt(0)) != r.getInt(1))
      assert(bad == 0, s"trial $trial: stale current attrs")
    }
  }

  test("upsert/insertIgnore algebra: keys unique, winners correct") {
    val rnd = new Random(14)
    (1 to 3).foreach { _ =>
      val base = Seq.fill(30)((1 + rnd.nextInt(15), rnd.nextInt(100))).toMap.toSeq
      val inc = Seq.fill(10)((1 + rnd.nextInt(15), 100 + rnd.nextInt(100))).toMap.toSeq
      val baseDf = base.toDF("k", "v")
      val incDf = inc.toDF("k", "v")
      val incKeys = inc.map(_._1)
      val baseKeys = base.map(_._1)

      val up = Upsert.upsert(baseDf, incDf, Seq("k"))
      assert(up.groupBy("k").count().filter(col("count") > 1).count() == 0)
      assert(up.filter(col("k").isInCollection(incKeys) && col("v") < 100).count() == 0,
        "upsert: increment version must win")
      assert(up.count() == (baseKeys ++ incKeys).distinct.size)

      val ig = Upsert.insertIgnore(baseDf, incDf, Seq("k"))
      assert(ig.groupBy("k").count().filter(col("count") > 1).count() == 0)
      assert(ig.filter(col("k").isInCollection(baseKeys) && col("v") >= 100).count() == 0,
        "insertIgnore: existing version must win")
    }
  }

  test("c5 packing: contiguous, gap-free token layout per source") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("c5_pack_sequences")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("seq_idx") * 512 + r.getAs[Long]("seq_offset")))
    assert(out.length == Tables.load(spark, dir, "documents").count())
    assert(out.forall { case (_, _, pos) => pos >= 0 })
    out.groupBy(_._1).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"$src: stream must start at offset 0")
      sorted.sliding(2).foreach {
        case Array((_, t, p), (_, _, p2)) =>
          assert(p2 == p + t, s"$src: gap/overlap at position $p (tok $t → $p2)")
        case _ =>
      }
    }
  }

  test("c4 two-phase prefix sum ≡ single-window running total, bit-exact") {
    val dir = "/root/testdata/sf0.001"
    // the de-skewed (source, md5-bucket) two-phase form must reproduce the
    // naive source-partitioned window exactly — Long addition reassociated
    // over buckets is still the same sum
    val twoPhase = SparkEntry.queries("c4_token_budget")(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("rk"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("rk"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .filter(col("cum_tokens") <= 2000L)
      .select("doc_id", "source", "n_tok", "cum_tokens")
    assert(twoPhase.exceptAll(naive).isEmpty && naive.exceptAll(twoPhase).isEmpty,
      "two-phase running total diverges from the single-window form")
  }

  test("d8 line dedup: corpus-wide kept total equals distinct line count") {
    val dir = "/root/testdata/sf0.001"
    val structured = Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      regexp_replace(col("text"), " (the|a|value|table) ", "\n").as("text"))
    val out = graft.operators.TextAnalysis.lineDedupCorpus(structured, "doc_id", "text")
    val kept = out.agg(sum("n_kept")).head().getLong(0)
    val distinctLines = structured
      .select(explode(split(col("text"), "\n")).as("line"))
      .filter(col("line") =!= "").distinct().count()
    assert(kept == distinctLines, s"kept $kept != distinct $distinctLines")
    // and no document gained lines
    assert(out.filter(col("n_kept") > col("n_lines")).isEmpty)
  }

  test("pageRankLite: ranks sum to 1, floor (1-d)/N holds, hubs outrank leaves") {
    // dangling-free skewed graph: everyone links to a small hub set
    val n = 200L
    val edges = (0L until n).flatMap(u => Seq((u, (u * u + 1) % n), (u, u / 2)))
      .toDF("src", "dst")
    val ranks = graft.operators.Curation.pageRankLite(edges, "src", "dst", 5)
    assert(ranks.count() == n)
    val total = ranks.agg(sum("rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass not conserved: $total")
    val floor = 0.15 / n
    assert(ranks.filter(col("rank") < floor * 0.999999).isEmpty,
      "every node keeps at least the damping residual")
    // node 0 is everyone's ancestor chain target; it must beat the median
    val r0 = ranks.filter(col("node") === 0).head().getDouble(1)
    val med = ranks.agg(expr("percentile(rank, 0.5)")).head().getDouble(0)
    assert(r0 > med, s"hub rank $r0 not above median $med")
  }

  test("pageRankDangling conserves rank mass on a sink-heavy graph; pageRankLite leaks it") {
    // half the nodes are pure sinks: odd u link to 2u (out of range ⇒
    // those targets have no out-edges)
    val n = 100L
    val edges = (0L until n).filter(_ % 2 == 1).map(u => (u, u * 2)).toDF("src", "dst")
    val dangling = graft.operators.Curation.pageRankDangling(edges, "src", "dst", 5)
    val totalD = dangling.agg(sum("rank")).head().getDouble(0)
    assert(math.abs(totalD - 1.0) < 1e-9, s"dangling variant leaked mass: $totalD")
    // the leak contract of the lite variant on the SAME graph — documents
    // why the dangling variant exists
    val lite = graft.operators.Curation.pageRankLite(edges, "src", "dst", 5)
    val totalL = lite.agg(sum("rank")).head().getDouble(0)
    assert(totalL < 0.9, s"lite variant should leak sink mass here, got $totalL")
    // sinks still hold at least the damping floor plus their share of the
    // redistributed mass — nothing goes negative or NaN
    assert(dangling.filter(col("rank").isNull || col("rank") <= 0.0).isEmpty)
  }

  test("weighted systematic sample: ≤ n picks, buckets strictly increasing, boundary count exact") {
    val n = 37L
    val docs = (1L to 500L).map(i => (i, s"doc $i", 1L + i % 13)).toDF("doc_id", "text", "n_tok")
      .withColumn("source", lit("all"))
      .withColumn("rk", md5(col("doc_id").cast("string")))
    // mirror the c7 gate inline (the helper is private to SparkEntry):
    // global cumsum in (rk, doc_id) order, boundary-crossing selection
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rk"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wTotal = docs.agg(sum("n_tok")).head().getLong(0)
    val picked = docs.withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .withColumn("sample_bucket", expr(s"(cum_tokens * $n) div $wTotal"))
      .filter(col("sample_bucket") > expr(s"((cum_tokens - n_tok) * $n) div $wTotal"))
      .orderBy("cum_tokens").collect()
    assert(picked.length <= n, "never more picks than boundaries")
    val buckets = picked.map(_.getAs[Long]("sample_bucket"))
    assert(buckets.sameElements(buckets.sorted.distinct), "buckets strictly increase")
    // every boundary k=1..n lands inside exactly one doc's interval, so
    // the LAST bucket is n (cum = W at the final doc) and coverage is
    // total when no doc spans multiple boundaries
    assert(buckets.last == n, "final boundary owned by the last picked doc")
  }

  test("snapshotDiff: op classification, null-safe compares, delete carries old values") {
    val old = Seq(
      (1L, Some(10.0), "a"), // unchanged → dropped
      (2L, Some(20.0), "b"), // price changes → update
      (3L, None, "c"),       // NULL → value → update (null-safe)
      (4L, Some(40.0), "d")) // absent from new → delete
      .toDF("id", "price", "tag")
    val nu = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (3L, Some(30.0), "c"),
      (5L, Some(50.0), "e")) // new key → insert
      .toDF("id", "price", "tag")
    val out = graft.operators.ChangeCapture
      .snapshotDiff(old, nu, Seq("id"), Seq("price", "tag"))
      .collect().map(r => r.getLong(1) -> (r.getString(0), Option(r.get(2)))).toMap
    assert(out.size == 4 && !out.contains(1L), "unchanged row must be dropped")
    assert(out(2L) == ("update", Some(21.0)), "update carries NEW values")
    assert(out(3L)._1 == "update", "NULL→value is an update under null-safe compare")
    assert(out(4L) == ("delete", Some(40.0)), "delete carries last-seen OLD values")
    assert(out(5L) == ("insert", Some(50.0)))
  }

  test("sql dialect: randomized hostile literals survive every scanner verbatim") {
    import graft.control.SqlRegistry
    val rnd = new Random(7)
    // fragments that would derail a scanner with naive quote/paren
    // tracking: cast/regexp shapes, separators, both MySQL escape forms
    val hostile = Seq("CAST(", " AS SIGNED)", ";", "(", ")", "''", "\\'", ",",
      "REGEXP_SUBSTR(x, ", "BEGIN ", " END", "CAST(v AS DECIMAL(10,2))", " AS ")
    def literalBody(): String =
      (0 until rnd.nextInt(6)).map(_ => hostile(rnd.nextInt(hostile.size)))
        .mkString("x", "", "y")
    def squash(s: String) = s.replaceAll("\\s+", "")
    (1 to 200).foreach { _ =>
      val lits = Seq.fill(1 + rnd.nextInt(3))(literalBody())
      // each statement: one hostile literal + one REAL cast outside it
      val stmts = lits.zipWithIndex.map { case (b, i) =>
        s"UPDATE t SET c$i = '$b', n$i = CAST(col$i AS SIGNED)"
      }
      val body = stmts.mkString(";\n") + ";"
      val split = SqlRegistry.splitStatements(body)
      assert(split.size == stmts.size,
        s"splitter found ${split.size} statements in ${stmts.size}:\n$body")
      split.zip(lits).zipWithIndex.foreach { case ((stmt, b), i) =>
        val rew = SqlRegistry.rewriteRegexpSubstr(SqlRegistry.rewriteMysqlCasts(stmt))
        assert(rew.contains(s"'$b'"),
          s"literal content altered by a rewriter:\n'$b'\nnot verbatim in:\n$rew")
        assert(squash(rew).contains(s"REGEXP_EXTRACT(col$i,"),
          s"real CAST outside the literal was not rewritten:\n$rew")
        assert(!squash(rew).contains(s"CAST(col${i}ASSIGNED)"),
          s"original MySQL cast left in place:\n$rew")
      }
    }
  }

  test("chunkDocuments: spans tile the token stream; overlap windows carry full width") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b c d e f g"),          // 7 tokens
      (2L, "x y"),                    // 2 tokens
      (3L, " , ;"),                   // 0 tokens → no chunks
      (4L, (1 to 10).map(i => s"w$i").mkString(" "))) // 10 tokens
      .toDF("doc_id", "text")
    // stride = width: exact partition — reassembly equals the token stream
    val part = graft.operators.TextAnalysis.chunkDocuments(docs, "doc_id", "text", 3, 3)
    val rejoined = part.groupBy("doc_id")
      .agg(concat_ws(" ",
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
          .getField("chunk_text")).as("re"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rejoined(1L) == "a b c d e f g")
    assert(rejoined(2L) == "x y")
    assert(!rejoined.contains(3L), "empty doc must emit no chunks")
    // overlapping windows: starts 1,3,5,7,9 on 10 tokens at width 4
    val over = graft.operators.TextAnalysis.chunkDocuments(docs, "doc_id", "text", 4, 2)
      .filter(col("doc_id") === 4L)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).sortBy(_._1)
    assert(over.map(_._2).toSeq == Seq(1, 3, 5, 7, 9), "starts stride by 2 while ≤ n")
    assert(over.map(_._3).toSeq == Seq(4, 4, 4, 4, 2), "full width until the short tail")
    assert(over.head._4 == "w1 w2 w3 w4" && over.last._4 == "w9 w10")
    // n_tok always equals the chunk body's own token count
    val mism = graft.operators.TextAnalysis.chunkDocuments(docs, "doc_id", "text", 5, 2)
      .filter(size(split(col("chunk_text"), " ")) =!= col("n_tok")).count()
    assert(mism == 0)
  }

  test("lmScoreDocs: hand-computed coverage and integer-scaled probabilities") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: (a,b) (b,a) (a,b)
      (2L, "a b c"),   // bigrams: (a,b) (b,c)
      (3L, "z"))       // no bigrams → no score row
      .toDF("doc_id", "text")
    // corpus: n12(a,b)=3 (kept at minCount=2); (b,a)=(b,c)=1 pruned;
    // n1(a)=3, n1(b)=2 → p(b|a) = 3/3 = 1 → p10 = 10^10
    val out = graft.operators.TextAnalysis.lmScoreDocs(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), "only docs with bigrams are scored")
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_bigrams") == 3 && d1.getAs[Long]("n_known") == 2)
    assert(d1.getAs[Double]("coverage") == 2.0 / 3)
    assert(d1.getAs[Long]("score_scaled") == 2L * 10000000000L)
    assert(d1.getAs[Long]("mean_p10") == 10000000000L)
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_bigrams") == 2 && d2.getAs[Long]("n_known") == 1)
    assert(d2.getAs[Double]("coverage") == 0.5)
    assert(d2.getAs[Long]("score_scaled") == 10000000000L)
    // a doc of ONLY pruned bigrams scores 0 with a null mean
    val lone = Seq((9L, "q r s")).toDF("doc_id", "text")
      .unionByName(docs.filter(col("doc_id") =!= 9L))
    val d9 = graft.operators.TextAnalysis.lmScoreDocs(lone, "doc_id", "text", minCount = 2L)
      .filter(col("doc_id") === 9L).collect()(0)
    assert(d9.getAs[Long]("n_known") == 0 && d9.getAs[Long]("score_scaled") == 0L)
    assert(d9.isNullAt(d9.fieldIndex("mean_p10")))
  }

  test("bpeTrain: hand-computed merge sequence with greedy non-overlap and early stop") {
    val docs = Seq(
      (1L, "aaab aaab aaab"), // "aaab" ×3
      (2L, "ab cd"))          // "ab" ×1, "cd" ×1
      .toDF("doc_id", "text")
    // r1: (a,a)=6 [two positions in aaab ×3] beats (a,b)=4 → merge aa;
    //     greedy left-to-right: aaab → [aa,a,b] (NOT [a,aa,b])
    // r2: (a,b)=4 [aaab×3 + ab×1] beats (aa,a)=3 → merge ab
    // r3: (aa,ab)=3 → merge aaab
    // r4: only (c,d)=1 < minPairCount → stop at 3 merges
    val merges = graft.operators.TextAnalysis.bpeTrain(docs, "text", 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(merges.toSeq == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 4L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("bpeApply: trained merges tokenize exactly; subwords conserve characters") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "aaab aaab aaab"),
      (2L, "ab cd"))
      .toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrain(docs, "text", 10)
    val out = graft.operators.TextAnalysis.bpeApply(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r).toMap
    // "aaab" fully merges (ranks aa, ab, aaab); "cd" never reached count 2
    assert(out(1L).getAs[Long]("n_tokens") == 3 && out(1L).getAs[Long]("n_subwords") == 3)
    assert(out(1L).getAs[String]("subword_text") == "aaab aaab aaab")
    assert(out(2L).getAs[Long]("n_tokens") == 2 && out(2L).getAs[Long]("n_subwords") == 3)
    assert(out(2L).getAs[String]("subword_text") == "ab c d")
    // character conservation on real data: removing spaces from the
    // subword stream must reproduce the concatenated token stream
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val applied = graft.operators.TextAnalysis.bpeApply(real, "doc_id", "text",
      graft.operators.TextAnalysis.bpeTrain(real, "text", 4))
    val tokStream = real.select(col("doc_id"),
      concat_ws("", graft.operators.TextAnalysis.tokens(col("text"))).as("chars"))
    val broken = applied
      .select(col("doc_id"), regexp_replace(col("subword_text"), " ", "").as("re"))
      .join(tokStream, "doc_id")
      .filter(col("re") =!= col("chars")).count()
    assert(broken == 0, "subword streams must conserve every character")
  }

  test("bpe_encode automaton ≡ chained-replace projection, bit-exact on trained tables") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    assert(spark.catalog.functionExists("bpe_encode"))
    // real corpus, real trained merges — the exact table t15/t16 exercise
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ms = TextAnalysis.bpeTrain(real, "text", 10)
      .select("merge_rank", "lhs", "rhs").orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    assert(ms.nonEmpty)
    val words = real.select(explode(TextAnalysis.tokens(col("text"))).as("w")).distinct()
    val diff = words
      .select(
        col("w"),
        TextAnalysis.bpeSubwords(col("w"), ms).as("kernel"),
        TextAnalysis.bpeSubwordsChained(col("w"), ms).as("chained"))
      .filter(col("kernel") =!= col("chained"))
    assert(diff.isEmpty, s"automaton diverges from chained replay: ${diff.head(3).toSeq}")
    // adversarial overlap/recreation shapes the corpus may not contain:
    // self-pairs (aaa), rank interleaving (ab then abc), dead ranks
    // (no empty word: tokens() never emits one, and the two forms
    // legitimately differ there — split("","><") is [""], the automaton [])
    val tricky = Seq("aaa", "aaaa", "aaab", "abc", "abcabc", "cab", "x")
      .toDF("w")
    val ms2 = IndexedSeq(("a", "a"), ("a", "b"), ("ab", "c"), ("aa", "ab"), ("z", "q"))
    val diff2 = tricky
      .select(
        TextAnalysis.bpeSubwords(col("w"), ms2).as("kernel"),
        TextAnalysis.bpeSubwordsChained(col("w"), ms2).as("chained"))
      .filter(col("kernel") =!= col("chained"))
    assert(diff2.isEmpty, s"automaton diverges on overlap shapes: ${diff2.head(3).toSeq}")
  }

  test("bpe_encode applies a 20k-merge table flat — no plan blowup, merges honored") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // 4 live merges + ~20k dead ranks (symbols never created): the
    // automaton's cost is per-word O(len²) lookups, rank-count-free —
    // the chained-replace form at this vocabulary would nest 20k
    // replaces and die in Catalyst analysis, so only the kernel runs
    val live = IndexedSeq(("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"))
    val dead = (0 until 20000).map(i => (s"q${i}x", s"q${i}y"))
    val ms = live ++ dead
    val out = Seq("hello", "hell", "ohel", "lll")
      .toDF("w")
      .select(col("w"), concat_ws("|", TextAnalysis.bpeSubwords(col("w"), ms)).as("subs"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("hello") == "hello") // he+ll → hell+o at ranks 3,4
    assert(out("hell") == "hell")
    assert(out("ohel") == "o|he|l")
    assert(out("lll") == "ll|l") // leftmost-first non-overlap
  }

  test("bpeTrain batched rounds reproduce the stale-counts batching rule exactly") {
    import graft.operators.TextAnalysis
    // driver-side reference replay of the documented rule: per batch, one
    // pair-count snapshot; top-m by (count desc, lhs, rhs); replaces
    // applied SEQUENTIALLY in rank order (a pair destroyed by an earlier
    // in-batch merge no-ops)
    def reference(wordCounts: Map[String, Long], nMerges: Int, minN: Long, m: Int)
        : Seq[(Int, String, String, String, Long)] = {
      var vocab: Map[List[String], Long] =
        wordCounts.map { case (w, c) => w.toList.map(_.toString) -> c }
      def mergeWord(s: List[String], a: String, b: String): List[String] = s match {
        case x :: y :: rest if x == a && y == b => (a + b) :: mergeWord(rest, a, b)
        case x :: rest => x :: mergeWord(rest, a, b)
        case Nil => Nil
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      var rank = 1
      var go = true
      // STATIC schedule — exactly ⌈nMerges/m⌉ snapshots, batch i capped
      // at min(m, nMerges − (i−1)·m); a short batch does NOT extend the
      // schedule (the engine and the t17 SQL oracle replay this rule)
      val nBatches = (nMerges + m - 1) / m
      for (i <- 1 to nBatches if go) {
        val counts = vocab.toSeq.flatMap { case (s, c) =>
          s.zip(s.drop(1)).map(p => p -> c)
        }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
          .filter(_._2 >= minN)
        val batch = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }
          .take(math.min(m, nMerges - (i - 1) * m))
        if (batch.isEmpty) go = false
        else batch.foreach { case ((a, b), n) =>
          out += ((rank, a, b, a + b, n))
          rank += 1
          vocab = vocab.toSeq.map { case (s, c) => mergeWord(s, a, b) -> c }
            .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        }
      }
      out.toSeq
    }
    val docs = Seq(
      (1L, "aaab aaab aaab ab cd cd"),
      (2L, "xyxy xyxy zzz")).toDF("doc_id", "text")
    val wc = Map("aaab" -> 3L, "ab" -> 1L, "cd" -> 2L, "xyxy" -> 2L, "zzz" -> 1L)
    for (m <- Seq(1, 3, 10)) {
      val got = TextAnalysis.bpeTrain(docs, "text", 8, batchRounds = m)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      assert(got == reference(wc, 8, 2L, m),
        s"batchRounds=$m diverged from the reference replay:\n$got\nvs\n${reference(wc, 8, 2L, m)}")
    }

    // the case that DISTINGUISHES the static schedule from dynamic
    // continuation: every snapshot of "aaaaaaaa" yields exactly ONE
    // qualifying pair (short of m=2), and after ⌈4/2⌉=2 snapshots a
    // THIRD would still find (aaaa,aaaa)≥2 — the static rule stops at 2
    // snapshots / 2 merges (what the t17 SQL oracle replays), dynamic
    // would take a 3rd and emit a 3rd merge
    val short = Seq((1L, "aaaaaaaa aaaaaaaa")).toDF("doc_id", "text")
    val gotShort = TextAnalysis.bpeTrain(short, "text", 4, batchRounds = 2)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val refShort = reference(Map("aaaaaaaa" -> 2L), 4, 2L, 2)
    assert(refShort.map(_._1) == Seq(1, 2), s"reference replay must stop at 2: $refShort")
    assert(gotShort == refShort,
      s"short-batch schedule diverged:\n$gotShort\nvs\n$refShort")
  }

  test("sign_bit_bands kernel ≡ composed per-plane signature, incl. null/mismatch semantics") {
    import org.apache.spark.sql.functions._
    import graft.operators.SimilaritySearch
    assert(spark.catalog.functionExists("sign_bit_bands"))
    val bands = 4
    val bits = 5
    val dim = 7
    val planes = SimilaritySearch.hyperplanes(dim, bands * bits, 7L)
    // deterministic vectors + a dimension-mismatch row + a null-element row
    val rows = (0 until 40).map(i =>
      (i.toLong, (0 until dim).map(j => ((i * 13 + j * 31) % 101) / 101.0 - 0.5).map(Option(_)))) ++
      Seq(
        (100L, (0 until dim - 1).map(j => Option(j * 0.1))), // wrong dim → all keys 0
        (101L, Seq(Option(0.5), None) ++ (2 until dim).map(j => Option(j * 0.1)))) // null elem
    val df = rows.toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
    val kernel = df.select(col("id"),
      call_function("sign_bit_bands", col("v"),
        typedlit(planes.map(_.toSeq)), lit(bands), lit(bits)).as("keys"))
    val composed = df.select(col("id"),
      array((0 until bands).map(b =>
        planes.slice(b * bits, (b + 1) * bits).zipWithIndex.map { case (p, i) =>
          when(SimilaritySearch.dot(col("v"), array(p.map(lit): _*)) >= 0, lit(1L << i))
            .otherwise(lit(0L))
        }.reduce(_ + _)): _*).as("keys"))
    val diff = kernel.join(composed.withColumnRenamed("keys", "keys2"), "id")
      .filter(col("keys") =!= col("keys2"))
    assert(diff.isEmpty, s"kernel diverges from composed: ${diff.head(3).toSeq}")
    // the mismatch/null rows take the all-zero-keys branch in BOTH forms
    assert(kernel.filter(col("id") >= 100L)
      .select(col("keys")).collect()
      .forall(_.getSeq[Long](0).forall(_ == 0L)))
  }

  test("skewReport: exact hot-key stats on a planted frame; empty input is empty") {
    // key "a" ×6, "b" ×3, "c" ×1 → 10 rows, 3 keys, mean 10/3,
    // skew_ratio = 6/(10/3) = 1.8, top10 covers everything
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val r = graft.operators.Profiling.skewReport(df, "k").head()
    assert(r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[String]("max_key") == "a" && r.getAs[Long]("max_key_n") == 6L)
    assert(r.getAs[Long]("top10_n") == 10L && r.getAs[Double]("top10_share") == 1.0)
    assert(r.getAs[Double]("skew_ratio") == 6.0 / (10.0 / 3))
    // deterministic tie: equal counts resolve to the smallest key string
    val tied = Seq("b", "a", "a", "b").toDF("k")
    assert(graft.operators.Profiling.skewReport(tied, "k").head()
      .getAs[String]("max_key") == "a")
    assert(graft.operators.Profiling.skewReport(df.limit(0), "k").count() == 0)
  }

  test("profile: null/distinct accounting is exact on a known frame") {
    val df = Seq(
      (Some(1), "a"), (None, "b"), (Some(3), "b"), (None, "a"), (Some(1), "c"))
      .toDF("x", "s")
    val out = graft.operators.Profiling.profile(df, Seq("x", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x").getAs[Long]("n_rows") == 5)
    assert(out("x").getAs[Long]("n_nulls") == 2)
    assert(out("x").getAs[Long]("n_distinct") == 2) // {1, 3}
    assert(out("x").getAs[String]("min_str") == "1" && out("x").getAs[String]("max_str") == "3")
    assert(out("s").getAs[Long]("n_nulls") == 0)
    assert(out("s").getAs[Long]("n_distinct") == 3)
  }
}
