package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the training-prep text kernels: token-window
  * chunking boundaries (q126) and TF-IDF ranking semantics (q127).
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("tokenChunks emits stride-spaced overlapping windows with clamped tails") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")), // 40 tokens
      (2L, "a b c"), //  3 tokens — one short chunk
      (3L, (1 to 17).map(i => s"w$i").mkString(" "))  // 17 tokens — tail start
    ).toDF("doc_id", "text")
    val got = operators.LlmQueries.tokenChunks(docs) // window 32, stride 16
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))

    // doc 1: starts 0/16/32 → 32, 24, 8 tokens
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)).toSeq == Seq((0, 32), (1, 24), (2, 8)))
    // overlap: chunk 1 begins with chunk 0's last (window - stride) tokens
    val c0 = d1(0)._4.split(" ")
    val c1 = d1(1)._4.split(" ")
    assert(c1.take(16).toSeq == c0.takeRight(16).toSeq)
    assert(c1.head == "t17" && d1(2)._4.split(" ").head == "t33")

    // doc 2: a single sub-window chunk, verbatim text
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))

    // doc 3: 17 tokens → a full 17-token chunk plus the 1-token tail at 16
    assert(got.filter(_._1 == 3L).map(c => (c._2, c._3)).toSeq ==
      Seq((0, 17), (1, 1)))
  }

  test("tfidfTopTerms ranks by exact tf*N/df with token tie-break") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")
    ).toDF("doc_id", "text")
    val got = operators.LlmQueries.tfidfTopTerms(docs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2))

    // doc 1: apple tf=2 df=1 → 6.0; banana tf=1 df=2 → 1.5
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3, t._6)).toSeq ==
      Seq((1, "apple", 6.0), (2, "banana", 1.5)))
    // doc 2: banana and cherry TIE at 1.5 → token ascending breaks it
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq ==
      Seq((1, "banana"), (2, "cherry")))
    // doc 3: cherry 3*3/2=4.5 beats date 1*3/1=3.0
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3, t._6)).toSeq ==
      Seq((1, "cherry", 4.5), (2, "date", 3.0)))
  }

  test("bm25TopK ranks by hit weight, zero-scores no-hit docs, penalizes length") {
    // query terms: spark join window table fast
    val docs = Seq(
      (1L, "spark join spark"),                  // 2 terms hit, spark tf=2
      (2L, "alpha beta gamma"),                  // no hits → exactly 0.0
      (3L, "spark alpha beta gamma delta eps"),  // spark tf=1, dl=6
      (4L, "spark beta")                         // spark tf=1, dl=2 (shorter)
    ).toDF("doc_id", "text")
    val got = operators.LlmQueries.bm25TopK(docs)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))

    // global order: multi-hit doc first; same-tf docs rank by length
    // norm (shorter wins); zero-hit doc last with score exactly 0.0
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 3L, 2L))
    assert(got(3)._2 == 0.0, "a doc with no query terms must score exactly 0")
    assert(got(0)._2 > got(1)._2 && got(1)._2 > got(2)._2 && got(2)._2 > 0.0)
    assert(got.map(_._3).toSeq == Seq(3L, 2L, 6L, 3L), "dl = token count")
    assert(got.map(_._4).toSeq == Seq(2, 1, 1, 0), "n_hit = query terms present")
  }

  test("sourceOverlap computes the exact pairwise shingle-set Jaccard matrix") {
    val docs = Seq(
      ("sa", "t1 t2 t3 t4 t5 t6"), // shingles {1..5, 2..6}
      ("sb", "t1 t2 t3 t4 t5"),    // {1..5} ⊂ sa's set
      ("sc", "x1 x2 x3 x4 x5"),    // disjoint
      ("sc", "x1 x2 x3 x4 x5")     // duplicate doc — sets, not bags
    ).toDF("source", "text")
    val got = operators.LlmQueries.sourceOverlap(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("sa", "sb", 2L, 1L, 1L, 0.5),
      ("sa", "sc", 2L, 1L, 0L, 0.0),
      ("sb", "sc", 1L, 1L, 0L, 0.0)))
  }

  test("stupidBackoff scores leave-one-source-out with exact floor-division backoff") {
    // Hand-computed corpus hitting all four backoff levels, PLUS the two
    // rollup-correction paths the kernel derives lower-order counts from:
    // d6 has no trigrams (its (a,b) bigram exists ONLY via the last-bigram
    // correction stream — without it d1 scores 1000000, not 500000) and d7
    // is a single token (exists ONLY via the last-token correction —
    // without it d1's unigram-d backoff halves).
    val docs = Seq(
      (1L, "A", "a b c d"),
      (2L, "B", "a b c"),
      (3L, "C", "x b c q q"),
      (4L, "D", "p q d"),
      (5L, "E", "z z w"),
      (6L, "B", "a b"),
      (7L, "D", "d")
    ).toDF("doc_id", "source", "text")
    val got = operators.LlmQueries.stupidBackoff(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    // N=21 tokens. d1: (a,b,c) seen in B → 1000000·1/2 (c12x counts d6's
    // corrected (a,b)); (b,c,d) backs off to unigram d (d7 doubles the
    // outside count): 2·160000/17. d5's trigram/bigram/unigram exist
    // nowhere else → OOV. Docs 6/7 emit no trigram rows.
    assert(got.toSeq == Seq(
      (1L, 2L, 259411L, 1L, 0L, 1L, 0L),
      (2L, 1L, 1000000L, 1L, 0L, 0L, 0L),
      (3L, 3L, 95555L, 0L, 1L, 2L, 0L),
      (4L, 1L, 9411L, 0L, 0L, 1L, 0L),
      (5L, 1L, 0L, 0L, 0L, 0L, 1L)))
  }

  test("stupidBackoffCms returns q131's exact scores plus all-true probe audits on the hand corpus") {
    // Same 7-doc corpus as the stupidBackoff spec: the scores/level counts
    // must be BIT-IDENTICAL to the exact kernel (the CMS path substitutes
    // lookups, never scoring arithmetic), and at this vocabulary the
    // sketches are collision-free so every est == exact and all three
    // audit booleans hold.
    val docs = Seq(
      (1L, "A", "a b c d"), (2L, "B", "a b c"), (3L, "C", "x b c q q"),
      (4L, "D", "p q d"), (5L, "E", "z z w"), (6L, "B", "a b"),
      (7L, "D", "d")
    ).toDF("doc_id", "source", "text")
    val exact = operators.LlmQueries.stupidBackoff(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
    val cms = operators.LlmQueries.stupidBackoffCms(docs).collect()
    val scores = cms.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toSeq
    assert(scores == exact, "CMS twin must score bit-identically")
    assert(cms.forall(r => r.getBoolean(7) && r.getBoolean(8) && r.getBoolean(9)),
      "every probe audit must hold")
  }

  test("sbCmsReduction: constant sketch bytes, zero violations, rows track the count tables") {
    val docs = Seq(
      (1L, "A", "a b c d"), (2L, "B", "a b c"), (3L, "C", "x b c q q"),
      (4L, "D", "p q d"), (5L, "E", "z z w")
    ).toDF("doc_id", "source", "text")
    val (rows, bytes, viol) = operators.LlmQueries.sbCmsReduction(docs)
    // count tables: tcs 7 rows ((a,b,c)x2 sources, (b,c,d), (x,b,c),
    // (b,c,q), (c,q,q), (p,q,d), (z,z,w) -> 8? counted distinct
    // (trigram, source) pairs), bcs + ucs similar — pin the invariants,
    // not the arithmetic: every (tag,key_src) row is distinct, sketches
    // are fixed-size, and no probe violates its bound.
    assert(rows > 0 && viol == 0L)
    // six sketches at eps 2e-4 / confidence 0.999: width 10000, depth 10,
    // 8-byte counters -> ~800 KB each; the exact framing adds headers.
    // The point for the scale table: this number is corpus-INDEPENDENT.
    assert(bytes > 6L * 100000 && bytes < 6L * 2000000)
  }

  test("shingles64 is the md5 fold of the distinct shingle set") {
    val out = spark.sql(
      "SELECT graft_shingles64('a b c a b c a b', 5) AS h," +
        " graft_shingles('a b c a b c a b', 5) AS s")
      .collect().head
    val hs = out.getSeq[Long](0)
    val ss = out.getSeq[String](1)
    assert(hs.length == ss.length, "hash set dedups exactly like the string set")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = ss.map { s =>
      val d = md.digest(s.getBytes("UTF-8"))
      var h = 0L; (0 until 8).foreach(i => h = (h << 8) | (d(i) & 0xFFL))
      java.lang.Long.remainderUnsigned(h, functions.TextHash.MinHashP)
    }
    assert(hs == expect, "fold must match u64(md5[0:16]) mod 2^61-1")
  }

  test("q137 BPE merges: hand-traced 3 rounds — overlapping counts, " +
    "lexicographic tie-break, greedy merge incl. back-to-back pairs") {
    import spark.implicits._
    // round 1: pairs (a,b)=3 (b,a)=1 (b,c)=2 (c,c)=1 → merge (a,b);
    //   doc1 'a b a b c' has BACK-TO-BACK (a,b) occurrences — both must
    //   merge (the double-space rendering makes replace() token-greedy)
    //   → 'a_b a_b c'; doc2 'a b c c' → 'a_b c c'; applied = 3.
    // round 2: (a_b,a_b)=1 (a_b,c)=2 (c,c)=1 → merge (a_b,c), applied 2.
    // round 3: (a_b,a_b_c)=1 (a_b_c,c)=1 — tie on count, lexicographic
    //   (w1,w2) picks (a_b, a_b_c); applied 1.
    val docs = Seq((1L, "a b a b c"), (2L, "a b c c")).toDF("doc_id", "text")
    val got = operators.LlmQueries.bpeMerges(docs)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "a", "b", 3L, 3L),
      (2, "a_b", "c", 2L, 2L),
      (3, "a_b", "a_b_c", 1L, 1L)))
  }

  test("q141 BPE encode: the q137 trace applied — per-source token sums " +
    "and exact compression micro-units") {
    import spark.implicits._
    // same corpus and merge trace as the q137 test: merges (a,b) →
    // (a_b,c) → (a_b,a_b_c). Doc 1 'a b a b c' (5 tokens) encodes to the
    // single token a_b_a_b_c; doc 2 'a b c c' (4 tokens) to 'a_b_c c'.
    val docs = Seq((1L, "a b a b c", "srcA"), (2L, "a b c c", "srcB"))
      .toDF("doc_id", "text", "source")
    val got = operators.LlmQueries.bpeEncode(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      "srcA" -> ((1L, 5L, 1L, 200000L)), // 5 → 1 token: 10⁶·1/5
      "srcB" -> ((1L, 4L, 2L, 500000L))), // 4 → 2 tokens: 10⁶·2/4
      s"unexpected encode stats: $got")
  }

  test("q138 chunk dedup audit: hand-computed decile histogram over planted " +
    "whole-doc and single-chunk duplicates") {
    import spark.implicits._
    def words(prefix: String, n: Int, from: Int = 1): String =
      (from until from + n).map(i => s"$prefix$i").mkString(" ")
    // docs 1/2: identical 64-token texts → both 32-token chunks duplicated
    // (decile 10). docs 3/4: share ONLY the first chunk (doc 3's tail is 8
    // b-tokens, doc 4's is 32 c-tokens) → 1 of 2 chunks dup (decile 5).
    val shared = words("b", 32)
    val docs = Seq(
      (1L, words("a", 64)),
      (2L, words("a", 64)),
      (3L, shared + " " + words("b", 8, from = 33)),
      (4L, shared + " " + words("c", 32))
    ).toDF("doc_id", "text")
    val got = operators.LlmQueries.chunkDedupAudit(docs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      10 -> ((2L, 4L, 4L)), // docs 1, 2: 2 chunks each, all dup
      5 -> ((2L, 4L, 2L))), // docs 3, 4: first chunk shared, tails unique
      s"unexpected histogram: $got")
  }

  test("q149 shard manifest: 16 complete shards, shares sum to ~1, " +
    "assignment matches the q105 hash") {
    import spark.implicits._
    val docs = (0 until 160).map(i =>
      (i.toLong, s"w$i a b c", s"src${i % 3}")).toDF("doc_id", "text", "source")
    val rows = operators.LlmQueries.shardManifest(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
      .toMap
    assert(rows.keySet.subsetOf("0123456789abcdef".map(_.toString).toSet),
      s"hex-nibble shards only: ${rows.keySet}")
    assert(rows.values.map(_._1).sum == 160L, "every doc lands in a shard")
    assert(rows.values.map(_._2).sum == 160L * 4, "token mass conserved")
    val shareSum = rows.values.map(_._3).sum
    assert(shareSum > 1000000L - 16 && shareSum <= 1000000L,
      s"floored shares must sum to just under 1: $shareSum")
    // assignment is the exact q105 bucket (shared addressing scheme)
    val q105 = SparkEntry.queries("q105_hash_split")(
      spark, "/root/testdata/sf0.001")
    val manifest = operators.LlmQueries.shardManifest(
      graft.Tables.t(spark, "/root/testdata/sf0.001", "documents"))
    val buckets = q105.select("bucket").distinct().collect()
      .map(_.getString(0)).toSet
    val shards = manifest.select("shard").collect().map(_.getString(0)).toSet
    assert(buckets == shards, s"q105 buckets $buckets vs shards $shards")
  }

  test("q146 decontam sweep: flagged mass shrinks with n and every n " +
    "catches the planted leaks") {
    val rows = operators.LlmQueries.decontamSweep(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set(5, 8, 13), s"three n points: $rows")
    assert(rows(13)._1 <= rows(8)._1 && rows(8)._1 <= rows(5)._1,
      s"an n-gram hit contains every shorter-gram hit: $rows")
    assert(rows(13)._1 > 0,
      s"planted full-text leaks must surface even at 13-gram: $rows")
  }

  test("q147 threshold sweep: pair and doc counts shrink with the cut, " +
    "planted near-dups survive 0.9") {
    val rows = SparkEntry.queries("q147_neardup_threshold_sweep")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set(500000L, 700000L, 900000L), s"cuts: $rows")
    assert(rows(900000L)._1 <= rows(700000L)._1 &&
      rows(700000L)._1 <= rows(500000L)._1, s"monotone pairs: $rows")
    assert(rows(900000L)._2 <= rows(700000L)._2 &&
      rows(700000L)._2 <= rows(500000L)._2, s"monotone docs: $rows")
    assert(rows(900000L)._1 > 0,
      s"the planted (n-2)/(n+1) family sits above 0.9 for n > 29: $rows")
  }

  test("q145 quality sweep: monotone non-increasing curve per source, " +
    "shares bounded, totals consistent") {
    val rows = SparkEntry.queries("q145_quality_sweep")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sources = rows.keys.map(_._1).toSet
    val thrs = Seq(650000L, 690000L, 710000L, 730000L, 760000L)
    assert(rows.size == sources.size * 5, s"|sources|x5 rows: ${rows.size}")
    for (src <- sources; Seq(a, b) <- thrs.sliding(2)) {
      assert(rows((src, b))._1 <= rows((src, a))._1,
        s"$src: kept docs must not grow with the threshold")
      assert(rows((src, b))._2 <= rows((src, a))._2,
        s"$src: kept tokens must not grow with the threshold")
    }
    assert(rows.values.forall(v => v._3 >= 0 && v._3 <= 1000000),
      "token share is a micro-unit fraction")
    // the curve must actually bend somewhere (non-vacuous thresholds)
    assert(rows.values.map(_._1).toSet.size > 1, s"flat curve: $rows")
  }

  test("q144 funnel: every stage strictly removes its planted family and " +
    "token mass tracks doc mass") {
    val rows = operators.LlmQueries.trainingFunnel(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val order = Seq("s0_corpus", "s1_exact", "s2_neardup", "s3_decontam",
      "s4_quality")
    assert(rows.keySet == order.toSet, s"five stages expected: $rows")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b)._1 < rows(a)._1,
        s"$b must strictly remove docs after $a: $rows")
      assert(rows(b)._2 < rows(a)._2,
        s"$b must strictly remove tokens after $a: $rows")
    }
    // the plants are sized: exact dups ~1/7, near-dups ~1/10 of the base,
    // eval leak+members ~2/50, spam ~1/25 — the funnel keeps the majority
    assert(rows("s4_quality")._1 > rows("s0_corpus")._1 / 2, s"over-scrub: $rows")
  }

  test("q143 lang consistency: a code-switched doc's tail chunk dissents, " +
    "flipping the doc argmax and tripping the mixed flag") {
    import spark.implicits._
    // doc 1: 32 English-flavored tokens (5 stopword hits) + 32 German
    // stopword tokens → doc-level argmax 'de' (32/64 > 5/64), chunk 1
    // votes 'en', chunk 2 'de' → consistency 1/2, mixed (10·1 < 8·2).
    // doc 2: one all-English chunk → fully consistent, not mixed.
    val en32 = ("the a of and to" + " filler" * 27).trim // 5 + 27 = 32 tokens
    val de32 = Seq.fill(7)("der die und das ist").mkString(" ")
      .split(" ").take(32).mkString(" ")
    val docs = Seq(
      (1L, "en", en32 + " " + de32),
      (2L, "en", en32)
    ).toDF("doc_id", "lang", "text")
    val got = operators.LlmQueries.langConsistency(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getInt(6)))).toMap
    assert(got(1L) == (("de", 2L, 1L, 500000L, 1)), s"mixed doc: ${got(1L)}")
    assert(got(2L) == (("en", 1L, 1L, 1000000L, 0)), s"pure doc: ${got(2L)}")
  }

  test("q142 chunk scrub: first occurrence kept, copies stripped, " +
    "fully-duplicated doc reports NULL text") {
    import spark.implicits._
    def words(prefix: String, n: Int, from: Int = 1): String =
      (from until from + n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("b", 32)
    val docs = Seq(
      (1L, words("a", 64)),                       // keeper of both a-chunks
      (2L, words("a", 64)),                       // full copy → fully scrubbed
      (3L, shared + " " + words("b", 8, from = 33)), // keeper of the b-chunk
      (4L, shared + " " + words("c", 32))         // loses chunk 0, keeps tail
    ).toDF("doc_id", "text")
    val got = operators.LlmQueries.chunkScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.getString(5))))).toMap
    assert(got(1L) == ((2L, 2L, 64L, 64L, Some(words("a", 64)))), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, 0L, 64L, 0L, None)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((2L, 2L, 40L, 40L,
      Some(shared + " " + words("b", 8, from = 33)))), s"doc3: ${got(3L)}")
    assert(got(4L) == ((2L, 1L, 64L, 32L, Some(words("c", 32)))), s"doc4: ${got(4L)}")
  }

  test("q142 chunk scrub: the forced Bloom scale path is bit-identical to " +
    "the broadcast path (r19 shuffle-volume rework)") {
    import spark.implicits._
    def words(prefix: String, n: Int, from: Int = 1): String =
      (from until from + n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("b", 32)
    val docs = Seq(
      (1L, words("a", 64)), (2L, words("a", 64)),
      (3L, shared + " " + words("b", 8, from = 33)),
      (4L, shared + " " + words("c", 32)),
      (5L, words("u", 64)) // all-unique doc: must flow map-only, kept whole
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        Option(r.getString(5)))
    // broadcastDupCap = -1 < nDup forces the Bloom split; the default cap
    // takes the broadcast join. Same rows either way — a Bloom false
    // positive dies on the left join's null keeper, a Bloom negative is
    // PROVABLY unique (one-sided error), so the paths cannot diverge.
    val bloom = operators.LlmQueries.chunkScrub(docs, broadcastDupCap = -1L)
      .collect().map(key).toSet
    val bcast = operators.LlmQueries.chunkScrub(docs)
      .collect().map(key).toSet
    assert(bloom == bcast, s"paths diverge:\n$bloom\nvs\n$bcast")
    assert(bloom.exists(t => t._1 == 5L && t._6 == Some(words("u", 64))),
      "the all-unique doc must survive intact through the Bloom path")
  }

  test("q142 keeper packing: 2^32-stride packed min equals the struct min, " +
    "including pairs that aliased under the old 10^5 stride") {
    import spark.implicits._
    // (h, doc_id, chunk_id): under the retired doc_id*100000+chunk_id
    // packing, (1, 150000) packed to 250000 and LOST to (2, 0)'s 200000 —
    // the ADVICE r14 aliasing bug. The 2^32 stride keeps packed order =
    // lexicographic (doc_id, chunk_id) order for any chunk_id < 2^32.
    val rows = Seq(
      ("x", 1L, 150000L), ("x", 2L, 0L),
      ("y", 7L, 99999L), ("y", 7L, 100000L),
      ("z", 3L, 0L), ("z", 2L, 4294967295L)
    ).toDF("h", "doc_id", "chunk_id")
    val got = rows.groupBy("h").agg(
      org.apache.spark.sql.functions.min(
        col("doc_id") * 4294967296L + col("chunk_id")).as("packed"),
      org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.struct(col("doc_id"), col("chunk_id")))
        .as("s"))
      .selectExpr("h", "packed", "s.doc_id * 4294967296L + s.chunk_id AS structPacked")
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"alias at $r"))
  }

  test("q139 MinHash calibration: identical pair lands in the m=16 group " +
    "with exact-micro 1000000 and zero estimator error") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    // two identical 40-token docs (same signature → every band collides →
    // guaranteed candidate; shingle sets equal → true Jaccard 1) plus one
    // unrelated doc that must produce no candidate pair with them
    val docs = Seq(
      (1L, words("x", 40)),
      (2L, words("x", 40)),
      (3L, words("z", 40))
    ).toDF("doc_id", "text")
    val rows = operators.LlmQueries.minhashCalibration(docs).collect()
    assert(rows.length == 1, s"only the identical pair may survive: ${rows.toSeq}")
    val r = rows.head
    assert(r.getInt(0) == 16 && r.getLong(1) == 1L, s"m=16 group of 1: $r")
    assert(r.getLong(2) == 1L, s"a zero-error pair is within any bound: $r")
    assert(r.getLong(3) == 1000000L && r.getLong(4) == 1000000L &&
      r.getLong(5) == 1000000L, s"exact Jaccard of identical docs is 1: $r")
  }

  test("q139 calibration bound is the exact cross-multiplied 0.35 band") {
    import spark.implicits._
    // doc 5 appends 3 tokens to doc 4's 40 → shingle sets 38 vs 41,
    // intersection 38: exact Jaccard 38/41 (926829 micro). The estimator
    // for a pair this similar stays within 0.35 of the truth whenever at
    // least 10 of 16 lanes match — and band-collision (needed for the
    // pair to be a candidate at all) implies at least 4 matching lanes,
    // with the true-positive rate at J≈0.93 making <10 matches
    // astronomically unlikely for a FIXED text (deterministic here; the
    // assertion documents the expectation, the oracle pins exactness).
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (4L, base),
      (5L, base + " xtr tok end")
    ).toDF("doc_id", "text")
    val rows = operators.LlmQueries.minhashCalibration(docs).collect()
    assert(rows.length == 1, s"one near pair expected: ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(3) == 926829L && r.getLong(4) == 926829L,
      s"exact Jaccard 38/41 in micro-units: $r")
    val m = r.getInt(0)
    assert(m >= 10 && m <= 16, s"estimator lanes for J=0.927: $r")
    assert(r.getLong(2) == r.getLong(1), s"pair must sit within the band: $r")
  }
}
