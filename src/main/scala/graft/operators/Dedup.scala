package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Deduplication operators for training-data pipelines (SURVEY.md §2.C).
  *
  * Scale design (100 TB): every variant avoids the quadratic all-pairs
  * comparison. Exact dedup shuffles only (hash, id) — never full text.
  * MinHash/SimHash compute signatures as pure projections (no shuffle),
  * then shuffle only band keys whose bucket fan-in is bounded; candidate
  * verification joins only within buckets. Hashes are md5-derived so the
  * DuckDB oracle reproduces every bit; a production deployment with no
  * oracle requirement would swap in xxhash64 (same structure, faster).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * One shuffle of (16-byte hash, id, count) regardless of text size. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  def ddExact(spark: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(spark, dir)).orderBy("keep_id")

  val ddExactSql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** Incremental exact dedup: drop new documents whose content hash is
    * already in the historical corpus — the shape every append-only
    * training pipeline runs per batch. left_anti on the hash: the
    * historical side is (hash) only (16 bytes/doc however large the
    * corpus), and the join shuffles hashes, never text. */
  def incrementalExact(newDocs: DataFrame, knownHashes: DataFrame): DataFrame =
    newDocs.withColumn("_h", md5(col("text")))
      .join(knownHashes.select(col("h").as("_h")), Seq("_h"), "left_anti")
      .drop("_h")

  /** Tall (doc_id, shingle) with distinct word-3-gram shingles.
    *
    * Built entirely from native expressions — `arrays_zip` of the token
    * array with its two shifted slices, explode, concat, then a distinct.
    * The obvious `transform(sequence(...), i -> ...)` formulation is a
    * higher-order function, which Catalyst evaluates with an interpreted
    * per-element lambda (CodegenFallback): measured ~3 s per pass over 5k
    * docs vs ~0.2 s for this zip form — and worse, a filter on the HOF
    * result gets pushed into the scan with the lambda duplicated inside
    * it. Zip rows whose 2nd/3rd word is null (the last two positions) are
    * dropped, which also drops docs with <3 tokens.
    *
    * NOT deduplicated: a corpus-wide distinct on (doc_id, string) is the
    * single most expensive step at scale (measured 6 s → 70 s at 23M
    * shingles), and min-aggregates (minhash signatures) are
    * duplicate-insensitive. Consumers that need set semantics dedupe
    * their own — much smaller — slices. */
  def tallShingles(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    docs.select(col("doc_id"),
        explode(arrays_zip(w, slice(w, lit(2), size(w)), slice(w, lit(3), size(w)))).as("z"))
      .filter(col("z.2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("z.0"), col("z.1"), col("z.2")).as("s"))
  }

  /** MinHash (k=16) + LSH banding (4 bands x 4 rows): candidate pairs with
    * verified Jaccard. Signatures and band keys are projections; the only
    * shuffles are the band-key self-join (bucket-bounded) and the final
    * pair verification join. Each minhash is the lexicographic min of
    * md5("j|" + shingle) — string min, identical in any engine. */
  def minhashLsh(docs: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    // tall is a cheap shuffle-free projection (scan + explode), recomputed
    // by each consumer; duplicates are fine for the min-aggregates and are
    // deduped on the tiny candidate slice below.
    val tall = tallShingles(docs)
    // k codegen'd min(md5) aggregates over the tall table — partial
    // aggregation combines map-side, so the shuffle carries k hashes per
    // doc. (The per-doc HOF formulation array_min(transform(...)) is
    // interpreted per element — measured ~4x slower end-to-end.)
    val sig = tall.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("0|"), col("s")))).as("mh0"),
      (1 until k).map(j =>
        min(md5(concat(lit(s"$j|"), col("s")))).as(s"mh$j")): _*)
    // banded feeds both sides of the candidate self-join — materialize
    // (tiny: docs x bands rows) so the signature aggregation runs once
    val banded = sig.select(col("doc_id"), posexplode(array(
      (0 until bands).map(b => md5(concat_ws("|",
        (0 until rows).map(r => col(s"mh${rows * b + r}")): _*))): _*)))
      .toDF("doc_id", "b", "bk")
      .localCheckpoint()
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with true Jaccard (shared = |A ∩ B|,
    // J = shared / (|A| + |B| - shared)). First slice the tall table down
    // to candidate doc_ids with ONE broadcast semi-join map pass — after
    // that every verification join touches thousands of rows, not the
    // corpus: no composite-key shuffle or sort of the full shingle table.
    val candIds = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val tallCand = tall.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .distinct() // set semantics for |A ∩ B| / sizes — tiny slice only
      .localCheckpoint()
    val sizes = tallCand.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = broadcast(pairs)
      .join(tallCand.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(tallCand.as("tb"),
        col("doc_b") === col("tb.doc_id") && col("ta.s") === col("tb.s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
    broadcast(shared)
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast(DoubleType) /
          (col("na.n") + col("nb.n") - col("shared")).cast(DoubleType)).as("jaccard"))
  }

  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLsh(Tables.documents(spark, dir)).orderBy("doc_a", "doc_b")

  val ddMinhashLshSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |sig AS (
      |  SELECT doc_id, shingles,
      |    list_transform(['0','1','2','3','4','5','6','7','8','9','10','11','12','13','14','15'],
      |      j -> list_min(list_transform(shingles, s -> md5(j||'|'||s)))) AS mh
      |  FROM sh),
      |bands AS (
      |  SELECT doc_id, b, md5(mh[4*b+1]||'|'||mh[4*b+2]||'|'||mh[4*b+3]||'|'||mh[4*b+4]) AS bk
      |  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |  CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) AS jaccard
      |FROM pairs JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  /** 64-bit (here 60-bit, md5-derived) SimHash + 15-bit-band candidate
    * pairs within hamming distance 3. The bit-sum aggregation decomposes
    * into partial aggregates (map-side combine), so the shuffle carries 60
    * longs per doc, not tokens. */
  def simhash(docs: DataFrame, nBits: Int = 60): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val h = tok.select(col("doc_id"),
      conv(substring(md5(col("t")), 1, 15), 16, 10).cast(LongType).as("hv"))
    val bitSums = h.groupBy(col("doc_id")).agg(
      sum(when(shiftright(col("hv"), 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("s0"),
      (1 until nBits).map(b =>
        sum(when(shiftright(col("hv"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")): _*)
    bitSums.select(col("doc_id"),
      (0 until nBits).map(b =>
        when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
        .reduce(_ + _).as("sh"))
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // materialize: the band self-join would otherwise run the whole
    // tokenize + 60-bit-sum pipeline once per side
    val sim = simhash(docs).localCheckpoint()
    val banded = sim.select(col("doc_id"), col("sh"), posexplode(array(
      (0 until 4).map(b => shiftright(col("sh"), 15 * b).bitwiseAND(32767)): _*)))
      .toDF("doc_id", "sh", "b", "bk")
    banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(spark, dir)).orderBy("doc_a", "doc_b")

  val ddSimhashSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
      |h AS (SELECT doc_id, ('0x'||substr(md5(t),1,15))::BIGINT AS hv FROM tok),
      |bits AS (
      |  SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM h CROSS JOIN (SELECT unnest(range(0,60)) AS b) GROUP BY doc_id, b),
      |sim AS (
      |  SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END)::BIGINT AS sh
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, sh, b2, (sh >> (15*b2)) & 32767 AS bk
      |  FROM sim CROSS JOIN (SELECT unnest([0,1,2,3]) AS b2)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |    bit_count(xor(x.sh, y.sh)) AS hamming
      |  FROM bands x JOIN bands y ON x.b2 = y.b2 AND x.bk = y.bk AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Word-3-gram Jaccard pair similarity via an inverted-index join on
    * shared shingles: pairs are generated only where at least one shingle
    * is shared (never the full cross product), counted per pair, then
    * J = shared / (|A| + |B| - shared). At 100 TB the posting list of a
    * degenerate (stopword-only) shingle bounds fan-in — production adds a
    * document-frequency cap on shingles; the planted corpus needs none. */
  def ngramJaccard(docs: DataFrame, minJaccard: Double = 0.5,
                   maxDocFreq: Int = 1000): DataFrame = {
    // join on a 60-bit hash of the shingle, not the string: the shuffle
    // carries 8-byte keys instead of ~20-byte text, and the per-doc
    // distinct runs on longs (cheap) not strings. Both engines use the
    // same md5-derived hash, so results are identical by construction
    // (within-doc 60-bit collisions: ~1e-15 per doc, ignored).
    val tall = tallShingles(docs).select(col("doc_id"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast(LongType).as("s"))
      .distinct()
      .localCheckpoint()
    val sizes = tall.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // document-frequency cap: a shingle appearing in >maxDocFreq docs (a
    // stopword run) contributes O(df^2) candidate pairs and no near-dup
    // signal — drop it from pair *generation* (set sizes keep the full
    // sets, so reported Jaccard is a lower bound for affected pairs; with
    // sparse/natural corpora below the cap, results are exact — the test
    // tables' max posting is ~25). Corpora dense enough that typical
    // shingles exceed the cap need the LSH path (minhashLsh), not
    // exact all-pairs Jaccard.
    val hot = tall.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select(col("s"))
    val pruned = tall.join(broadcast(hot), Seq("s"), "left_anti")
    pruned.as("x").join(pruned.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast(DoubleType) /
          (col("na.n") + col("nb.n") - col("shared")).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccard(Tables.documents(spark, dir)).orderBy("doc_a", "doc_b")

  val ddNgramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |tall AS (SELECT doc_id, ('0x'||substr(md5(unnest(shingles)),1,15))::BIGINT AS s FROM sh),
      |shared AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS shared
      |  FROM tall x JOIN tall y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id)
      |SELECT doc_a, doc_b, shared,
      |  CAST(shared AS DOUBLE) / CAST(len(sa.shingles) + len(sb.shingles) - shared AS DOUBLE) AS jaccard
      |FROM shared JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id
      |WHERE CAST(shared AS DOUBLE) / CAST(len(sa.shingles) + len(sb.shingles) - shared AS DOUBLE) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Embedding-cosine near-dup pairs above a threshold, exact. (The test
    * corpus is random vectors — max pairwise cos ~0.5 — so the default
    * threshold is 0.4; a real near-dup sweep would use ~0.95.) The dot
    * product is a sequential left fold over doubles so the oracle's
    * list_dot_product matches bit-for-bit. This exact variant compares all
    * pairs (fine for a near-dup audit of a bucketed shard); the 100 TB
    * path buckets by hyperplane LSH first — see [[Similarity.lshTopK]]. */
  def embedCosinePairs(emb: DataFrame, minCos: Double = 0.4): DataFrame = {
    val v = emb.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val withNorm = v.withColumn("n2", Similarity.dot(col("v"), col("v")))
    withNorm.as("a").join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (Similarity.dot(col("a.v"), col("b.v")) /
          (sqrt(col("a.n2")) * sqrt(col("b.n2")))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  def ddEmbedCosine(spark: SparkSession, dir: String): DataFrame =
    embedCosinePairs(Tables.embeddings(spark, dir)).orderBy("vec_a", "vec_b")

  val ddEmbedCosineSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM v)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) AS cos
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Edit-distance verification over LSH candidates: the precision pass a
    * title/short-text dedup pipeline runs after banding. Quadratic-cost
    * levenshtein touches only the candidate pairs LSH surfaced — never
    * the corpus cross product. */
  def editDistancePairs(docs: DataFrame): DataFrame = {
    val pairs = minhashLsh(docs).select(col("doc_a"), col("doc_b"))
    val texts = docs.select(col("doc_id"), col("text"))
    broadcast(pairs)
      .join(texts.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(texts.as("tb"), col("doc_b") === col("tb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta.text"), col("tb.text")).as("edit_dist"),
        length(col("ta.text")).as("len_a"), length(col("tb.text")).as("len_b"))
  }

  def ddEditdist(spark: SparkSession, dir: String): DataFrame =
    editDistancePairs(Tables.documents(spark, dir)).orderBy("doc_a", "doc_b")

  val ddEditdistSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |sig AS (
      |  SELECT doc_id, shingles,
      |    list_transform(['0','1','2','3','4','5','6','7','8','9','10','11','12','13','14','15'],
      |      j -> list_min(list_transform(shingles, s -> md5(j||'|'||s)))) AS mh
      |  FROM sh),
      |bands AS (
      |  SELECT doc_id, b, md5(mh[4*b+1]||'|'||mh[4*b+2]||'|'||mh[4*b+3]||'|'||mh[4*b+4]) AS bk
      |  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b, levenshtein(ta.text, tb.text) AS edit_dist,
      |  length(ta.text) AS len_a, length(tb.text) AS len_b
      |FROM pairs JOIN documents ta ON doc_a = ta.doc_id
      |JOIN documents tb ON doc_b = tb.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Dedup applied end-to-end: find verified near-dups (J >= 0.9), drop
    * the higher doc_id of each pair, report the surviving corpus profile —
    * the full curation-pipeline composition (candidate generation →
    * verification → policy → apply), not just pair discovery. */
  def applyNearDupPolicy(docs: DataFrame, minJaccard: Double = 0.9): DataFrame = {
    val dropIds = minhashLsh(docs)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(broadcast(dropIds), Seq("doc_id"), "left_anti")
  }

  def ddPipeline(spark: SparkSession, dir: String): DataFrame =
    applyNearDupPolicy(Tables.documents(spark, dir))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))

  val ddPipelineSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |sig AS (
      |  SELECT doc_id, shingles,
      |    list_transform(['0','1','2','3','4','5','6','7','8','9','10','11','12','13','14','15'],
      |      j -> list_min(list_transform(shingles, s -> md5(j||'|'||s)))) AS mh
      |  FROM sh),
      |bands AS (
      |  SELECT doc_id, b, md5(mh[4*b+1]||'|'||mh[4*b+2]||'|'||mh[4*b+3]||'|'||mh[4*b+4]) AS bk
      |  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id),
      |dropids AS (
      |  SELECT DISTINCT doc_b AS doc_id FROM pairs
      |  JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id
      |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |        CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE) >= 0.9)
      |SELECT lang, count(*) AS n_docs FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM dropids)
      |GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_pipeline" -> (ddPipeline _),
    "dd_editdist" -> (ddEditdist _),
    "dd_exact" -> (ddExact _),
    "dd_minhash_lsh" -> (ddMinhashLsh _),
    "dd_simhash" -> (ddSimhash _),
    "dd_ngram_jaccard" -> (ddNgramJaccard _),
    "dd_embed_cosine" -> (ddEmbedCosine _))

  val oracles: Map[String, String] = Map(
    "dd_pipeline" -> ddPipelineSql,
    "dd_editdist" -> ddEditdistSql,
    "dd_exact" -> ddExactSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_embed_cosine" -> ddEmbedCosineSql)
}
