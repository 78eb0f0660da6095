package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.keys.Keys
import graft.schema.NearDupConfig

/** Text-analysis + dedup operators over a documents table
  * (doc_id, text, ...) — the training-data-pipeline ops (exact dedup,
  * n-gram Jaccard, MinHash+LSH, containment, token/quality/lang-id/
  * fingerprint) expressed as declarative plans. All join-shaped ops are
  * blocked equi-joins (shared shingle / LSH bucket), never cartesian.
  */
object DocOps {

  /** Distinct (doc_id, shingle) pairs — the blocking/verification unit. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
                explode(Keys.shingles(col(textCol), k)).as("s"))
      .distinct()

  /** Exact n-gram-Jaccard pairs ≥ thresholdPct/100, via shared-shingle
    * blocking: only pairs sharing ≥1 shingle are ever materialized, and the
    * intersection count falls out of the block join itself. Output:
    * (doc1, doc2, n_inter, n_union). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, thresholdPct: Int): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val inter = sh.select(col("doc_id").as("doc1"), col("s"))
      .join(sh.select(col("doc_id").as("doc2"), col("s")), "s")
      .where(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("n_inter"))
    inter
      .join(n.select(col("doc_id").as("doc1"), col("nt").as("n1")), "doc1")
      .join(n.select(col("doc_id").as("doc2"), col("nt").as("n2")), "doc2")
      .withColumn("n_union", col("n1") + col("n2") - col("n_inter"))
      .where(col("n_inter") * 100 >= col("n_union") * thresholdPct)
      .select("doc1", "doc2", "n_inter", "n_union")
  }

  /** MinHash+LSH near-dup pairs, verified with exact Jaccard — the
    * at-scale path: candidate generation is O(rows × bands) + bucket joins
    * instead of the shared-shingle join of `jaccardPairs`. Output (doc1,
    * doc2) — equal to `jaccardPairs` ids whenever LSH recall is 1 (the
    * S-curve at the corpus' planted similarities makes misses ~1e-8). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      cfg: NearDupConfig): DataFrame = {
    val (edges, _) = graft.candidates.Candidates.captionLshEdges(
      docs.withColumnRenamed(idCol, "image_id"), "image_id", textCol, cfg)
    edges.where(col("kind") === "caption_lsh")
      .select(col("id1").as("doc1"), col("id2").as("doc2"))
      .distinct()
  }

  /** Contained-text pairs: shorter text is a substring of the longer.
    * First-shingle blocking (see Candidates.containmentEdges). Output
    * (short_id, long_id). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val norm = docs
      .select(col(idCol).as("doc_id"), Keys.normCaption(col(textCol)).as("_nc"))
      .distinct()
      .withColumn("_sh", Keys.shingles(col("_nc"), k))
      .where(size(col("_sh")) > 0)
    val short = norm.select(col("doc_id").as("short_id"), col("_nc").as("s_nc"),
                            element_at(col("_sh"), 1).as("block"))
    val long = norm.select(col("doc_id").as("long_id"), col("_nc").as("l_nc"),
                           explode(col("_sh")).as("block"))
    short.join(long, "block")
      .where(col("short_id") =!= col("long_id") &&
             length(col("l_nc")) > length(col("s_nc")) &&
             instr(concat(lit(" "), col("l_nc"), lit(" ")),
                   concat(lit(" "), col("s_nc"), lit(" "))) > 0)
      .select("short_id", "long_id")
      .distinct()
  }

  /** SimHash near-dup pairs — the at-scale alternative to MinHash for
    * token-multiset similarity: one 64-bit signature per document (vs 64
    * lanes), Hamming-band blocking (pigeonhole: simhash distance ≤ bands−1
    * guarantees a shared band), then exact shingle-Jaccard verification.
    * Near-dups under the verify threshold sit at small simhash distance, so
    * with 16 × 4-bit bands the blocking recall at the corpus' planted
    * similarities is 1 (guaranteed for distance ≤ 15) and the verified
    * output equals `jaccardPairs` ids. Output (doc1, doc2). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   cfg: NearDupConfig, simhashBands: Int = 16): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), Keys.normCaption(col(textCol)).as("_nc"))
    // collapse identical normalized texts to one representative (skew guard,
    // same as the LSH path) — star edges restore them afterwards
    val repW = org.apache.spark.sql.expressions.Window.partitionBy(col("_nc"))
    val withRep = base.withColumn("_rep", min("doc_id").over(repW))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sameText = withRep.where(col("doc_id") =!= col("_rep"))
      .select(col("_rep").as("doc1"), col("doc_id").as("doc2"))
    val reps = withRep.where(col("doc_id") === col("_rep"))
      .select(col("doc_id"), col("_nc"),
              Keys.shingles(col("_nc"), cfg.shingleK).as("_sh"),
              Keys.simhashUdf(Keys.tokens(col("_nc"))).as("_sim"))
      .where(size(col("_sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = reps.select(col("doc_id"),
      posexplode(Keys.hammingBands(col("_sim"), simhashBands))
        .as(Seq("band_id", "band_val")))
    val (cand, _) = graft.candidates.Candidates.pairsWithinBuckets(
      exploded, "doc_id", Seq("band_id", "band_val"), cfg.maxBucketSize, "simhash")
    val verified = cand
      .join(reps.select(col("doc_id").as("id1"), col("_sh").as("_sh1")), "id1")
      .join(reps.select(col("doc_id").as("id2"), col("_sh").as("_sh2")), "id2")
    val (inter, union) = Keys.jaccardInterUnion(col("_sh1"), col("_sh2"))
    val thresholdPct = math.round(cfg.jaccardThreshold * 100).toInt
    verified.where(inter * 100 >= union * thresholdPct)
      .select(col("id1").as("doc1"), col("id2").as("doc2"))
      .unionByName(sameText)
      .select(least(col("doc1"), col("doc2")).as("doc1"),
              greatest(col("doc1"), col("doc2")).as("doc2"))
      .distinct()
  }

  /** BPE-ish subtoken regex: alnum runs or single non-alnum-non-space marks
    * — same semantics under Java regex (Spark) and RE2 (DuckDB). */
  val SubtokenRegex = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** Token stats: n_tokens, n_distinct_tokens (whitespace tokenization,
    * normalized) + n_subtokens (BPE-ish regex count). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Keys.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"),
                size(toks).cast("long").as("n_tokens"),
                size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
                size(regexp_extract_all(col(textCol), lit(SubtokenRegex), lit(0)))
                  .cast("long").as("n_subtokens"))
  }

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "or")

  /** Quality metrics, integer-exact (scaled percents via integer division —
    * float-free so any SQL oracle computes bit-identical values):
    * stopword_pct, distinct_pct, avg_token_len_x100. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Keys.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("_t"))
      .select(
        col("doc_id"),
        size(col("_t")).cast("long").as("n_tokens"),
        expr(s"size(filter(_t, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))")
          .as("_nstop"),
        size(array_distinct(col("_t"))).as("_ndist"),
        aggregate(col("_t"), lit(0L), (acc, x) => acc + length(x)).as("_chars"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr("_nstop * 100 DIV n_tokens").as("stopword_pct"),
        expr("_ndist * 100 DIV n_tokens").as("distinct_pct"),
        expr("_chars * 100 DIV n_tokens").as("avg_token_len_x100"))
  }

  /** n-gram-heuristic language ID: deterministic stopword-marker rule
    * (the synthetic corpus has no real language signal; the operator shape —
    * marker scan over normalized tokens — is what scales). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = Keys.normCaption(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      when(t.contains("the ") || t.contains(" the"), lit("en"))
        .when(t.contains("le ") || t.contains("la "), lit("fr"))
        .otherwise(lit("und")).as("lang_guess"))
  }

  /** Document fingerprint: minimum md5 over the shingle set (one-lane
    * MinHash — a winnowing-style content fingerprint stable under
    * reordering of duplicate shingles). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      array_min(transform(Keys.shingles(col(textCol), k), s => md5(s)))
        .as("fingerprint"))
}
