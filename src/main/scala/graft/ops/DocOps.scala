package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.keys.Keys
import graft.schema.NearDupConfig
import graft.util.CacheScope

/** Text-analysis + dedup operators over a documents table
  * (doc_id, text, ...) — the training-data-pipeline ops (exact dedup,
  * n-gram Jaccard, MinHash+LSH, containment, token/quality/lang-id/
  * fingerprint) expressed as declarative plans. All join-shaped ops are
  * blocked equi-joins (shared shingle / LSH bucket), never cartesian.
  */
object DocOps {

  /** Exact n-gram-Jaccard pairs ≥ thresholdPct/100 via PREFIX FILTERING
    * (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07; Xiao et al. PPJoin):
    * under a global shingle order, two sets with Jaccard ≥ t must share a
    * shingle within their first (n − ⌈t·n⌉ + 1) shingles, so only prefix
    * shingles are blocking keys. Ordering by (global document frequency
    * asc, shingle) puts the RAREST shingles in the prefixes — the join cost
    * is Σ over prefix-shingles of df², NOT Σ over all shingles: a stop-
    * phrase shared by every document never blocks (the naive shared-shingle
    * join was O(Σ df²) over the whole vocabulary — quadratic on any
    * vocabulary-correlated corpus). Nothing is dropped: blocking is
    * recall-lossless by the prefix-filter theorem and candidates are
    * verified with exact integer Jaccard over the full shingle sets.
    * Output: (doc1, doc2, n_inter, n_union). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, thresholdPct: Int): DataFrame = CacheScope.deferred { scope =>
    // distinct shingles as 8-byte JVM hashes (see Candidates.containmentEdges
    // — set identity is preserved modulo 64-bit collisions ~1e-19/pair)
    val withSh = scope.persistEager(docs
      .select(col(idCol).as("doc_id"),
              Keys.shingleHashUdf(k)(Keys.normCaption(col(textCol))).as("_sh"))
      .where(size(col("_sh")) > 0))
    val exploded = withSh.select(col("doc_id"), size(col("_sh")).as("nt"),
                                 explode(col("_sh")).as("s"))
    // df lookup joins only the REPEATED shingles (absent ⇒ df = 1 — the
    // minimum count() can produce, so the (df, s) ordering is unchanged,
    // provably): the frequency frame shrinks from |vocabulary| to |shingles
    // shared by ≥2 docs|, which AQE broadcasts on a near-dup-sparse corpus
    // — the exploded frame is then never shuffled by shingle for the
    // lookup. Same trick as containmentPairs / containmentEdgesIn, ported
    // round 6 (the inner join against the full frequency table was this
    // operator's largest exchange).
    val freq = exploded.groupBy("s").agg(count(lit(1)).as("_df"))
      .where(col("_df") > 1)
    val wDoc = Window.partitionBy("doc_id")
      .orderBy(coalesce(col("_df"), lit(1L)), col("s"))
    // integer ceil: ⌈nt·t⌉ = (nt·pct + 99) DIV 100. persistEager, not a
    // lazy persist or bare plan: the self-join below consumes prefix twice,
    // and a round-6 experiment dropping the persist (betting on AQE stage
    // reuse over canonically-equal exchanges) re-computed the window chain
    // per side and regressed the query ~1 s at sf0.1 — the barrier job is
    // cheaper than the double compute, and the cached frame lets AQE
    // broadcast one side of the self-join (no exchange at all).
    // explicit repartition WITH a pinned count where the window's exchange
    // would otherwise sit: AQE's coalescing is bytes-based, and under the
    // Tuning confs the ~tens-of-MB exploded frame coalesces to ~1-2
    // partitions — but the row_number sort over it, and every downstream
    // stage inheriting the cache's partitioning (the Σ df² candidate join +
    // exact-Jaccard verify), are compute-heavy far beyond their bytes
    // (measured round 6: single-threaded window+verify, +1 s at sf0.1).
    // The window reuses the pinned partitioning, so no exchange is added;
    // defaultParallelism scales with the cluster.
    val nPar = docs.sparkSession.sparkContext.defaultParallelism
    val prefix = scope.persistEager(exploded.join(freq, Seq("s"), "left")
      .repartition(nPar, col("doc_id"))
      .withColumn("_rk", row_number().over(wDoc))
      .where(col("_rk") <= col("nt") - expr(s"(nt * $thresholdPct + 99) DIV 100") + 1)
      .select("doc_id", "s"))
    val cand = prefix.select(col("doc_id").as("doc1"), col("s"))
      .join(prefix.select(col("doc_id").as("doc2"), col("s")), "s")
      .where(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
    val verified = cand
      .join(withSh.select(col("doc_id").as("doc1"), col("_sh").as("_sh1")), "doc1")
      .join(withSh.select(col("doc_id").as("doc2"), col("_sh").as("_sh2")), "doc2")
    val (inter, union) = Keys.jaccardInterUnion(col("_sh1"), col("_sh2"))
    verified
      .select(col("doc1"), col("doc2"),
              inter.cast("long").as("n_inter"), union.cast("long").as("n_union"))
      .where(col("n_inter") * 100 >= col("n_union") * thresholdPct)
  }

  /** MinHash+LSH near-dup pairs, verified with exact Jaccard — the
    * at-scale path: candidate generation is O(rows × bands) + bucket joins
    * instead of the shared-shingle join of `jaccardPairs`. Identical
    * normalized texts collapse to one representative before signatures;
    * the rep-level pair set is then expanded back to the full member-level
    * listing (cross pairs + within-group cliques — what `jaccardPairs`
    * emits for duplicate texts). Output (doc1, doc2) — equal to
    * `jaccardPairs` ids whenever LSH recall is 1 (the S-curve at the
    * corpus' planted similarities makes misses ~1e-8). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      cfg: NearDupConfig): DataFrame = CacheScope.deferred { scope =>
    val (repPairs, members, shingledReps, _) =
      graft.candidates.Candidates.captionLshPartsIn(docs, idCol, textCol, cfg,
        pairComplete = true)(scope)
    graft.candidates.Candidates.expandRepPairs(repPairs, members, shingledReps)
      .select(col("id1").as("doc1"), col("id2").as("doc2"))
  }

  /** MinHash+LSH near-dup EDGES in connectivity form — for clustering
    * consumers (connected components), which need the same COMPONENTS as
    * `minhashLshPairs`, not the full pair listing: verified rep-level pairs
    * plus one rep—member star per identical-text group with ≥1 shingle.
    * The quadratic member-level expansion (`expandRepPairs`) adds no
    * connectivity, so clustering over these edges yields identical cluster
    * assignments at Θ(groups) instead of Θ(listing) edges — the shape the
    * flagship uses at 100 TB. Candidate generation stays pair-complete, so
    * verification sees exactly the pairs the listing form verifies.
    * Output (doc1, doc2). */
  def minhashLshEdges(docs: DataFrame, idCol: String, textCol: String,
                      cfg: NearDupConfig): DataFrame = CacheScope.deferred { scope =>
    val (repPairs, members, shingledReps, _) =
      graft.candidates.Candidates.captionLshPartsIn(docs, idCol, textCol, cfg,
        pairComplete = true)(scope)
    val stars = members.join(shingledReps, Seq("rep"), "left_semi")
      .where(col("id") =!= col("rep"))
      .select(col("rep").as("doc1"), col("id").as("doc2"))
    repPairs.select(col("id1").as("doc1"), col("id2").as("doc2"))
      .unionByName(stars)
  }

  /** Contained-text pairs: shorter text is a substring of the longer (at
    * word boundaries — both sides space-padded). Blocking: every shingle of
    * the short side must appear in the long side, so any one shingle is a
    * recall-lossless block key; picking the short side's globally LEAST
    * FREQUENT shingle (classic prefix filtering, à la PPJoin) minimizes
    * bucket sizes — a naive first-shingle key degenerates quadratically
    * when many texts share a prefix. Output (short_id, long_id). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = CacheScope.deferred { scope =>
    // shingles are JVM-hashed longs (see Candidates.containmentEdges —
    // block identity only; the substring verify uses the strings)
    // eager: feeds several AQE-concurrent exchanges (see CacheScope.persistEager)
    val norm = scope.persistEager(docs
      .select(col(idCol).as("doc_id"), Keys.normCaption(col(textCol)).as("_nc"))
      .withColumn("_sh", Keys.shingleHashUdf(k)(col("_nc")))
      .where(size(col("_sh")) > 0))
    // ship (id, text-LENGTH, block) — never the text: see
    // Candidates.containmentEdgesIn (3.6 GB → ~0.7 GB shuffle at 1M docs)
    val exploded = norm.select(col("doc_id"), length(col("_nc")).as("_len"),
                               explode(col("_sh")).as("block"))
    // per-doc argmin by (df, shingle): frequency table filtered to df ≥ 2
    // blocks (absent ⇒ df = 1 — same ordering, provably) so the df lookup
    // left-joins a small broadcastable frame instead of shuffling the
    // ~(shingles×docs) exploded frame by block — see containmentEdgesIn.
    // min_by, NOT a row_number window: the hash aggregate map-side-combines
    // each partition down to one row per doc before the shuffle.
    val freq = exploded.groupBy("block").agg(count(lit(1)).as("_df"))
      .where(col("_df") > 1)
    val short = exploded.join(freq, Seq("block"), "left")
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("block"), col("_len")),
                  struct(coalesce(col("_df"), lit(1L)), col("block"))).as("_pick"))
      .select(col("doc_id").as("short_id"), col("_pick._len").as("_slen"),
              col("_pick.block").as("block"))
    // the block join ships only (id, caption-length, block); the caption
    // STRINGS rejoin below for candidate pairs only — the ~shingles×docs
    // exploded shuffle carries ~45 B/row instead of the full text payload.
    // (short_id, block) and (long_id, block) are both unique, so the join
    // emits each candidate pair at most once. The long side IS the exploded
    // frame — no separate re-explode pass.
    val long = exploded.select(col("doc_id").as("long_id"),
                               col("_len").as("_llen"), col("block"))
    short.join(long, "block")
      .where(col("short_id") =!= col("long_id") && col("_llen") > col("_slen"))
      .select("short_id", "long_id")
      .join(norm.select(col("doc_id").as("short_id"), col("_nc").as("s_nc")), "short_id")
      .join(norm.select(col("doc_id").as("long_id"), col("_nc").as("l_nc")), "long_id")
      .where(instr(concat(lit(" "), col("l_nc"), lit(" ")),
                   concat(lit(" "), col("s_nc"), lit(" "))) > 0)
      .select("short_id", "long_id")
      .distinct()
  }

  /** SimHash near-dup pairs — the classic web-dedup contract (Manku et
    * al., WWW'07): all pairs whose 64-bit SimHash signatures sit within
    * Hamming distance `cfg.simhashRadius`. Signatures hash tokens with md5
    * (`Keys.simhashMd5Udf`) so any SQL oracle recomputes them bit-for-bit.
    * Blocking is multi-index Hamming (4 × 16-bit chunks + 1-flip probes —
    * recall GUARANTEED to the full radius by pigeonhole, never
    * probabilistic); verification is exact `bit_count`. A wide,
    * Jaccard-complete radius is deliberately NOT the contract: on
    * vocabulary-correlated corpora ~36% of random pairs sit within
    * distance 15, so any blocking complete at 15 is inherently quadratic
    * (see NearDupConfig). Identical normalized texts collapse to a
    * representative and expand back afterwards (within-group cliques at
    * distance 0 + cross pairs at the rep distance).
    * Output (doc1, doc2, hamming_d), doc1 < doc2. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   cfg: NearDupConfig): DataFrame =
    CacheScope.deferred(simhashPairsIn(docs, idCol, textCol, cfg)(_))

  /** Lazy body of `simhashPairs` (intermediates persist into `scope`;
    * plan-shape tests inspect this un-sealed form). */
  private[graft] def simhashPairsIn(docs: DataFrame, idCol: String, textCol: String,
                                    cfg: NearDupConfig)(scope: CacheScope): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), Keys.normCaption(col(textCol)).as("_nc"))
    // collapse identical normalized texts to one representative (skew guard,
    // same as the LSH path)
    val repW = Window.partitionBy(col("_nc"))
    // LAZY persists: multiIndexHammingPairsIn's eager `indexed` count is the
    // operator's one barrier, and its linear chain (indexed ← reps ← withRep)
    // builds both caches in that same job — eager counts here were redundant
    // barriers (round-3 eager-seal regression). Every later consumer (the
    // verify joins, member expansion, cliques) reads the built caches.
    val withRep = scope.persist(base.withColumn("_rep", min("doc_id").over(repW)))
    val members = withRep.select(col("doc_id").as("id"), col("_rep").as("rep"))
    val reps = scope.persist(withRep.where(col("doc_id") === col("_rep"))
      .select(col("doc_id"), Keys.tokens(col("_nc")).as("_t"))
      .where(size(col("_t")) > 0)
      .select(col("doc_id"), Keys.simhashMd5Udf(col("_t")).as("_sim")))
    // dfCap disabled: this operator's contract is EXACT (every pair within
    // the radius, SQL-oracle-checked bit-for-bit), unlike the phash
    // candidate source where hot degenerate buckets are droppable
    val (repPairs, _) = graft.candidates.Candidates.multiIndexHammingPairsIn(
      reps, "doc_id", "_sim",
      cfg.simhashBands, cfg.simhashSubRadius, cfg.simhashRadius,
      dfCap = Int.MaxValue)(scope)
    // member expansion carrying the distance: cross pairs inherit the rep
    // distance (identical text ⇒ identical signature); identical-text
    // groups pair at distance 0
    val cross = repPairs
      .join(members.select(col("rep").as("id1"), col("id").as("_m1")), "id1")
      .join(members.select(col("rep").as("id2"), col("id").as("_m2")), "id2")
      .select(least(col("_m1"), col("_m2")).as("doc1"),
              greatest(col("_m1"), col("_m2")).as("doc2"), col("hamming_d"))
    val grouped = members
      .join(reps.select(col("doc_id").as("rep")), Seq("rep"), "left_semi")
    val cliques = grouped.select(col("rep"), col("id").as("_a"))
      .join(grouped.select(col("rep"), col("id").as("_b")), "rep")
      .where(col("_a") < col("_b"))
      .select(col("_a").as("doc1"), col("_b").as("doc2"),
              lit(0).as("hamming_d"))
    // no trailing distinct: repPairs is distinct (multiIndexHammingPairsIn
    // ends in one), member→rep is functional so cross pairs are unique, and
    // cross (different reps) is disjoint from cliques (same rep) — see
    // Candidates.expandRepPairs' precondition note. The old `.distinct()`
    // re-shuffled the operator's largest frame for nothing.
    cross.unionByName(cliques)
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
