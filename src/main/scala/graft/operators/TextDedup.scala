package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

import graft.functions.TextFunctions

/** Document deduplication operators, each designed as a distributed plan that
  * survives 100 TB: no driver-side collection, candidate generation always
  * goes through a key-equality shuffle join (shingle, band key, or hash-prefix
  * block) rather than an all-pairs cross join, so cost scales with bucket
  * sizes, not corpus².
  *
  * The reference's only dedup is exact-PK insert-if-absent
  * (gcs_to_postgres.py:153-177); these generalize it to content dedup for
  * LLM-pipeline workloads.
  */
object TextDedup {

  /** Exact dedup groups: one row per distinct content hash with the count of
    * copies and the id to keep (min). Survivors = `keep_id`s; a full dedup is
    * `df.withColumn("h", md5(col(textCol))).dropDuplicates("h")`. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** doc_id → exploded distinct word-n-gram shingles. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id"), explode(col("shs")).as("sh"))

  /** N-gram Jaccard near-duplicate pairs (threshold as an exact rational
    * predicate `num*inter >= den*union`, so both engines decide ties
    * identically).
    *
    * Two-phase plan built for 100 TB: candidate generation self-joins only
    * shingles whose document frequency is <= `maxShingleDf` (the standard
    * stop-shingle cap — a corpus-common shingle like "in the of" would
    * otherwise create a quadratic join bucket), then the exact intersection
    * is recomputed over the FULL shingle sets of the candidate pairs, so
    * Jaccard scores are unbiased by the cap. A true pair is missed only if
    * every shingle it shares is corpus-common — such pairs share nothing
    * distinctive and sit below any useful threshold. The cap bounds every
    * join bucket to maxShingleDf² candidate rows regardless of corpus size.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, thresholdNum: Int, thresholdDen: Int,
                        maxShingleDf: Int = 1000): DataFrame = {
    // barrier: the shingle expression feeds several consumers (size table,
    // doc-frequency table, both candidate sides, both verify sides); one
    // exchange computes it once and ReuseExchange shares it
    val sh = shingleTable(docs, idCol, textCol, n).repartition(col("doc_id"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df_cnt"))
    val rare = sh.join(dfreq.filter(col("df_cnt") <= maxShingleDf).select("sh"), "sh")
    // the rare self-join both generates the candidates AND counts their
    // rare-shingle intersections (partial aggregation absorbs the pair
    // stream map-side — no separate dedup pass)
    val interRare = rare.as("a").join(rare.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_rare"))
    // exact correction: add the capped-out (common) shingles' contribution
    // for candidate pairs only — the common posting lists are joined
    // per-candidate on a composite (doc, shingle) key, so the quadratic
    // common-shingle self-join never happens
    val common = sh.join(dfreq.filter(col("df_cnt") > maxShingleDf).select("sh"), "sh")
    val interCommon = interRare.select("doc_a", "doc_b")
      .join(common.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(common.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter_common"))
    val inter = interRare.join(interCommon, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter_cnt",
        col("inter_rare") + coalesce(col("inter_common"), lit(0L)))
    inter
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("union_cnt", col("n_a") + col("n_b") - col("inter_cnt"))
      .filter(col("inter_cnt") * thresholdDen >= col("union_cnt") * thresholdNum)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt").cast(LongType),
        round(col("inter_cnt").cast("double") / col("union_cnt"), 6).as("jaccard"))
  }

  /** Jaccard pairs via PREFIX FILTERING (Chaudhuri et al. ICDE'06 / Xiao
    * et al. PPJoin, WWW'08): order every doc's shingles by global rarity
    * (df asc, shingle asc — one total order in both engines), index only
    * each doc's first `n - ceil(t*n) + 1` shingles, and generate candidates
    * from prefix∩prefix. PROVABLY complete for Jaccard >= t (two sets above
    * the threshold must collide inside their prefixes under any shared
    * global order) — the exact-guarantee alternative to
    * [[ngramJaccardPairs]]'s df-cap heuristic; both return identical pairs
    * at the same threshold (cross-checked by the d_ppjoin/d_ngram_jaccard
    * oracles).
    *
    * Scale shape: the rarity order needs NO global rank — the per-doc
    * prefix is a doc-partitioned window over (df, shingle), and the
    * candidate join only ever sees prefix tokens, which by construction
    * are the rare end of each doc. Verification recomputes the exact
    * intersection over full shingle sets, as everywhere else. */
  /** The PPJoin prefix table (doc_id, sh): each doc's rarest
    * n_sh - ceil(t·n_sh) + 1 shingles by (df, sh) order. Exposed so
    * ScaleSpec can probe the prefix-KEY frequency distribution — the
    * quantity that bounds the candidate join's per-key fan-out (a key
    * appearing in f prefixes contributes ~f²/2 candidate pairs). */
  def ppjoinPrefix(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, thresholdNum: Int, thresholdDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingleTable(docs, idCol, textCol, n).repartition(col("doc_id"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df_cnt"))
    val w = Window.partitionBy("doc_id").orderBy(col("df_cnt"), col("sh"))
    // prefix size: n - ceil(t*n) + 1, all-integer (ceil(a/b) = (a+b-1) div b)
    sh.join(dfreq, "sh")
      .withColumn("rn", row_number().over(w))
      .join(sz, "doc_id")
      .filter(col("rn") <=
        col("n_sh") - ((col("n_sh") * thresholdNum + thresholdDen - 1)
          .divide(thresholdDen).cast(LongType)) + 1)
      .select("doc_id", "sh")
  }

  /** Corpus-calibrated default for [[ppjoinPairs]]'s `maxPrefixDf` guard —
    * deployments facing unvetted corpora shouldn't have to guess the cap.
    * The calibration: in a corpus where per-doc rarity ranking works, the
    * prefix-KEY frequency distribution is overwhelmingly rare (ScaleSpec's
    * natural-corpus probe: hottest key ≤ max(8, nDocs/100)); an adversarial
    * block (many short docs whose rarest shingles are still shared) shows
    * up as a far-tail outlier. So the cap is a high quantile of the
    * prefix-key frequency distribution × a small headroom factor, floored
    * so degenerate/tiny corpora can't produce a cap that drops genuinely
    * rare collisions. Keys above the cap are, by the quantile's own
    * definition, hotter than (quantile)·100% of the corpus's prefix keys —
    * exactly the f²/2-fan-out outliers the guard exists for.
    *
    * Scale shape: one map-side-combinable count + a single-row
    * approx-quantile aggregate — one corpus pass, run once at calibration
    * time, no global sort. The declared d_ppjoin query keeps
    * `Int.MaxValue` (full completeness); this helper is the deployment
    * path (ScaleSpec proves the derived cap bounds the adversarial corpus
    * while keeping the planted rare-key pair). */
  def derivePrefixDfCap(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, thresholdNum: Int, thresholdDen: Int,
                        quantile: Double = 0.99, factor: Int = 4,
                        floor: Int = 16): Int = {
    val q = ppjoinPrefix(docs, idCol, textCol, n, thresholdNum, thresholdDen)
      .groupBy("sh").agg(count(lit(1)).as("f"))
      .agg(expr(s"approx_percentile(f, $quantile)")).first().getLong(0)
    math.max(floor.toLong, math.min(q * factor, Int.MaxValue.toLong)).toInt
  }

  /** EXACT-rank variant of [[derivePrefixDfCap]] for the ORACLE-GATED
    * deployment path (d_ppjoin_capped): approx_percentile is a sketch, so
    * its cap cannot be replayed bit-for-bit by another engine; this
    * derivation ranks the prefix-key frequency distribution totally
    * ((f, sh) ascending) and takes the value at rank ⌈quantile·k⌉ — both
    * engines compute the identical cap, so the capped RESULT hash-gates.
    * Cost: the same one-pass frequency aggregate plus a k-row
    * (distinct-prefix-key-sized, not corpus-sized) ordered limit. */
  def derivePrefixDfCapExact(docs: DataFrame, idCol: String, textCol: String,
                             n: Int, thresholdNum: Int, thresholdDen: Int,
                             quantile: Double = 0.99, factor: Int = 4,
                             floor: Int = 16): Int = {
    derivePrefixDfCapExactFrom(
      ppjoinPrefix(docs, idCol, textCol, n, thresholdNum, thresholdDen),
      quantile, factor, floor)
  }

  /** [[derivePrefixDfCapExact]] from an already-built (doc_id, sh) prefix
    * frame — the shared-materialization entry point: d_ppjoin_capped
    * checkpoints ONE prefix frame and both the calibration (two driver
    * actions over k distinct-key rows) and the candidate join read it,
    * instead of re-running the shingle→window→prefix pipeline three
    * times. */
  def derivePrefixDfCapExactFrom(prefix: DataFrame, quantile: Double = 0.99,
                                 factor: Int = 4, floor: Int = 16): Int = {
    // eager checkpoint: the calibration takes TWO actions (k, then the
    // rank-⌈q·k⌉ value); the frequency frame is k rows, never corpus-sized
    val freq = prefix.groupBy("sh").agg(count(lit(1)).as("f"))
      .localCheckpoint(true)
    val k = freq.count()
    if (k == 0) return floor
    val idx = math.ceil(quantile * k).toLong
    // exact rank WITHOUT sorting the k-row frequency table: the value at
    // rank ⌈q·k⌉ under (f asc, sh asc) is the smallest f whose cumulative
    // key count reaches the rank — ties on f cannot change which f VALUE
    // sits at the rank, so this equals the former orderBy.limit(idx)
    // formulation (which funneled ~0.99·k rows through one TakeOrdered
    // task) at the cost of one tiny groupBy(f) + a window over the
    // distinct-df values (hundreds of rows, not k).
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("f"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val q = freq.groupBy("f").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .filter(col("cum") >= idx)
      .agg(min(col("f"))).first().getLong(0)
    math.max(floor.toLong, math.min(q * factor, Int.MaxValue.toLong)).toInt
  }

  /** @param maxPrefixDf RUNTIME hot-key guard: prefix KEYS that appear in
    *   more than this many docs' prefixes are excluded from the candidate
    *   join. An adversarial corpus (one shingle locally-rarest in millions
    *   of short docs — low global df is no protection when every doc is
    *   short) otherwise yields ~f²/2 candidates on that single key with no
    *   bound. With the cap, per-key fan-out is ≤ maxPrefixDf² — the same
    *   bucket bound [[ngramJaccardPairs]] gets from its df cap — at a
    *   DOCUMENTED completeness trade: a pair is missed only if EVERY prefix
    *   token it shares is hot, i.e. the pair shares nothing that is rare
    *   among prefixes (the exact analogue of the df-cap trade). Default
    *   Int.MaxValue = off: the declared d_ppjoin query keeps PPJoin's full
    *   completeness guarantee, and deployments facing unvetted corpora set
    *   a cap (ScaleSpec plants the adversarial corpus and proves the
    *   bound + the surviving-pair behavior). */
  def ppjoinPairs(docs: DataFrame, idCol: String, textCol: String,
                  n: Int, thresholdNum: Int, thresholdDen: Int,
                  maxPrefixDf: Int = Int.MaxValue,
                  prefixOverride: Option[DataFrame] = None): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n).repartition(col("doc_id"))
    val prefixAll = prefixOverride.getOrElse(
      ppjoinPrefix(docs, idCol, textCol, n, thresholdNum, thresholdDen))
    val prefix =
      if (maxPrefixDf == Int.MaxValue) prefixAll
      else {
        // prefix-KEY frequency (how many docs carry sh in their prefix) is
        // itself a map-side-combinable count — the guard costs one small
        // aggregate + one key-equality semi join, never a global sort
        val hot = prefixAll.groupBy("sh").agg(count(lit(1)).as("pf_cnt"))
          .filter(col("pf_cnt") <= maxPrefixDf).select("sh")
        prefixAll.join(hot, "sh")
      }
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verification joins the candidate pairs to per-doc shingle SETS and
    // intersects the two arrays in one codegen'd expression per pair —
    // NOT the exploded (doc, shingle) form: that formulation shuffles and
    // sort-aggregates Σ(n_a+n_b) rows over all candidates (measured 850M
    // rows at the 50k-doc sf1 run, 16× the sf0.1 wall time at 10× the
    // data once the sort spills), where this one moves only |cand| rows
    // whose array payloads the hash-relation build reads in place —
    // per-pair work identical, the quadratic-prone shuffle+sort gone
    // (measured 128 s → 22 s on the same corpus, and 10.6 → 5.5 s at
    // sf0.1, so the 10× step is now 4.0×)
    // shuffle_hash, never broadcast: the sets relation GROWS WITH THE
    // CORPUS (it is every distinct shingle, re-packed per doc), so
    // broadcasting it is exactly the plan that dies at scale — and even
    // here the driver-side build of a ~150 MB string-array relation is
    // single-threaded and its accumulated copies GC-thrash repeat runs
    // (measured: rep1 16 s, rep2+ 175 s). Per-partition hash build of
    // 1/32nd of the docs is cheap and scale-stable.
    val sets = sh.groupBy("doc_id").agg(collect_list(col("sh")).as("shs"),
      count(lit(1)).as("n_sh")).hint("shuffle_hash")
    val inter = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"),
        col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"),
        col("n_sh").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        size(array_intersect(col("shs_a"), col("shs_b")))
          .cast(LongType).as("inter_cnt"))
    inter
      .withColumn("union_cnt", col("n_a") + col("n_b") - col("inter_cnt"))
      .filter(col("inter_cnt") * thresholdDen >= col("union_cnt") * thresholdNum)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt").cast(LongType),
        round(col("inter_cnt").cast("double") / col("union_cnt"), 6).as("jaccard"))
  }

  /** Asymmetric CONTAINMENT pairs (Broder, "On the Resemblance and
    * Containment of Documents", SEQUENCES'97): c(a in b) = |A∩B| / |A| over
    * distinct shingles — the primitive resemblance (Jaccard) misses: a
    * quote or snippet wholly contained in a larger doc scores low Jaccard
    * (the union is large) but containment ~1. Directed output (doc_a
    * contained in doc_b, a≠b, both directions emitted when both clear the
    * threshold).
    *
    * Same two-phase 100 TB plan as [[ngramJaccardPairs]]: candidates from
    * the rare-shingle (df <= maxShingleDf) equality self-join, exact
    * intersection recomputed over full shingle sets, rational threshold
    * `inter * den >= n_a * num`. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, thresholdNum: Int, thresholdDen: Int,
                       maxShingleDf: Int = 1000): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n).repartition(col("doc_id"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df_cnt"))
    val rare = sh.join(dfreq.filter(col("df_cnt") <= maxShingleDf).select("sh"), "sh")
    // unordered candidate pairs + rare-intersection count (a < b halves the
    // join; both directions are emitted from the one count afterwards)
    val interRare = rare.as("a").join(rare.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_rare"))
    val common = sh.join(dfreq.filter(col("df_cnt") > maxShingleDf).select("sh"), "sh")
    val interCommon = interRare.select("doc_a", "doc_b")
      .join(common.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(common.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter_common"))
    val inter = interRare.join(interCommon, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter_cnt",
        col("inter_rare") + coalesce(col("inter_common"), lit(0L)))
      .select("doc_a", "doc_b", "inter_cnt")
    // both directions from the single unordered intersection
    val directed = inter.union(inter.select(col("doc_b").as("doc_a"),
      col("doc_a").as("doc_b"), col("inter_cnt")))
    directed
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .filter(col("inter_cnt") * thresholdDen >= col("n_a") * thresholdNum)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt").cast(LongType),
        col("n_a").cast(LongType),
        round(col("inter_cnt").cast("double") / col("n_a"), 6).as("containment"))
  }

  private def registerNative(df: DataFrame): Unit =
    graft.functions.NativeTextFunctions.register(df.sparkSession)

  /** Per-doc MinHash signature array: sigs[s] = lexicographic min of
    * md5(shingle ":" s) over the doc's distinct shingles — a deterministic
    * hash family expressible identically in any engine with md5. Runs as
    * the native codegen'd MinHashSigsExpr (functions.NativeHashes) — same
    * bytes hashed, same hex minima, ~10× less per-row overhead than the
    * interpreted higher-order-function formulation. */
  def minhashSigs(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int, numHashes: Int): DataFrame = {
    registerNative(docs)
    docs.select(col(idCol).as("doc_id"),
      call_function("graft_minhash_sigs",
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleN),
        lit(numHashes)).as("sigs"))
  }

  /** (doc_id, sigs, band, bkey): one row per doc per band; band key = md5
    * of the comma-joined band slice of the signature array. */
  private def bandTable(sigs: DataFrame, numBands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("doc_id"), col("sigs"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        md5(array_join(slice(col("sigs"), b * rowsPerBand + 1, lit(rowsPerBand)), ","))))
        .as(Seq("band", "bkey")))

  /** LSH banding: band key = md5 of the comma-joined band slice of the
    * signature array; candidate pairs are docs sharing any band key.
    * Estimated similarity = fraction of matching signature positions.
    * Shuffle cost is one small band-key join (numBands rows/doc), never
    * corpus² and never per-(doc,seed). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    // The repartition is a materialization barrier: without it the sig
    // expression is inlined into every use site (both join sides, the band
    // transform, the zip count) and computed 4×; the exchange computes it
    // once and ReuseExchange shares it across the self-join. It also
    // co-locates by doc_id, which is the partitioning a real corpus wants.
    val sigs = minhashSigs(docs, idCol, textCol, shingleN, numHashes)
      .filter(size(col("sigs")) > 0)
      .repartition(col("doc_id"))
    val bands = bandTable(sigs, numBands, rowsPerBand)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sigs").as("sigs_a"), col("b.sigs").as("sigs_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("n_equal",
        size(filter(zip_with(col("sigs_a"), col("sigs_b"), (x, y) => x === y),
          b => b)).cast(LongType))
      .select(col("doc_a"), col("doc_b"), col("n_equal"),
        round(col("n_equal").cast("double") / numHashes, 6).as("est_sim"))
  }

  /** Incremental near-dup check: match a NEW batch of documents against an
    * already-ingested corpus — the production dedup shape at 100 TB, where
    * re-self-joining the whole corpus per arriving batch is not an option.
    * The corpus side's (doc_id, band, bkey, sigs) frame is the persistent
    * dedup index (in production: a table bucketed by bkey, appended as
    * batches are admitted); each batch pays one band-key equality join
    * sized by ITS band rows, never corpus x corpus.
    *
    * Returns one row per batch doc that has a corpus near-dup with at
    * least `minEqual` of `numHashes` matching signature positions:
    * (doc_id, match_id, n_equal), match chosen deterministically as the
    * highest-overlap corpus doc (ties -> smallest id) via the struct
    * arg-max pattern.
    */
  def incrementalLshMatches(corpus: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String, shingleN: Int,
                            numHashes: Int, rowsPerBand: Int,
                            minEqual: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    def sigsOf(df: DataFrame) =
      minhashSigs(df, idCol, textCol, shingleN, numHashes)
        .filter(size(col("sigs")) > 0)
        .repartition(col("doc_id"))
    val corpusBands = bandTable(sigsOf(corpus), numBands, rowsPerBand)
    val batchBands = bandTable(sigsOf(batch), numBands, rowsPerBand)
    val cand = batchBands.as("b").join(corpusBands.as("c"),
        col("b.band") === col("c.band") && col("b.bkey") === col("c.bkey"))
      .select(col("b.doc_id").as("doc_id"), col("c.doc_id").as("cid"),
        col("b.sigs").as("sigs_b"), col("c.sigs").as("sigs_c"))
      .dropDuplicates("doc_id", "cid")
    cand
      .withColumn("n_equal",
        size(filter(zip_with(col("sigs_b"), col("sigs_c"), (x, y) => x === y),
          b => b)).cast(LongType))
      .filter(col("n_equal") >= minEqual)
      .groupBy("doc_id")
      .agg(max(struct(col("n_equal"), (-col("cid")).as("neg_cid"))).as("best"))
      .select(col("doc_id"), (-col("best.neg_cid")).as("match_id"),
        col("best.n_equal").as("n_equal"))
  }

  /** 32-bit SimHash: bit j is the sign of the sum of (2·b−1) over token
    * occurrences, where b = high bit of hex digit j of md5(token). Weighting
    * by occurrence equals iterating raw (non-distinct) tokens, so the whole
    * hash is one expression over the let-bound md5 array — integer
    * arithmetic only, bit-exact across engines, no shuffle. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    registerNative(docs)
    docs.select(col(idCol).as("doc_id"),
      call_function("graft_simhash32",
        TextFunctions.tokens(col(textCol))).as("simhash"))
  }

  /** SimHash near-dup pairs, blocked on the top byte of the hash (an LSH-style
    * prefix block: pairs differing in the top 8 bits are not candidates) so
    * the join is per-block, never corpus². */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    // materialization barrier + exchange reuse across the self-join (see
    // minhashLshPairs) — otherwise the hash is recomputed per join side
    val sh = simhash(docs, idCol, textCol).repartition(col("doc_id"))
    sh.as("a").join(sh.as("b"),
        expr("shiftright(a.simhash, 24) = shiftright(b.simhash, 24)")
          && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", expr("bit_count(a.simhash ^ b.simhash)").cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
  }
}
