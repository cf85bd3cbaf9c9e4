package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale document pipelines.
  *
  * All pure `Column` expressions built from `org.apache.spark.sql.functions`
  * higher-order functions — codegen'd by Catalyst, no UDFs, no shuffles.
  * Tokenization is single-space splitting (the documents corpus is
  * pre-normalized); patterns avoid backslash escapes so the same literal
  * regex text works in the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens of a pre-normalized (single-spaced) text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** The hashed-linear quality classifier's 64-bucket token feature map
    * (first 6 hex digits of md5, mod 64) — ONE definition shared by
    * t_classifier_score / t_classifier_train / t_curriculum /
    * t_mix_doremi / t_render_dpo (and mirrored verbatim in their oracle
    * SQL): a tweak to the feature map must change every consumer at once
    * or the "schedule consumes the quality stack" equivalence silently
    * breaks. */
  def clsBucket(t: Column): Column =
    conv(substring(md5(t), 1, 6), 16, 10).cast("long") % 64

  /** The classifier's md5-derived signed integer bucket weight in
    * [-1000, 1000] (the deterministic stand-in for learned weights —
    * t_classifier_train carries the LEARNED ones). */
  def clsWeight(t: Column): Column =
    conv(substring(md5(concat(lit("w"), clsBucket(t).cast("string"))), 1, 4),
      16, 10).cast("long") % 2001 - 1000

  /** Per-doc classifier score: Σ_token clsWeight(token) — pure integers,
    * order-independent, fused into scan codegen. */
  def clsWeightSum(toks: Column): Column =
    aggregate(transform(toks, t => clsWeight(t)), lit(0L), (a, x) => a + x)

  /** BPE-ish subword segmentation count: runs of letters, runs of digits,
    * or single non-alphanumeric glyphs. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Count of tokens belonging to a marker set (stopwords, language markers).
    * Counts occurrences, not distinct membership. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Document fingerprint: md5 of the case-folded, trimmed text. Identical to
    * the DuckDB expression `md5(trim(lower(text)))`. */
  def fingerprint(text: Column): Column = md5(trim(lower(text)))

  /** Let-binding for expensive subexpressions inside row-level expression
    * trees: evaluates `c` ONCE per row and exposes it to `body` as a lambda
    * variable. Without this, Catalyst's CollapseProject inlines a projected
    * column into every use site — e.g. `split(text)` re-parsed inside each
    * element_at of a shingle transform turned a 5k-doc shingle pass into
    * ~10^8 string splits (13 s → 0.3 s at sf0.1). */
  def bind(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  /** Positional word n-grams (duplicates kept, order preserved); empty for
    * docs shorter than n tokens. `sequence(1, size-n+1)` would step
    * backwards when size < n (Spark defaults to step -1), so the short-doc
    * case is guarded explicitly. */
  def ngrams(toks: Column, n: Int): Column = bind(toks) { tk =>
    val idx = sequence(lit(1), size(tk) - (n - 1))
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until n).map(k => element_at(tk, i + k)): _*))
    when(size(tk) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles: distinct ngrams (set semantics, for Jaccard /
    * MinHash). */
  def shingles(toks: Column, n: Int): Column = array_distinct(ngrams(toks, n))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every
    * positional n-gram (md5; lexicographic min is the hash order), take the
    * minimum in each sliding window of `w` consecutive gram hashes, and
    * keep the distinct minima. Guarantees a shared fingerprint for any
    * sufficiently long common substring — the standard local fingerprint
    * for plagiarism/near-dup detection, here as one codegen'd expression
    * per row. */
  def winnow(toks: Column, n: Int, w: Int): Column =
    bind(transform(ngrams(toks, n), g => md5(g))) { hs =>
      when(size(hs) >= w,
        array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)), i =>
          array_min(slice(hs, i, lit(w))))))
        .otherwise(when(size(hs) > 0, array(array_min(hs)))
          .otherwise(array().cast("array<string>")))
    }
}
