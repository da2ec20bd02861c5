"""Large-scale training-data text operators — dedup, quality, language id.

All operators are pure column programs (split/md5/regexp/explode) so they run
entirely inside whole-stage codegen — no Python on the hot path. Each has an
exact ANSI-SQL twin used as its DuckDB oracle (the md5-based hashing is
engine-portable: Spark and DuckDB produce identical digests).

Scale notes:
- exact dedup is one hash-aggregate (map-side partial combine);
- shingle-based ops explode to ~n_chars rows per document; at corpus scale
  the explode is balanced by doc length and the heavy self-join happens on
  shingle/band keys — skew on hot shingles is handled by dropping
  top-frequency shingles (stopword shingles carry no dedup signal anyway);
- MinHash-LSH replaces the quadratic n-gram join with banding: candidate
  pairs come from equality on (band, band_key), i.e. an equi-join Catalyst
  can hash-partition; the optional verify step re-computes true Jaccard only
  for candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# whitespace-normalized, lowercased text — the canonical form every op uses
def _norm(col):
    return F.lower(F.regexp_replace(col, r"\s+", " "))


def normalize(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    return docs.select(F.col(id_col).alias("doc_id"),
                       _norm(F.col(text_col)).alias("norm"))


def exact_dedup_groups(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: (content_hash, keep_id,
    n_dups). One shuffle (hash aggregate)."""
    n = normalize(docs, text_col, id_col)
    return (n.groupBy(F.md5("norm").alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_dups")))


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Stable per-document content fingerprint (md5 of normalized text)."""
    n = normalize(docs, text_col, id_col)
    return n.select("doc_id", F.md5("norm").alias("fingerprint"))


def shingles(docs: DataFrame, k: int = 8, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct character k-gram shingles per document: (doc_id, shingle)."""
    n = normalize(docs, text_col, id_col) \
        .filter(F.length("norm") >= k)
    return (n.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("norm") - (k - 1)))
        .alias("pos"),
        "norm")
        .select("doc_id",
                F.expr(f"substring(norm, pos, {k})").alias("shingle"))
        .distinct())


def ngram_jaccard_pairs(docs: DataFrame, k: int = 8,
                        threshold: float = 0.4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (doc_a < doc_b,
    jaccard >= threshold). Quadratic only in documents *sharing shingles* —
    the shingle equi-join is the prefilter."""
    sh = shingles(docs, k, text_col, id_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (a.join(b, "shingle")
              .filter(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b")
              .agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    j = (common.join(sa, "doc_a").join(sb, "doc_b")
         .withColumn("jaccard",
                     F.col("n_common")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_common"))))
    return j.filter(F.col("jaccard") >= threshold) \
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def minhash_lsh_pairs(docs: DataFrame, k: int = 8, n_hashes: int = 12,
                      bands: int = 4, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """MinHash + LSH banding candidate pairs.

    Each of the n_hashes permutations is simulated by min(md5(i || shingle));
    band keys are md5 over the band's minhash concatenation; candidates share
    any (band, key). Output: distinct (doc_a < doc_b). All string/md5 column
    ops — portable to the SQL oracle verbatim.
    """
    rows_per_band = n_hashes // bands
    sh = shingles(docs, k, text_col, id_col)
    mh = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))))
        .alias(f"mh{i}") for i in range(n_hashes)])
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per_band,
                                               (b + 1) * rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.md5(F.concat(*cols)).alias("key")))
    banded = mh.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (a.join(b, ["band", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count per document."""
    n = normalize(docs, text_col, id_col).filter(F.length("norm") > 0)
    return n.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("norm")), " ")).cast("long")
        .alias("n_tokens"))


_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, token count, mean token length,
    stopword ratio, non-alpha ratio (all closed-form column math)."""
    n = normalize(docs, text_col, id_col).filter(F.length("norm") > 0)
    toks = F.size(F.split(F.trim(F.col("norm")), " ")).cast("double")
    nonalpha = (F.length("norm")
                - F.length(F.regexp_replace("norm", r"[^a-z ]", "")))
    stop_hits = None
    for w in _STOPWORDS:
        hits = (
            (F.length(F.concat(F.lit(" "), F.col("norm"), F.lit(" ")))
             - F.length(F.regexp_replace(
                 F.concat(F.lit(" "), F.col("norm"), F.lit(" ")),
                 f" {w} ", " ")))
            / F.lit(len(w) + 1))
        stop_hits = hits if stop_hits is None else stop_hits + hits
    return n.select(
        "doc_id",
        F.length("norm").cast("long").alias("n_chars"),
        toks.cast("long").alias("n_tokens"),
        F.round(F.length("norm") / toks, 6).alias("mean_token_len"),
        F.round(stop_hits / toks, 6).alias("stopword_ratio"),
        F.round(nonalpha / F.length("norm"), 6).alias("nonalpha_ratio"))


# tiny per-language marker lexicons for the n-gram/stopword language guess
_LANG_MARKERS = {
    "en": ("the", "and", "is"),
    "es": ("el", "la", "que"),
    "fr": ("le", "la", "et"),
    "de": ("der", "und", "die"),
}


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language guess: count marker-word hits per language,
    argmax with deterministic tie-break on language code; 'und'
    (undetermined) when nothing matches."""
    n = normalize(docs, text_col, id_col).filter(F.length("norm") > 0)
    padded = F.concat(F.lit(" "), F.col("norm"), F.lit(" "))
    scores = []
    for lang, words in sorted(_LANG_MARKERS.items()):
        s = None
        for w in words:
            hits = ((F.length(padded)
                     - F.length(F.regexp_replace(padded, f" {w} ", " ")))
                    / F.lit(len(w) + 1))
            s = hits if s is None else s + hits
        scores.append(F.struct(s.cast("long").alias("hits"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return n.select(
        "doc_id",
        F.when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit("und")).alias("lang_guess"),
        best.getField("hits").cast("long").alias("marker_hits"))
