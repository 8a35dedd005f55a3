"""Text-corpus operators for web-scale training-data pipelines.

Beyond the reference's crawl loop, a 100-TB webtext engine needs the
standard corpus-hygiene operators. Everything here is JVM-side column
expressions where SQL can express it (exact dedup, n-gram Jaccard, token
stats, quality, language-ID) and numpy-vectorized pandas UDFs where it
can't (MinHash signatures, SimHash) — never row-at-a-time Python.

Scale notes per operator:

* exact_dedup      — one shuffle on the text hash; map-side partial via
                     window group limit.
* minhash_lsh      — signatures map-side (Arrow batch, numpy); candidate
                     generation is an equi-join on (band, band_hash)
                     buckets, so cost scales with collisions, not n².
* ngram_jaccard    — exact set Jaccard via shingle co-occurrence counts:
                     explode distinct shingles, self-join on shingle,
                     group by pair. No cross join anywhere.
* simhash          — signatures map-side; near-dup candidates via 16-bit
                     band buckets (Hamming ≤ 3 over 4 bands guarantees one
                     matching band by pigeonhole).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .. import urlkit

# ---------------------------------------------------------------------------
# shared text normalization (both engines: lower + collapse whitespace)
# ---------------------------------------------------------------------------


def normalized(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def normalized_py(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", text.lower()).strip()


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id document per normalized-text hash."""
    h = F.xxhash64(normalized(text_col)).alias("text_hash")
    w = Window.partitionBy("text_hash").orderBy(id_col)
    return (
        df.withColumn("text_hash", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# token counting + quality + language-ID (pure column expressions)
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: letter runs, single digits, punctuation singles
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
           "on", "with", "as", "was", "be"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "für",
           "auf", "ein", "eine", "nicht", "im", "zu"],
    "fr": ["le", "la", "les", "des", "est", "et", "dans", "pour", "que",
           "une", "du", "pas", "sur", "avec", "au"],
    "es": ["el", "la", "los", "las", "es", "y", "en", "que", "por", "una",
           "del", "con", "para", "se", "no"],
}


def _tokens(text_col: Column) -> Column:
    return F.split(normalized(text_col), r"\s+")


def _stopword_hits(tokens: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_chars / whitespace tokens / BPE-ish tokens per document."""
    text = F.col(text_col)
    toks = _tokens(text)
    return df.select(
        "*",
        F.length(text).alias("n_chars_raw"),
        F.size(toks).alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).alias("n_tokens_bpeish"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style quality features + keep flag, all JVM-side.

    Features: token count, mean token length, punctuation ratio,
    stopword ratio (en), non-alpha ratio. keep = every rule passes.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(normalized(text))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    sw = _stopword_hits(toks, "en")
    mean_tok = (n_chars.cast("double") / F.greatest(n_tok, F.lit(1)))
    punct_ratio = n_punct.cast("double") / F.greatest(F.length(text), F.lit(1))
    sw_ratio = sw.cast("double") / F.greatest(n_tok, F.lit(1))
    keep = (
        (n_tok >= 5)
        & (mean_tok >= 2.0)
        & (mean_tok <= 12.0)
        & (punct_ratio <= 0.3)
        & (sw_ratio >= 0.01)
    )
    return df.select(
        "*",
        n_tok.alias("q_n_tokens"),
        mean_tok.alias("q_mean_token_len"),
        punct_ratio.alias("q_punct_ratio"),
        sw_ratio.alias("q_stopword_ratio"),
        keep.alias("q_keep"),
    )


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID over {en,de,fr,es}, 'und' when no
    profile hits. Deterministic tiebreak: ratio desc, then language code."""
    toks = _tokens(F.col(text_col))
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    ratios = {lang: (_stopword_hits(toks, lang).cast("double") / n) for lang in _STOPWORDS}
    best = F.greatest(*ratios.values())
    pred = F.lit("und")
    for lang in sorted(_STOPWORDS, reverse=True):  # reverse so earlier code wins ties
        pred = F.when(ratios[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    out = df.select("*", pred.alias("lang_pred"))
    for lang in sorted(_STOPWORDS):
        out = out.withColumn(f"lang_ratio_{lang}", F.round(ratios[lang], 6))
    return out


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of normalized text (cross-engine stable)
    plus the xxhash64 used by the dedup family."""
    return df.select(
        "*",
        F.md5(normalized(text_col)).alias("fp_md5"),
        F.xxhash64(normalized(text_col)).alias("fp_xxh64"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact, join-based — no cross join)
# ---------------------------------------------------------------------------


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text (JVM-side)."""
    toks = _tokens(F.col(text) if isinstance(text, str) else text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, gram).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs via shingle co-occurrence:
    |A∩B| from a self-join on exploded distinct shingles, |A|,|B| from
    per-doc shingle counts. Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``max_shingle_df`` is the scale lever: a shingle occurring in more than
    that many documents contributes O(df²) join rows while carrying almost
    no similarity signal — dropping it from the JOIN side (sizes keep
    counting it) makes the reported jaccard a LOWER bound, so no false
    near-dup is ever introduced; pairs whose overlap is exclusively
    stop-shingles may be missed (the standard web-dedup trade).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """Drop every doc that has a ≥threshold neighbor with a smaller id."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n, threshold)
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dupes, id_col, "left_anti")


# ---------------------------------------------------------------------------
# MinHash + LSH (signatures in numpy over Arrow batches)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def make_minhash_udf(num_hashes: int = 64, shingle_n: int = 3):
    """pandas UDF: text -> minhash signature (array<long>).

    Shingle hashing uses the engine's xxhash64 (seed 42) so signatures are
    reproducible everywhere; the permutations are (a*x+b) mod M61.
    """
    a, b = _minhash_params(num_hashes)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            norm = normalized_py(t or "")
            toks = norm.split(" ") if norm else []
            if len(toks) >= shingle_n:
                grams = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
            else:
                grams = {norm}
            hashes = np.array(
                [urlkit.xxhash64(g) for g in grams], dtype=np.int64
            ).astype(np.uint64)
            sig = ((np.outer(a, hashes) + b[:, None]) % _MERSENNE).min(axis=1)
            out.append(sig.astype(np.int64).tolist())
        return pd.Series(out)

    return minhash_udf


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs whose estimated Jaccard (signature agreement) ≥
    threshold. shingle -> minhash -> band -> bucket-join; verification uses
    the signatures themselves (estimate), not a rescan of the text."""
    rows = num_hashes // bands
    udf = make_minhash_udf(num_hashes, shingle_n)
    sig = df.select(F.col(id_col).alias("id"), udf(F.col(text_col)).alias("sig"))
    sig = sig.persist()
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(
                            F.slice("sig", i * rows + 1, rows), lambda x: x.cast("string")
                        ))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    ).cast("double") / F.lit(num_hashes)
    return cand.select("id_a", "id_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def minhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw
) -> DataFrame:
    pairs = minhash_lsh_pairs(df, id_col, text_col, **kw)
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dupes, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (xxhash64 token hashes,
    numpy bit-vote), returned as signed int64."""
    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text):
        norm = normalized_py(t or "")
        toks = norm.split(" ") if norm else []
        if not toks:
            continue
        hs = np.array([urlkit.xxhash64(tok) for tok in toks], dtype=np.int64).astype(
            np.uint64
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(hs)
        val = np.uint64(0)
        for bit in np.nonzero(votes > 0)[0]:
            val |= np.uint64(1) << np.uint64(bit)
        out[i] = np.int64(val)
    return pd.Series(out)


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit band
    buckets (pigeonhole: ≤3 differing bits leave ≥1 band identical)."""
    sig = df.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sim"))
    bands = [
        F.struct(F.lit(i).alias("band"), F.shiftright("sim", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"))
        for i in range(4)
    ]
    banded = sig.select("id", "sim", F.explode(F.array(*bands)).alias("bb")).select(
        "id", "sim", "bb.band", "bb.bucket"
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), ham.alias("hamming")
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
