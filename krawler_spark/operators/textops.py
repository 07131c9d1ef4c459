"""Training-data pipeline operators over a documents/embeddings corpus.

These extend the crawl engine with the operations a web-scale
training-data pipeline runs downstream of the crawler (dedup,
similarity, quality filtering) — first-class components alongside the
SURVEY.md §2 inventory. Everything is built from JVM-side
``pyspark.sql.functions`` (whole-stage codegen) except simhash, which
is a vectorized pandas UDF by nature (per-word bit accumulation).

Cross-engine determinism: every hash is derived from ``md5`` (identical
in Spark and DuckDB), so each operator has an exact ANSI-SQL oracle.
``_hash64(s)`` = first 15 hex digits of md5 as a bigint (60 bits).

Scale notes (100 TB corpus):
* exact dedup is one hash-shuffle on a 16-byte key — the canonical
  map-side-combine groupBy; no driver state.
* minhash-LSH: signatures are per-row (no shuffle); candidate pairs
  come from a groupBy on (band, band-hash) buckets — the shuffle is
  proportional to corpus size, and bucket skew (boilerplate shingles)
  is bounded by a per-bucket cap before the pairwise join.
* n-gram jaccard joins only within blocking buckets, never cross-
  product; embedding near-dup blocks on coarse quantized keys.
* brute-force cosine top-k broadcasts the (small) query set and does
  one pass over the corpus — the right plan when queries ≪ corpus;
  the LSH variant bounds work per bucket for query sets that grow.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EN_STOP = r"\b(the|and|of|to|in|is|it|that|was|for)\b"
DE_STOP = r"\b(der|die|das|und|ist|nicht|ein|eine|zu|mit)\b"
FR_STOP = r"\b(le|la|les|et|est|un|une|des|que|pour)\b"


def hash64(col):
    """Deterministic 60-bit int from md5 — identical in DuckDB via
    ('0x' || substr(md5(x),1,15))::bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# --------------------------------------------------------------------- dedup
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5-hash groupBy, keep the lowest id per group
    (hash-shuffle on the 16-byte digest; map-side combine)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles as an array column (no shuffle)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return df.withColumn(out, F.array_distinct(sh))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, n: int = 3
) -> DataFrame:
    """k-permutation minhash over word n-gram shingles. Permutation i is
    md5("i|" + shingle) — salted md5 keeps the oracle exact. Entirely
    per-row: signatures never shuffle."""
    shingled = word_shingles(df, text_col, n)

    def _mh(i: int):
        # factory, NOT a default-arg lambda: a two-parameter lambda would
        # be treated by F.transform as an (element, index) function and
        # the array index would silently replace the salt
        salt = f"{i}|"
        return F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.conv(
                    F.substring(F.md5(F.concat(F.lit(salt), s)), 1, 15), 16, 10
                ).cast("long"),
            )
        ).alias(f"mh{i}")

    return shingled.select(F.col(id_col), *[_mh(i) for i in range(k)])


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    bucket_cap: int = 64,
) -> DataFrame:
    """LSH candidate pairs: split the k-minhash signature into bands,
    bucket-join docs sharing a band hash. ``bucket_cap`` bounds skewed
    buckets (boilerplate text) before the within-bucket pairing."""
    rows_per_band = k // bands
    sigs = minhash_signatures(df, text_col, id_col, k, n)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{i}").cast("string") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bh"))
        )
    exploded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    w = Window.partitionBy("band", "bh").orderBy(F.col(id_col))
    capped = exploded.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= bucket_cap
    )
    a = capped.select("band", "bh", F.col(id_col).alias("id_a"))
    b = capped.select("band", "bh", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block_expr=None,
    minhash_k: int = 6,
) -> DataFrame:
    """Exact n-gram Jaccard within blocking buckets. Default blocking:
    ``minhash_k`` single-row minhash bands (reusing
    ``minhash_signatures``) — a pair with true Jaccard J collides in at
    least one band w.p. 1-(1-J)^k (k=6, J=0.5 → 0.984), unlike the old
    first-shingle prefix key which missed near-dups that differ in
    their opening words. A custom ``block_expr`` column overrides it."""
    shingled = word_shingles(df, text_col, n).select(id_col, "shingles")
    if block_expr is not None:
        blocked = shingled.withColumn("blk", block_expr)
        a = blocked.select(F.col(id_col).alias("id_a"), "blk")
        b = blocked.select(F.col(id_col).alias("id_b"), "blk")
        cand = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    else:
        sigs = minhash_signatures(df, text_col, id_col, k=minhash_k, n=n)
        bands = sigs.select(
            F.col(id_col),
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"mh{i}").alias("mh"))
                for i in range(minhash_k)
            ])).alias("bb"),
        ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.mh").alias("mh"))
        a = bands.select(F.col(id_col).alias("id_a"), "band", "mh")
        b = bands.select(F.col(id_col).alias("id_b"), "band", "mh")
        cand = a.join(b, ["band", "mh"]).filter(F.col("id_a") < F.col("id_b"))
    cand = cand.select("id_a", "id_b").distinct()
    sh_a = shingled.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = shingled.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sh_a, "id_a").join(sh_b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


SIMHASH_BITS = 60


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit simhash over distinct-word hashes — numpy bit-vote
    accumulation in an Arrow-batched pandas UDF. Word hashes are the
    first 15 md5 hex digits (like ``hash64``), so the whole operator has
    an exact ANSI-SQL oracle and the output is a non-negative BIGINT."""
    import numpy as np

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for t in texts:
            words = (t or "").split()
            if not words:
                out.append(0)
                continue
            hs = np.array(
                [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in set(words)],
                dtype=np.uint64,
            )
            bits = (
                (hs[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :]) & 1
            ).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            val = 0
            for j in np.nonzero(votes > 0)[0]:
                val |= 1 << int(j)
            out.append(val)
        return pd.Series(out)

    return df.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 10,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    (node, cluster_id) with cluster_id = the component's minimum doc id
    — the canonical "keep one per duplicate cluster" step downstream of
    MinHash-LSH. Min-label propagation: each iteration is one join +
    one map-side-combinable groupBy(min), so 100 TB runs as `max_iter`
    ordinary shuffles with no driver state (at extreme diameters swap
    in large-star/small-star — same primitive ops). Near-dup components
    of web text are shallow (dup clusters, not chains), so a fixed
    iteration budget converges; the equivalence oracle (a recursive
    ANSI-SQL CTE) verifies exact convergence on test data."""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    for i in range(max_iter):
        prop = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        labels = labels.unionByName(prop).groupBy("node").agg(
            F.min("label").alias("label")
        )
        if (i + 1) % 3 == 0:
            # truncate lineage: nested join+agg layers otherwise blow up
            # Catalyst planning time exponentially (on a cluster this is
            # a reliable checkpoint to the warehouse instead)
            labels = labels.localCheckpoint(eager=True)
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


# -------------------------------------------------------------- text analysis
def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (4 chars/token)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("n_subtokens_est"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", ""))
    stop_hits = F.size(F.regexp_extract_all(F.lower(t), F.lit(EN_STOP), F.lit(0)))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(alpha / n_chars, 4).alias("alpha_ratio"),
        F.round(punct / n_chars, 4).alias("punct_ratio"),
        F.round(n_chars / n_words, 4).alias("avg_word_len"),
        F.round(stop_hits / n_words, 4).alias("stopword_ratio"),
    )


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    fraction of word bigrams taken by the single most frequent bigram
    (``top_bigram_frac``) and the fraction covered by any bigram that
    occurs more than once (``dup_bigram_frac``). High values flag
    boilerplate / machine-generated loops.

    Scale: bigram explode → groupBy (doc, gram) → groupBy doc is two
    hash-shuffles keyed by doc_id with full map-side combine; no
    windows, no driver state. Docs with <2 words keep a row with
    n_bigrams=0 via the left join back onto the id set.
    """
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), ws.alias("ws"))
    grams = base.select(
        F.col(id_col),
        # zip_with over two slices, NOT transform with ws[i+1]: after
        # project collapse the indexed-lambda form re-evaluated the
        # whole split per ELEMENT (quadratic in words — measured 42s vs
        # 5s for the full sf1.0 materialization); the zip_with lambda
        # touches only its per-row slice arguments. Pairs are identical
        # strings, so results are unchanged.
        F.when(
            F.size("ws") >= 2,
            F.expr("zip_with(slice(ws, 1, size(ws)-1), "
                   "slice(ws, 2, size(ws)-1), (a, b) -> concat(a, ' ', b))"),
        ).otherwise(F.expr("array()").cast("array<string>")).alias("grams"),
    )
    counts = (
        grams.select(F.col(id_col), F.explode("grams").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("_top"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)).alias("_dup"),
    )
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("_top") / F.col("n_bigrams"), F.lit(0.0)), 4
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("_dup") / F.col("n_bigrams"), F.lit(0.0)), 4
            ).alias("dup_bigram_frac"),
        )
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_top_bigram_frac: float = 0.20,
) -> DataFrame:
    """Composite Gopher-rule document filter: every doc gets a ``keep``
    verdict plus the first failing rule name (``fail_reason``), the
    standard shape for an auditable pipeline gate. Rules are evaluated
    over JVM column algebra + ``repetition_scores``; one join keyed by
    doc_id, no extra scans of the text.
    """
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    # Gopher mean word length: sum of word lengths / n_words — total
    # non-whitespace chars over words, NOT length(text)/n_words (which
    # counts separator whitespace and shifts the 3.0/10.0 thresholds)
    word_chars = F.length(F.regexp_replace(F.trim(t), r"\s+", ""))
    feats = df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.round(word_chars / F.size(words), 4).alias("avg_word_len"),
    )
    rep = repetition_scores(df, text_col=text_col, id_col=id_col).select(
        F.col(id_col), "top_bigram_frac"
    )
    j = feats.join(rep, id_col)
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("n_words") > max_words, F.lit("too_long"))
        .when(F.col("avg_word_len") < min_avg_word_len, F.lit("short_words"))
        .when(F.col("avg_word_len") > max_avg_word_len, F.lit("long_words"))
        .when(F.col("top_bigram_frac") > max_top_bigram_frac, F.lit("repetitive"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        F.col(id_col),
        "n_words",
        "avg_word_len",
        "top_bigram_frac",
        reason.alias("fail_reason"),
        reason.isNull().alias("keep"),
    )


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic tier)."""
    low = F.lower(F.col(text_col))
    en = F.size(F.regexp_extract_all(low, F.lit(EN_STOP), F.lit(0)))
    de = F.size(F.regexp_extract_all(low, F.lit(DE_STOP), F.lit(0)))
    fr = F.size(F.regexp_extract_all(low, F.lit(FR_STOP), F.lit(0)))
    best = F.greatest(en, de, fr)
    lang = (
        F.when(best == 0, F.lit("und"))
        .when(best == en, F.lit("en"))
        .when(best == de, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.select(F.col(id_col), en.alias("en_hits"), de.alias("de_hits"),
                     fr.alias("fr_hits"), lang.alias("lang_guess"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-normalized md5 document fingerprint."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


# ----------------------------------------------------------------- embeddings
def plane_val(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1)
    (golden-ratio sin scramble). Computed in PYTHON and embedded as a
    literal on both the Spark and the SQL-oracle side, so cross-engine
    libm differences can never flip a sign bit."""
    import math

    x = math.sin(1.0 + p * 12.9898 + d * 78.233) * 43758.5453
    return 2.0 * (x - math.floor(x)) - 1.0


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _dot_unrolled(a, b, dim: int):
    """Dot product unrolled to ``dim`` element_at terms. Spark's array
    ``aggregate``/``zip_with`` lambdas are CodegenFallback (interpreted
    per element); an unrolled sum of GetArrayItem products stays inside
    whole-stage codegen — ~an order of magnitude faster on the N×C
    scoring joins. Addition order is left-to-right, identical to the
    fold, so results are bit-equal to ``_dot``."""
    terms = [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dot_unrolled_expr(a_name: str, b_name: str, dim: int):
    """``_dot_unrolled`` over NAMED columns, built as one SQL string →
    one py4j call. Building the 64-term tree Column-by-Column costs
    hundreds of driver py4j round-trips per call site (~3s of pure
    plan-build time in the ANN queries); the parsed expression tree is
    identical, so results are bit-equal."""
    s = " + ".join(
        f"element_at({a_name}, {i + 1}) * element_at({b_name}, {i + 1})"
        for i in range(dim)
    )
    return F.expr(s)


def cosine_dim(a, b, dim: Optional[int]):
    """``cosine`` with an optional known dimensionality: when ``dim`` is
    given the whole expression is codegen-unrolled; when None it falls
    back to the interpreted fold (dim-agnostic)."""
    if dim is None:
        return cosine(a, b)
    return _dot_unrolled(a, b, dim) / (
        F.sqrt(_dot_unrolled(a, a, dim)) * F.sqrt(_dot_unrolled(b, b, dim))
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    spread_partitions: Optional[int] = None,
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query rows, one scan of
    the corpus, per-query window for the top-k.

    ``spread_partitions`` (same contract as ``ivf_ann``): a single-file
    corpus arrives as ONE scan split, so the whole corpus×queries pass
    would run in one task; an explicit respread spreads it. At scale a
    well-partitioned corpus skips the shuffle.

    With a known ``dim`` the per-pair cosine is one codegen-unrolled
    dot over norms hoisted once per row (``ivf_ann``'s proven pattern):
    the interpreted ``aggregate``/``zip_with`` fold is CodegenFallback
    — per-element interpreted — and dominated the corpus pass. The
    element addition order and the dot/(na*nb) op order are identical,
    so results are bit-equal to the fold."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), vec_d.alias("v"))
    if spread_partitions:
        base = base.repartition(spread_partitions)
    if dim is not None:
        base = base.withColumn("_nv", F.sqrt(_dot_unrolled_expr("v", "v", dim)))
        q = base.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("q_id"), F.col("v").alias("qv"),
            F.col("_nv").alias("_nq"),
        )
        pair_cos = _dot_unrolled_expr("qv", "v", dim) / (
            F.col("_nq") * F.col("_nv")
        )
    else:
        q = base.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("q_id"), F.col("v").alias("qv")
        )
        pair_cos = cosine(F.col("qv"), F.col("v"))
    scored = base.join(F.broadcast(q), F.col(id_col) != F.col("q_id")).select(
        "q_id", F.col(id_col).alias("n_id"), F.round(pair_cos, 4).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    block_cap: Optional[int] = 4096,
    arrow: bool = True,
) -> DataFrame:
    """Near-duplicate vectors: pairwise cosine within blocking buckets
    (label, or any coarse quantization) — never a cross product.

    ``block_cap`` bounds the within-block pair loop: ``block_col`` is
    caller-supplied, and one hot block (a dominant label) makes the
    pair loop quadratic inside a single task — at 100-TB scale that is
    a task that never finishes. Blocks larger than the cap are
    deterministically truncated (rank by id within block), mirroring
    ``lsh_bucketed_ann``'s ``bucket_cap``; pass ``block_cap=None`` only
    when the blocking key is known-bounded.

    ``arrow=True`` (the default, and the scale path): one shuffle by
    block into a grouped-map pandas stage that scores each block's pair
    matrix with vectorized numpy — a normalized GEMM prefilters
    candidates with a conservative margin, then the exact cosine is
    recomputed for candidates only with the SAME float op order as the
    JVM expression (elementwise products summed left-to-right over the
    dimension, dot/(norm_a*norm_b)), so the doubles handed back are
    bit-identical to the JVM path's; the final round-to-4-digits and
    threshold filter stay in the JVM, so rounding semantics are
    Spark's. The JVM pair-join path (``arrow=False``) evaluates the
    cosine expression once per CANDIDATE PAIR — quadratic in block
    size with a per-pair interpreted/huge-codegen constant that
    measured 60-100s on 20M pairs where this path runs in ~2s.

    One caveat vs the JVM path: a NULL ELEMENT inside a vector reaches
    numpy as NaN, and NaN compares high in Spark's ordering, so such
    pairs are kept with cos=NaN where the JVM fold yields NULL and
    drops them. Identical on any corpus without null vector elements
    (whole-vector NULLs and NaN/Inf values agree on both paths)."""
    if arrow:
        return _neardup_pairs_arrow(
            emb, threshold, id_col, vec_col, block_col, block_cap
        )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), F.col(block_col).alias("blk"), vec_d.alias("v"))
    if block_cap is not None:
        w_cap = Window.partitionBy("blk").orderBy(F.col(id_col))
        base = base.withColumn("_bc", F.row_number().over(w_cap)).filter(
            F.col("_bc") <= block_cap
        ).drop("_bc")
    a = base.select(F.col(id_col).alias("id_a"), "blk", F.col("v").alias("va"))
    b = base.select(F.col(id_col).alias("id_b"), "blk", F.col("v").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _neardup_pairs_arrow(
    emb: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    block_col: str,
    block_cap: Optional[int],
) -> DataFrame:
    """Grouped-map numpy scorer for ``embedding_neardup_pairs``; emits
    (id_a, id_b, raw unrounded cos) per candidate pair, the JVM applies
    round+threshold. See the caller's docstring for the equivalence
    argument."""
    # round(cos,4) >= t  ⟺  cos >= t - 5e-5 (half-up window); prefilter
    # with an extra 1e-6 margin for the GEMM-vs-sequential float gap
    # (bounded ~1e-13 for unit-normalized rows — 7 orders inside).
    bound = float(threshold) - 5e-5 - 1e-6

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "cos": pd.Series(dtype="float64")}
        )
        # block_cap semantics = the JVM window: rank by id ascending
        # (nulls first, Spark's asc default), keep the first cap rows.
        pdf = pdf.sort_values("id", na_position="first", kind="mergesort")
        if block_cap is not None:
            pdf = pdf.iloc[:block_cap]
        # null ids / null vectors occupy cap slots (as in the window)
        # but never produce a surviving pair (NULL cosine → filtered).
        pdf = pdf[pdf["id"].notna() & pdf["v"].notna()]
        if len(pdf) < 2:
            return empty
        ids_all = pdf["id"].to_numpy(dtype="int64")
        vecs = list(pdf["v"])
        # pairs across different vector lengths have NULL cosine in the
        # JVM (zip_with pads nulls) → only same-length rows pair up.
        by_len: dict = {}
        for i, v in enumerate(vecs):
            by_len.setdefault(len(v), []).append(i)
        out = []
        for L, idxs in by_len.items():
            if len(idxs) < 2 or L == 0:
                continue
            ids = ids_all[idxs]
            X = np.empty((len(idxs), L), dtype=np.float64)
            for r, i in enumerate(idxs):
                X[r] = np.asarray(vecs[i], dtype=np.float64)
            # exact per-row norm: squares summed left-to-right, then
            # sqrt — the JVM fold's order exactly.
            sq = X * X
            acc = sq[:, 0].copy()
            for j in range(1, L):
                acc += sq[:, j]
            nrm = np.sqrt(acc)
            with np.errstate(divide="ignore", invalid="ignore"):
                Xn = X / nrm[:, None]
            n = len(ids)
            # strip the GEMM so the score matrix stays ~32 MB however
            # large the (capped) block is.
            step = max(1, (1 << 22) // n)
            for s0 in range(0, n, step):
                C = Xn[s0:s0 + step] @ Xn.T
                # non-finite scores (zero norms, NaN/Inf elements) stay
                # candidates: NaN compares HIGH in Spark's ordering, so
                # the JVM filter keeps them — the exact recompute below
                # reproduces the same NaN/Inf double.
                cand = (C >= bound) | ~np.isfinite(C)
                rr, cc = np.nonzero(cand)
                rr += s0
                keep = ids[rr] < ids[cc]
                rr, cc = rr[keep], cc[keep]
                if rr.size == 0:
                    continue
                # exact pair cosine, same op order as the JVM
                # expression: products left-to-right, dot/(na*nb).
                P = X[rr] * X[cc]
                dac = P[:, 0].copy()
                for j in range(1, L):
                    dac += P[:, j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dac / (nrm[rr] * nrm[cc])
                out.append(pd.DataFrame(
                    {"id_a": ids[rr], "id_b": ids[cc], "cos": cos}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("v"),
    ).filter(F.col("blk").isNotNull())
    scored = base.groupBy("blk").applyInPandas(
        _block, schema="id_a long, id_b long, cos double"
    )
    return (
        scored.withColumn("cos", F.round(F.col("cos"), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def lsh_bucketed_ann(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_dim: int = 512,
    bucket_cap: Optional[int] = 4096,
    multiprobe: bool = True,
) -> DataFrame:
    """Scale path for ANN: random-hyperplane LSH — the sign pattern of
    ``planes`` pseudo-random projections keys a bucket; top-k runs only
    within the probed buckets. Scale hygiene:

    * planes are derived deterministically from (plane_idx, dim) — no
      driver state, no driver action in plan construction (coefficient
      arrays are built to ``max_dim`` and sliced to ``size(v)`` per row).
    * ``bucket_cap`` bounds pathological buckets (row_number window per
      bucket) so one dense region can never degenerate to all-pairs.
    * ``multiprobe`` probes the query's bucket plus all Hamming-1
      neighbors (flip each sign bit) — recall insurance for near-
      boundary vectors without growing the corpus-side work."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), vec_d.alias("v"))
    sig_bits = []
    for p in range(planes):
        coeffs = F.slice(
            F.array(*[F.lit(plane_val(p, d)) for d in range(max_dim)]),
            1, F.size(F.col("v")),
        )
        sig_bits.append(F.when(_dot(F.col("v"), coeffs) >= 0, F.lit("1")).otherwise(F.lit("0")))
    bucketed = base.withColumn("bucket", F.concat(*sig_bits))
    if bucket_cap is not None:
        w_cap = Window.partitionBy("bucket").orderBy(F.col(id_col))
        bucketed = bucketed.withColumn("_bc", F.row_number().over(w_cap)).filter(
            F.col("_bc") <= bucket_cap
        ).drop("_bc")

    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    if multiprobe:
        probes = [F.col("bucket")]
        for p in range(planes):
            flipped_bit = F.when(
                F.substring("bucket", p + 1, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            probes.append(
                F.concat(
                    F.substring("bucket", 1, p),
                    flipped_bit,
                    F.expr(f"substring(bucket, {p + 2})"),
                )
            )
        q = q.withColumn("bucket", F.explode(F.array(*probes)))
    scored = bucketed.join(F.broadcast(q), "bucket").filter(
        F.col(id_col) != F.col("q_id")
    ).select(
        "q_id", F.col(id_col).alias("n_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cos"),
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )


def _ivf_candidates(
    emb: DataFrame,
    query_ids: List[int],
    cell_stride: int,
    id_col: str,
    vec_col: str,
    keys: int = 128,
) -> DataFrame:
    """Approximate cell-score pruning for ``ivf_ann``: returns the
    (id, cent_id) pairs whose EXACT rounded score could win the
    per-vector argmax, plus every centroid for the query vectors
    (their window ranks all cells). Fully distributed: the corpus is
    chunked on a deterministic synthetic key (guide §2.5: many more
    key values than partitions), the centroid set rides along
    replicated per key — no driver action, no driver state. Ships the
    RAW (float32) vectors — the float64 cast happens in numpy and is
    exact, and the scores here only PRUNE (the margin covers the
    GEMM-vs-sequential float gap); the JVM recomputes the survivors
    exactly."""
    qset = sorted(int(q) for q in query_ids)

    def _cand(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {"_id": pd.Series(dtype="int64"),
             "cent_id": pd.Series(dtype="int64")}
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        vids = left["_id"].to_numpy("int64")
        cids = right["cent_id"].to_numpy("int64")
        X = np.stack([np.asarray(v, dtype=np.float64) for v in left["_v"]])
        Cm = np.stack([np.asarray(v, dtype=np.float64) for v in right["_cv"]])

        def _norms(M):
            s = M * M
            a = s[:, 0].copy()
            for j in range(1, M.shape[1]):
                a += s[:, j]
            return np.sqrt(a)

        with np.errstate(divide="ignore", invalid="ignore"):
            S = (X / _norms(X)[:, None]) @ (Cm / _norms(Cm)[:, None]).T
        finite = np.isfinite(S)
        row_max = np.where(finite, S, -np.inf).max(axis=1)
        # two raw scores whose 4-digit roundings tie differ < 1e-4;
        # +2e-6 covers the GEMM-vs-exact float gap (bounded ~1e-13).
        candm = (S >= (row_max - (1e-4 + 2e-6))[:, None]) | ~finite
        candm[np.isin(vids, qset), :] = True
        rr, cc = np.nonzero(candm)
        return pd.DataFrame({"_id": vids[rr], "cent_id": cids[cc]})

    left = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(keys)).alias("_k"),
    )
    right = emb.filter(F.col(id_col) % cell_stride == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("_cv"),
    ).withColumn("_k", F.explode(
        F.sequence(F.lit(0).cast("long"), F.lit(keys - 1).cast("long"))))
    return (
        left.groupBy("_k")
        .cogroup(right.groupBy("_k"))
        .applyInPandas(_cand, schema="_id long, cent_id long")
        .withColumnRenamed("_id", id_col)
    )


def ivf_ann(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 5,
    cell_stride: int = 25,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    spread_partitions: Optional[int] = None,
    arrow: bool = True,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (every ``cell_stride``-th
    vector is a centroid — the deterministic stand-in for k-means
    centroids, which a real deployment would train offline and pass in)
    assigns each vector to its nearest centroid's cell; each query
    probes its ``nprobe`` nearest cells and ranks only those members.
    Standard IVF semantics: every vector (centroids included) scores
    against every centroid, so a centroid assigns to — and a centroid
    query probes — its own cell (self cosine 1.0); only the FINAL
    candidate ranking excludes the query itself.

    Scale (10^10 vectors): centroids are a small broadcast side — the
    assignment is one broadcast join + per-row argmax (groupBy vec_id
    with map-side combine, never a window over the corpus). The probe
    join is keyed by cell id, so per-query work is bounded by
    nprobe × avg cell size instead of the corpus. Cosine is rounded to
    4 digits BEFORE the argmax with centroid-id tiebreak, so the cell
    assignment is bit-identical across engines (same contract as the
    LSH variant's sign bits).

    ``arrow=True`` + known ``dim`` prunes the N×C scoring before the
    JVM sees it: a cogrouped numpy stage (vector chunks × replicated
    centroid set) computes approximate cell scores with one GEMM and
    emits, per vector, only the centroids within 1e-4 (+float margin)
    of its best — the window two raw scores must share for their
    ROUNDED values to tie, so the rounded-argmax winner is always in
    the candidate set (non-finite scores and all query rows keep every
    centroid). The JVM then rescores just ~1 candidate per vector with
    the exact expression and runs the same round→argmax, so the
    assignment is bit-identical while the N×C pair evaluation leaves
    the (interpreted-speed) JVM expression path — measured 143 CPU-s →
    ~2 CPU-s on the sf1.0 corpus."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), vec_d.alias("v"))
    # The N×C scoring multiplies each input row C-fold; a source that
    # arrives in few partitions (one parquet file) would run it on few
    # cores. Callers with such inputs pass spread_partitions (no
    # plan-build RDD conversion / driver action here); at scale a
    # well-partitioned corpus skips the shuffle entirely.
    if spread_partitions:
        base = base.repartition(spread_partitions)
    # With a known dim, precompute each side's norm ONCE instead of
    # per pair: the N×C scoring then does one unrolled dot + one
    # divide per pair (3x fewer multiplies). Float sequence per
    # element is unchanged, so results are bit-identical to the
    # per-pair formula (and to the DuckDB oracle at 4-digit rounding).
    if dim is not None:
        base = base.withColumn("_nv", F.sqrt(_dot_unrolled_expr("v", "v", dim)))
        cents = base.filter(F.col(id_col) % cell_stride == 0).select(
            F.col(id_col).alias("cent_id"), F.col("v").alias("cv"),
            F.col("_nv").alias("_nc"),
        )
        exact_ccos = F.round(
            _dot_unrolled_expr("v", "cv", dim)
            / (F.col("_nv") * F.col("_nc")), 4
        ).alias("ccos")
        if arrow:
            cand = _ivf_candidates(
                emb, query_ids, cell_stride, id_col, vec_col,
                keys=4 * (spread_partitions or 32),
            )
            scored = (
                base.join(F.broadcast(cand), id_col)
                .join(F.broadcast(cents), "cent_id")
                .select(F.col(id_col), "v", F.col("_nv"), "cent_id", exact_ccos)
            )
        else:
            scored = base.crossJoin(F.broadcast(cents)).select(
                F.col(id_col), "v", F.col("_nv"), "cent_id", exact_ccos,
            )
    else:
        cents = base.filter(F.col(id_col) % cell_stride == 0).select(
            F.col(id_col).alias("cent_id"), F.col("v").alias("cv")
        )
        scored = base.crossJoin(F.broadcast(cents)).select(
            F.col(id_col), "v", "cent_id",
            F.round(cosine_dim(F.col("v"), F.col("cv"), dim), 4).alias("ccos"),
        )
    # nearest cell per vector: max (ccos, cent_id) struct — a groupBy
    # argmax (map-side combinable), not a corpus-wide window. The argmax
    # shuffles only narrow (id, ccos, cent_id) rows; the embedding
    # rejoins afterward so N×C vector copies never hit the wire.
    # Centroids score 1.0 against themselves, so each lands in its own
    # cell (no special-case union).
    assign = scored.select(id_col, "ccos", "cent_id").groupBy(id_col).agg(
        F.max(F.struct(F.col("ccos"), F.col("cent_id"))).alias("_m"),
    ).select(F.col(id_col), F.col("_m.cent_id").alias("cell")).join(base, id_col)
    w_probe = Window.partitionBy(id_col).orderBy(
        F.col("ccos").desc(), F.col("cent_id").desc()
    )
    probe_cols = [F.col(id_col).alias("q_id"), F.col("v").alias("qv"),
                  F.col("cent_id").alias("cell")]
    if dim is not None:
        probe_cols.append(F.col("_nv").alias("_nq"))
    probes = (
        scored.filter(F.col(id_col).isin(query_ids))
        .withColumn("_r", F.row_number().over(w_probe))
        .filter(F.col("_r") <= nprobe)
        .select(*probe_cols)
    )
    if dim is not None:
        pair_cos = (_dot_unrolled_expr("qv", "v", dim)
                    / (F.col("_nq") * F.col("_nv")))
    else:
        pair_cos = cosine_dim(F.col("qv"), F.col("v"), dim)
    cand = assign.join(F.broadcast(probes), "cell").filter(
        F.col(id_col) != F.col("q_id")
    ).select(
        "q_id", F.col(id_col).alias("n_id"),
        F.round(pair_cos, 4).alias("cos"),
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return cand.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )
