"""Deduplication operators for training-data pipelines (SURVEY.md §2 Part B
"LLM-data extensions"): exact, MinHash+LSH near-dup, SimHash.

Scale design
------------
- Exact dedup: hash-groupBy on sha256(text) — one shuffle keyed by a
  64-hex string, uniform by construction (no skew), works at any SF.
- MinHash near-dup: the textbook shingle→minhash→band→bucket-join pipeline.
  Candidate generation is a self-join on (band_id, band_hash) buckets, so
  cost is sum over buckets of |bucket|² — NOT O(n²). ``max_bucket`` caps
  pathological buckets (boilerplate text) exactly like production dedup
  pipelines do; dropped buckets are a documented recall trade-off.
- SimHash: pure map-stage fingerprint; near-dup = fingerprints within small
  Hamming distance, found via band-exact match on fingerprint chunks.

Everything below is built-in higher-order functions (xxhash64 / transform /
aggregate / array_min) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus. With a,b,h < 2^31 the
# product a*h stays under 2^62 — no int64 overflow, so ANSI mode (Spark 4
# default, kept ON for oracle parity) never trips. 31-bit min-hash values
# are plenty for signature purposes (collision p ≈ 1e-7 per shingle set).
_P = (1 << 31) - 1


def _perm_constants(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family."""
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num_perm)]


def exact_dedup_keepers(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative (min id) per distinct text; adds the content hash
    and the number of copies. Reference-style dedup via hash-groupBy."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "content_sha256", "n_copies")
    )


def with_word_shingles(
    df: DataFrame, text_col: str, out: str = "grams", n: int = 3
) -> DataFrame:
    """Add a column of distinct word n-gram shingles, lowercased.

    DataFrame-level on purpose: the token array must be a bound ATTRIBUTE
    before the shingling lambda touches it. Higher-order-function lambdas
    are interpreted with no common-subexpression elimination, so a lambda
    that references an outer `split(...)` expression re-runs the regex
    split once PER SHINGLE (observed ~10x wall-clock on the minhash
    pipeline). Two projections keep the split at once-per-row: Catalyst's
    CollapseProject leaves multi-referenced non-cheap aliases alone.
    """
    tmp = df.withColumn("__toks", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    m = F.size("__toks")
    idx = F.sequence(F.lit(0), m - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, n)))
    return tmp.withColumn(
        out,
        F.when(m >= n, F.array_distinct(grams)).otherwise(F.array().cast("array<string>")),
    ).drop("__toks")


def shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, lane: str = "xxhash64"
) -> DataFrame:
    """(id, _gh) — one reduced hash per word n-gram occurrence.

    posexplode tokens → window lead() to line up the n-gram → multi-column
    xxhash64 of the n tokens. No per-element lambdas (interpreted HOFs cost
    ~20us per shingle — 3x the whole rest of the pipeline) and no string
    concatenation: the shingle never materializes, only its hash.
    Duplicate shingles are NOT deduped — MIN aggregation is multiset-
    invariant, so dedup would buy nothing and cost a shuffle.

    ``lane="sha256"`` swaps the shingle hash for the hex-prefix-of-sha
    pattern an ANSI oracle can recompute (the q141 twin); it materializes
    the gram string and runs a cryptographic hash, so xxhash64 stays the
    production default.
    """
    tk = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("pos", "w"),
    )
    win = Window.partitionBy("id").orderBy("pos")
    lead_cols = [F.lead("w", k).over(win).alias(f"_w{k}") for k in range(1, n)]
    leads = tk.select("id", "w", *lead_cols)
    gram_cols = ["w"] + [f"_w{k}" for k in range(1, n)]
    if lane == "sha256":
        gh = F.pmod(
            F.conv(
                F.substring(F.sha2(F.concat_ws(" ", *gram_cols), 256), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(_P),
        )
    else:
        gh = F.pmod(F.xxhash64(*gram_cols), F.lit(_P))
    return leads.filter(F.col(f"_w{n-1}").isNotNull()).select(
        "id", gh.alias("_gh")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    grams_col: str = "grams",
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures.

    Formulated as explode → hash-once → num_perm MIN aggregates, NOT as
    nested array lambdas: each shingle is xxhash64'd exactly once, the
    permutations are cheap affine maps of that one hash, and Spark's
    partial aggregation computes per-task mins map-side before the shuffle.
    Docs with no shingles produce no signature (and thus no candidates).
    """
    g = df.select(id_col, F.explode(grams_col).alias("_gram")).select(
        F.col(id_col).alias("id"), F.pmod(F.xxhash64("_gram"), F.lit(_P)).alias("_gh")
    )
    return signatures_from_hashes(g, num_perm, seed).withColumnRenamed("id", id_col)


def signatures_from_hashes(
    ghdf: DataFrame, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """(id, sig) from an (id, _gh) shingle-hash table. num_perm MIN
    aggregates with map-side partial aggregation."""
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("_gh") + F.lit(b), F.lit(_P))).alias(f"_m{i}")
        for i, (a, b) in enumerate(_perm_constants(num_perm, seed))
    ]
    return ghdf.groupBy("id").agg(*aggs).select(
        "id", F.array(*[f"_m{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) with the estimated
    Jaccard similarity (fraction of agreeing signature positions).

    bands×rows = num_perm; with 8 bands of 4 rows the S-curve midpoint is
    (1/8)^(1/4) ≈ 0.59 — matched to the default 0.5 threshold. 32
    permutations measured ~2x faster than 64 with identical output on the
    benchmark corpus (estimator std at j=0.5 is 1/sqrt(32) ≈ 0.09, fine
    for CANDIDATE generation — q53's exact Jaccard is the rescorer).
    """
    rows_per_band = num_perm // bands
    gh = shingle_hashes(df.select(F.col(id_col), F.col(text_col)), id_col, text_col, shingle_n)
    sig = signatures_from_hashes(gh, num_perm)

    band_idx = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
        )
    )
    banded = sig.select("id", "sig", band_idx.alias("band", "band_hash"))

    # One linear pipeline, no self-join: gather each bucket with
    # collect_list, then generate within-bucket pairs as an array
    # expression. A join-based formulation reads the banded table 3x
    # (bucket sizing + both join sides) and recomputes the whole
    # shingle→signature subtree each time (observed 4x wall-clock).
    # sort_array orders members by id, so pair generation with i<j yields
    # id_a < id_b for free. Buckets above max_bucket (boilerplate text)
    # are dropped — the documented recall trade-off that also bounds the
    # pair explosion to max_bucket²/2 per bucket.
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sig"))).alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    pair_arrays = F.flatten(
        F.transform(
            "members",
            lambda x, i: F.transform(
                F.slice("members", i + 2, F.size("members")),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["sig"].alias("sig_a"),
                    y["sig"].alias("sig_b"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_arrays).alias("p"))
        .select("p.id_a", "p.id_b", "p.sig_a", "p.sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = agree.cast("double") / F.lit(float(num_perm))
    return (
        cand.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_near_dup_pairs_sha(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-engine-exact MinHash banding (the q141 oracle twin of
    minhash_near_dup_pairs): sha256 hex-prefix shingle hashes instead of
    xxhash64, and band buckets keyed by the EXACT signature slice (the
    raw min values) instead of F.hash of it — every number in the
    pipeline is integer arithmetic an ANSI oracle reproduces, so the full
    shingle→signature→band→pair→estimate chain hash-checks. Same linear
    collect_list bucket pipeline as the production path; no max_bucket
    cap (the cap's hash-dependent bucket membership would make the
    drop set engine-specific — cap behavior is pinned separately by
    tests)."""
    rows_per_band = num_perm // bands
    gh = shingle_hashes(
        df.select(F.col(id_col), F.col(text_col)),
        id_col,
        text_col,
        shingle_n,
        lane="sha256",
    )
    sig = signatures_from_hashes(gh, num_perm)

    band_idx = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.slice("sig", b * rows_per_band + 1, rows_per_band),
        )
    )
    banded = sig.select("id", "sig", band_idx.alias("band", "band_key"))
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sig"))).alias("members"))
        .filter(F.size("members") >= 2)
    )
    pair_arrays = F.flatten(
        F.transform(
            "members",
            lambda x, i: F.transform(
                F.slice("members", i + 2, F.size("members")),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["sig"].alias("sig_a"),
                    y["sig"].alias("sig_b"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_arrays).alias("p"))
        .select("p.id_a", "p.id_b", "p.sig_a", "p.sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = agree.cast("double") / F.lit(float(num_perm))
    return (
        cand.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash_from_hashes(hashes: Column | str, bits: int = 64) -> Column:
    """SimHash fingerprint from a pre-computed array of token hashes: per
    bit position j, sum ±1 contributions, then pack sign bits. Factored
    out of :func:`simhash` so twins can supply an oracle-reproducible
    hash family (q142 uses sha256 hex-prefix hashes). When the hash is
    expensive, pass a bound ATTRIBUTE (two projections, like
    with_word_shingles) rather than an inline transform — the ``bits``
    aggregates each reference the array, and an inline non-cheap
    expression would re-run per bit."""
    h = F.col(hashes) if isinstance(hashes, str) else hashes

    # bit positions are Python ints (shift amounts must be literals in
    # PySpark), so loop driver-side while the math stays JVM-side
    def vote_merge(j: int):
        # factory, not `j=j` default: PySpark counts default params in arity
        return lambda acc, hv: acc + (
            F.shiftright(hv, j).bitwiseAND(F.lit(1)) * 2 - 1
        ).cast("int")

    fp = F.lit(0).cast("bigint")
    for j in range(bits):
        vote = F.aggregate(h, F.lit(0), vote_merge(j))
        # two's-complement weight for the top bit keeps the result in int64
        weight = -(1 << (bits - 1)) if j == bits - 1 else (1 << j)
        fp = fp + F.when(vote > 0, F.lit(weight).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return fp


def simhash(text: Column | str, bits: int = 64) -> Column:
    """SimHash fingerprint of whitespace tokens as a bigint.

    Map-only: per bit position j, sum ±1 contributions of token hashes,
    then pack sign bits. All higher-order built-ins, no UDF.
    """
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return simhash_from_hashes(F.transform(toks, lambda t: F.xxhash64(t)), bits)


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
    lane: str = "xxhash64",
) -> DataFrame:
    """(id, fingerprint) — winnowing document fingerprints (the rolling-hash
    scheme from Schleimer/Wilkerson/Aiken's MOSS): hash every k-gram, slide
    a w-window over the hash sequence, keep each window's minimum, emit the
    distinct minima. Two documents sharing a substring of length >= k+w-1
    are guaranteed to share a fingerprint.

    Same execution shape as shingle_hashes: posexplode + window lead for
    the k-grams, then a w-row sliding MIN — two window passes over one
    shuffle by document id. ``lane="sha256"`` swaps in the
    oracle-reproducible hex-prefix gram hash (q143 twin), same trade-off
    as shingle_hashes.
    """
    tk = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("pos", "w"),
    )
    win = Window.partitionBy("id").orderBy("pos")
    lead_cols = [F.lead("w", j).over(win).alias(f"_w{j}") for j in range(1, k)]
    gram_cols = ["w"] + [f"_w{j}" for j in range(1, k)]
    if lane == "sha256":
        gh = F.pmod(
            F.conv(
                F.substring(F.sha2(F.concat_ws(" ", *gram_cols), 256), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(_P),
        )
    else:
        gh = F.pmod(F.xxhash64(*gram_cols), F.lit(_P))
    grams = (
        tk.select("id", "pos", "w", *lead_cols)
        .filter(F.col(f"_w{k-1}").isNotNull())
        .select("id", "pos", gh.alias("_gh"))
    )
    w_slide = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    picks = grams.select("id", F.min("_gh").over(w_slide).alias("fingerprint"))
    return picks.distinct().withColumnRenamed("id", id_col)


def minhash_incremental_filter(
    new_df: DataFrame,
    old_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental dedup: drop rows of ``new_df`` whose MinHash signature
    agrees with some ``old_df`` row at >= ``threshold`` — the streaming/
    batch-append flow where each crawl increment is deduped AGAINST THE
    EXISTING CORPUS without re-pairing the corpus with itself.

    Candidates come from an equi-join of band hashes (new side only joins
    the bands it collides with, so cost scales with |new| + collision
    count, not |old|); collisions are rescored by full-signature
    agreement. At deployment scale the old side's banded signatures are a
    persisted table partitioned by (band, band_hash) — each increment
    probes, then appends its own bands.
    """
    rows_per_band = num_perm // bands

    def _banded(df: DataFrame, tag: str) -> DataFrame:
        gh = shingle_hashes(df.select(id_col, text_col), id_col, text_col, shingle_n)
        sig = signatures_from_hashes(gh, num_perm)
        band_idx = F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        )
        return sig.select(
            F.col("id").alias(f"{tag}_id"),
            F.col("sig").alias(f"{tag}_sig"),
            band_idx.alias("band", "band_hash"),
        )

    new_b = _banded(new_df, "new")
    old_b = _banded(old_df, "old")
    agree = F.aggregate(
        F.zip_with("new_sig", "old_sig", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    dup_ids = (
        new_b.join(old_b, ["band", "band_hash"])
        .filter(agree.cast("double") / F.lit(float(num_perm)) >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_df.join(dup_ids, id_col, "left_anti")


def token_rank_table(df: DataFrame, text_col: str) -> DataFrame:
    """(w, r) rarest-first token ranking for ``prefix_filter_jaccard_pairs``.

    Precompute once on the corpus, persist as a table, and pass to every
    subsequent prefix-filter run (incremental crawls, repeated audits) —
    the ranking's only job is to be ONE consistent total order, so a
    stale ranking stays LOSSLESS; it only drifts away from the
    bucket-minimizing rarest-first ideal as the corpus distribution moves.

    The dense rank is assigned with the range-partition + O(P)
    driver-prefix recipe (``operators/ids.py::assign_contiguous_ids``),
    NOT ``row_number() OVER (ORDER BY ...)``: a web-corpus vocabulary is
    10^8-10^9 tokens and the unpartitioned window would sort all of it in
    ONE task. The recipe is bit-identical to the window (q110 oracle) with
    every partition working."""
    from ..operators.ids import assign_contiguous_ids

    words = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("df_w"))
    return assign_contiguous_ids(vocab, ["df_w", "w"], id_col="r").select("w", "r")


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    token_rank: DataFrame | None = None,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering (the
    SSJoin/PPJoin candidate-pruning family) — the deterministic sibling of
    MinHash LSH: same near-dup-pairs contract, but lossless, so its output
    provably equals the brute-force all-pairs join and an ANSI oracle can
    hash-check it.

    Algorithm (word-token sets, global rarest-first token order):

    1. token sets + sizes (map-only);
    2. document frequency per token (one shuffle, vocab-sized);
    3. order tokens globally by ascending (df, token) — the pair itself is
       the total order, so no rank column (and no vocabulary-wide sort) is
       ever materialized; a precomputed ``token_rank`` table substitutes
       its dense rank here;
    4. each doc keeps only its ``sz - ceil(t*sz) + 1`` rarest tokens (its
       *prefix*); prefix-filter lemma (Chaudhuri et al., SSJoin; Xiao et
       al., PPJoin Lemma 1): any pair with Jaccard >= t must share a
       prefix token, because J >= t forces overlap >= ceil(t*max(|x|,|y|))
       and a prefix longer than |x| - overlap cannot avoid it;
    5. candidates = equi-join of prefix rows on the token (bucket sizes are
       df of the RAREST ~(1-t) fraction of each doc's vocabulary — the
       ordering exists precisely to keep these buckets small);
    6. exact rescoring of the distinct candidate pairs.

    Numerical soundness: ``ceil(t * sz)`` in floats can round UP across an
    integer boundary (0.8 * 5 -> 4.000000000000001 -> 5), silently
    shortening the prefix and LOSING pairs. The threshold is therefore
    converted to an exact rational num/den and the required overlap is
    computed as ``ceil(num * sz / den)`` on integers (quotients of small
    ints are exactly representable, so the float ceil is exact).

    Versus LSH at scale: no recall loss and no tuning, but candidate count
    degrades on corpora dominated by boilerplate (common tokens stay in
    prefixes of short docs). Production stacks run BOTH: LSH for the bulk,
    prefix-filter for the exactness-critical slice. No ``max_bucket`` cap
    here — dropping buckets would break the exactness contract.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1000)
    num, den = frac.numerator, frac.denominator

    toks = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("toks"),
        )
        .withColumn("sz", F.size("toks"))
    )

    words = toks.select("id", "sz", F.explode("toks").alias("w"))
    if token_rank is None:
        # Global rarest-first order; ties broken by the token itself so
        # the ranking is deterministic (soundness never depends on tie
        # order, but determinism keeps candidate counts reproducible).
        # No dense rank is ever materialized: the prefix lemma only needs
        # ONE total order shared by every document, and (df_w ASC, w ASC)
        # already is one — so the per-doc position window below orders by
        # the (df_w, w) PAIR directly. The r4/r5 formulation ranked the
        # vocabulary with an unpartitioned row_number first, which sorts
        # the whole 10^8-10^9-token web-corpus vocabulary in ONE task for
        # a value the algorithm never needed.
        vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("df_w"))
        ranked = words.join(vocab.withColumnRenamed("df_w", "r"), "w")
    else:
        # Precomputed (possibly STALE) ranking: tokens it never saw get
        # rank -1 — unseen tokens are almost certainly rare, so rarest-
        # first is the right guess. A left join is mandatory: an inner
        # join would DROP unranked tokens and silently shorten prefixes.
        ranked = words.join(
            token_rank.select("w", "r"), "w", "left"
        ).withColumn("r", F.coalesce("r", F.lit(-1)))

    alpha = F.ceil(F.lit(num) * F.col("sz") / F.lit(den))
    # Position order is (r, w), not r alone: a precomputed ranking may
    # carry duplicate ranks (or the -1 fallback), and the prefix lemma
    # needs ONE total order shared by every document — the token string
    # tie-break restores totality.
    prefix = (
        ranked.withColumn(
            "pos", F.row_number().over(Window.partitionBy("id").orderBy("r", "w"))
        )
        .filter(F.col("pos") <= F.col("sz") - alpha + 1)
        .select("id", "sz", "w")
    )

    # Length filter (the second classic SSJoin pruning, equally lossless):
    # J(x,y) >= t forces |x∩y| >= t*|x∪y|, and with |x∩y| <= min(|x|,|y|),
    # |x∪y| >= max(|x|,|y|) that means min/max >= t — checked in exact
    # integer arithmetic (den*min >= num*max) before the distinct, where
    # it prunes candidate VOLUME, not just pairs.
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "w")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (
                F.lit(den) * F.least("a.sz", "b.sz")
                >= F.lit(num) * F.greatest("a.sz", "b.sz")
            )
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    t_a = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    t_b = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(t_a, "id_a")
        .join(t_b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str | None = None,
    n: int = 8,
    min_shared: int = 1,
    lane: str = "xxhash64",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: which training documents share word
    ``n``-grams with a held-out evaluation set — the screen every
    pretraining corpus runs so eval answers don't leak into training
    (the GPT-3/Llama n-gram-overlap protocol; n=8..13 word grams is the
    published range). Returns one row per contaminated (train, bench)
    pair: (train_id, bench_id, n_shared, train_grams,
    contamination_frac = shared / train's distinct grams).

    Shape: distinct (id, gram-hash) sets on both sides (``shingle_hashes``
    — the n-gram never materializes in the production lane), equi-join on
    the gram hash, count per pair. The join is bucketed by gram hash —
    the bench side is tiny (eval sets are thousands of docs, broadcast-
    able), so at 100 TB this is a map-side broadcast probe of the train
    shingle stream; no all-pairs anything. ``lane="sha256"`` swaps in
    the hex-prefix hash an ANSI oracle can recompute (q193 hash-checks
    the full pipeline cross-engine, like q141 does for MinHash).
    ``broadcast_bench`` (default True) forces the broadcast because
    planner size estimates for a derived distinct aggregate are
    unreliable — pass False when the "bench" side is NOT eval-set-sized
    (a forced broadcast of a corpus-scale gram set would OOM the
    executors; the shuffle hash join is the correct plan there)."""
    tg = shingle_hashes(train, id_col, text_col, n=n, lane=lane).distinct()
    bg = (
        shingle_hashes(bench, bench_id_col or id_col, text_col, n=n, lane=lane)
        .distinct()
        .select(F.col("id").alias("_bid"), "_gh")
    )
    train_sizes = tg.groupBy("id").agg(F.count(F.lit(1)).alias("train_grams"))
    bench_side = F.broadcast(bg) if broadcast_bench else bg
    pairs = (
        tg.join(bench_side, "_gh")
        .groupBy("id", "_bid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.join(train_sizes, "id").select(
        F.col("id").alias("train_id"),
        F.col("_bid").alias("bench_id"),
        "n_shared",
        F.col("train_grams").cast("long").alias("train_grams"),
        F.round(
            F.col("n_shared").cast("double") / F.col("train_grams"), 6
        ).alias("contamination_frac"),
    )


def exact_substring_cuts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_occ: int = 2,
) -> DataFrame:
    """(id, span_start, span_len, n_dup_grams) — maximal token spans
    covered by word ``n``-grams that occur >= ``min_occ`` times ANYWHERE
    in the corpus (across documents or repeated within one): the cut
    list an exact-substring dedup pass removes, per Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better").
    ``span_start`` is a 0-based token index; ``span_len`` counts tokens;
    ``n_dup_grams`` is how many duplicated n-grams the span merges.

    q147 MEASURES this pressure (per-doc dup fraction); this operator
    emits the actionable spans so a rewrite pass can drop them.  The
    paper's construction is a character-level suffix array; this is the
    token-level n-gram-anchor form production pipelines use at scale:
    any duplicated substring of >= n tokens is fully covered by
    duplicated n-grams, so the cut list has no false negatives for
    spans >= n — chaining grams duplicated against *different* sources
    can over-merge (documented over-approximation, the safe direction
    for dedup).

    The floor: duplicated spans SHORTER than ``n`` tokens contain no
    duplicated n-gram and are invisible at the default (n=8, min_occ=2)
    — recall measured exactly on a planted corpus in
    tests/test_operators.py::test_exact_substring_short_span_recall
    and recorded in SCALING.md.  The complementary SHORT-SPAN pass is
    this same operator at (n=3, min_occ=high): at n<8 a threshold of 2
    would cut natural language (common trigrams repeat constantly), but
    a HIGH threshold isolates hot boilerplate fragments — navigation
    chrome, license lines, templated sentences — the same
    frequency-vs-length trade the paper resolves with its 50-character
    floor.  Cut lists from both passes union into ``remove_cut_spans``
    unchanged.

    Shape: per-doc posexplode→lead window builds grams (doc-grain
    shuffle), grams reduce to sha256 before the corpus-wide frequency
    groupBy (fixed-width uniform keys — the q147 economics), dup
    positions shuffle back to the doc grain, and span merging is a
    gaps-and-islands window per document (JVM, no Python).  Four keyed
    shuffles total; nothing global.
    """
    tk = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "pos", "w0"
        ),
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = [F.lead("w0", j).over(win).alias(f"w{j}") for j in range(1, n)]
    leads = tk.select(id_col, "pos", "w0", *lead_cols)
    gram_cols = [f"w{j}" for j in range(n)]
    grams = leads.filter(F.col(f"w{n - 1}").isNotNull()).select(
        id_col, "pos", F.sha2(F.concat_ws(" ", *gram_cols), 256).alias("g")
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("occ"))
    dup = (
        grams.join(freq.filter(F.col("occ") >= min_occ), "g")
        .select(id_col, "pos")
    )
    # gaps-and-islands: intervals [pos, pos+n) sorted by pos merge when
    # the next start is <= the previous end (overlap or adjacency)
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    flagged = dup.withColumn(
        "_new_island",
        F.when(
            F.col("pos") > F.lag("pos").over(w_doc) + F.lit(n), 1
        ).otherwise(0),
    ).withColumn(
        "_island",
        F.sum(
            F.when(F.col("_new_island") == 1, 1).otherwise(0)
        ).over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + F.lit(n) - F.min("pos")).cast("bigint").alias(
                "span_len"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
        )
        .drop("_island")
    )


def remove_cut_spans(
    docs: DataFrame,
    cuts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens_before, n_tokens_after, cleaned_text) — apply a cut
    list (``exact_substring_cuts`` output, or any (id, span_start,
    span_len) frame) to the corpus: tokens covered by any span are
    dropped, the survivors re-join into the cleaned document. The
    rewrite half of exact-substring dedup — q209 finds the spans, this
    removes them.

    Per-doc cut lists ride as an array column (collect_list at the doc
    grain — bounded by spans-per-doc, not corpus size), and the removal
    itself is a JVM ``filter`` with an index lambda testing coverage via
    ``exists`` — no shuffle beyond the one doc-keyed join, no Python.
    Docs with no cuts pass through whole (whitespace-normalized,
    lowercase — the same tokenization the cut positions refer to)."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks"),
    )
    per_doc = cuts.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").cast("long").alias("s"),
                F.col("span_len").cast("long").alias("l"),
            )
        ).alias("_cuts")
    )
    joined = toks.join(per_doc, id_col, "left").withColumn(
        "_cuts",
        F.coalesce(F.col("_cuts"), F.array().cast("array<struct<s:bigint,l:bigint>>")),
    )
    covered = lambda i: F.exists(  # noqa: E731 - reads better inline
        F.col("_cuts"), lambda c: (i >= c.s) & (i < c.s + c.l)
    )
    kept = F.filter(F.col("_toks"), lambda x, i: ~covered(i.cast("long")))
    return joined.select(
        F.col(id_col),
        F.size("_toks").cast("bigint").alias("n_tokens_before"),
        F.size(kept).cast("bigint").alias("n_tokens_after"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )
