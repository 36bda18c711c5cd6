"""LLM-training-data pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing, and the Pandas-UDF surface (SURVEY.md §2
Part B last rows).

Oracle notes: sha256 hex strings match between F.sha2 and DuckDB sha256();
cosine matches DuckDB list_cosine_similarity at 4 decimals; MinHash/SimHash
fingerprints are engine-specific (xxhash64) and therefore rows-only checks —
but each hash family has a sha256-lane exact twin (q141/q142/q143, and
q135-q138 for CMS/HLL/LSH/IVF) that the driver hash-checks end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    avg_token_length,
    distinct_token_count,
    stopword_ratio,
    token_count,
)
from ..functions.vectors import cosine_similarity
from ..llm.dedup import exact_dedup_keepers, minhash_near_dup_pairs, simhash
from ..llm.multimodal import (
    attach_fake_media,
    extract_features,
    resize_media,
    sample_frames,
)
from ..llm.similarity import (
    ann_search_bucketed,
    ivf_assign,
    ivf_fit_centroids,
    ivf_search,
    topk_cosine,
)
from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q50 — exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

@register(
    "q50_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, sha256(text) AS content_sha256, COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
    doc="Exact dedup: one keeper per distinct text, keyed by sha256 — uniform "
        "shuffle key, no skew at any scale.",
)
def q50_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup_keepers(docs, "doc_id", "text").select(
        "doc_id", "content_sha256", "n_copies"
    )


# ---------------------------------------------------------------------------
# q51 — text statistics / quality scoring
# ---------------------------------------------------------------------------

@register(
    "q51_text_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           len(string_split_regex(TRIM(text), '\\s+')) AS n_tokens,
           len(list_distinct(string_split_regex(LOWER(TRIM(text)), '\\s+'))) AS n_distinct_tokens,
           ROUND(LENGTH(REPLACE(text, ' ', ''))::DOUBLE
                 / len(string_split_regex(TRIM(text), '\\s+')), 4) AS avg_token_len,
           ROUND(len(list_filter(string_split_regex(LOWER(TRIM(text)), '\\s+'),
                                 t -> list_contains(['the','a','an','and','or','of','in','to','is',
                                                     'der','die','das','und','le','la','les','et',
                                                     'el','los','y','de','que'], t)))::DOUBLE
                 / len(string_split_regex(TRIM(text), '\\s+')), 4) AS stopword_ratio
    FROM documents
    """,
    doc="Token/char counts, distinct tokens, avg token length, stopword ratio — all "
        "codegen'd column expressions, zero Python per row.",
)
def q51_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lower_text = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        token_count("text").alias("n_tokens"),
        distinct_token_count(lower_text).alias("n_distinct_tokens"),
        F.round(avg_token_length("text"), 4).alias("avg_token_len"),
        F.round(stopword_ratio("text"), 4).alias("stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# q52 — language histogram (language-ID aggregate surface)
# ---------------------------------------------------------------------------

@register(
    "q52_lang_histogram",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="Language/source histogram over the corpus.",
)
def q52_lang_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# q53 — n-gram Jaccard similarity (exact, on a bounded id range)
# ---------------------------------------------------------------------------

@register(
    "q53_ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([LOWER(TRIM(text))[i:i+2] for i in range(1, LENGTH(TRIM(text)) - 1)])
                   AS grams
        FROM documents WHERE doc_id < 100
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
                 / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
          / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.65
    """,
    doc="Exact character-trigram Jaccard on a bounded window — the verification "
        "rescorer that MinHash candidates feed into at scale.",
)
def q53_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import with_char_ngrams

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = with_char_ngrams(docs, "text", "grams", 3).select("doc_id", "grams")
    # spread the nested-loop join's stream side: the filtered scan is a
    # single partition, which would serialize every Jaccard comparison
    a = sh.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(jac, 4).alias("jaccard"),
            jac.alias("_raw"),
        )
        .filter(F.col("_raw") >= 0.65)
        .drop("_raw")
    )


# ---------------------------------------------------------------------------
# q54 — MinHash-LSH near-dup candidates (rows-only: engine-specific hashes)
# ---------------------------------------------------------------------------

@register(
    "q54_minhash_near_dup",
    oracle=None,
    doc="MinHash+LSH banding near-dup pairs (shingle→minhash→band→bucket-join). "
        "xxhash64-based signatures have no DuckDB twin → rows-only check; "
        "q53 is the oracle-checked exact rescorer and q141 is the sha256 "
        "twin that hash-checks the entire banding pipeline cross-engine.",
)
def q54_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.5)


# ---------------------------------------------------------------------------
# q141 — MinHash banding with sha256 shingles (oracle-paired twin of q54)
# ---------------------------------------------------------------------------

def _minhash_sha_oracle(num_perm: int = 32, bands: int = 8) -> str:
    """Rebuilds the ENTIRE MinHash pipeline in ANSI SQL: 3-gram shingles,
    sha256 hex-prefix hashes, the same 32 affine permutations (seeded
    constants embedded as literals), min-signatures, exact-value band
    self-joins, pair dedup via UNION, and the agreement-fraction
    estimate. Every value is integer arithmetic, so the hash must match."""
    from ..llm.dedup import _P, _perm_constants

    rpb = num_perm // bands
    consts = _perm_constants(num_perm, seed=42)
    mins = ",\n           ".join(
        f"MIN(({a} * hv + {b}) % {_P}) AS m{i}" for i, (a, b) in enumerate(consts)
    )
    band_blocks = "\n    UNION\n".join(
        "    SELECT a.doc_id AS id_a, b.doc_id AS id_b\n"
        "    FROM mins a JOIN mins b ON a.doc_id < b.doc_id\n"
        + "".join(
            f"        AND a.m{j} = b.m{j}\n" for j in range(b * rpb, (b + 1) * rpb)
        )
        for b in range(bands)
    )
    eq = " + ".join(f"(a.m{i} = b.m{i})::INT" for i in range(num_perm))
    return rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest([array_to_string(t[i:i+2], ' ')
                       for i in range(1, len(t) - 1)]) AS gram
        FROM toks WHERE len(t) >= 3
    ),
    gh AS (
        SELECT doc_id,
               CAST(('0x' || substr(sha256(gram), 1, 8)) AS BIGINT) % {_P} AS hv
        FROM g
    ),
    mins AS (
        SELECT doc_id,
           {mins}
        FROM gh GROUP BY doc_id
    ),
    cand AS (
{band_blocks}
    )
    SELECT c.id_a, c.id_b,
           ROUND(({eq}) / {float(num_perm)}, 4) AS est_jaccard
    FROM cand c
    JOIN mins a ON a.doc_id = c.id_a
    JOIN mins b ON b.doc_id = c.id_b
    WHERE ({eq}) >= {num_perm // 2}
    """


@register(
    "q141_minhash_sha_twin",
    oracle=_minhash_sha_oracle(),
    doc="Oracle-paired twin of q54: the COMPLETE MinHash banding pipeline "
        "(shingle -> signature -> band bucket-join -> pair dedup -> "
        "agreement estimate) with sha256 hex-prefix shingle hashes and "
        "band buckets keyed by exact signature slices "
        "(llm/dedup.py::minhash_near_dup_pairs_sha), so DuckDB rebuilds "
        "every integer in the chain and the driver hash-checks what q54 "
        "can only row-count. The affine permutation family is identical "
        "(same seeded constants, embedded in the SQL as literals); only "
        "the shingle hash differs from production (xxhash64 is ~5x "
        "cheaper and stays the q54 default). No max_bucket cap here — "
        "its drop set is hash-dependent by design; cap behavior is "
        "pinned by tests/test_operators.py.",
)
def q141_minhash_sha_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import minhash_near_dup_pairs_sha

    docs = _t(spark, sf_dir, "documents")
    return minhash_near_dup_pairs_sha(docs, "doc_id", "text", threshold=0.5)


# ---------------------------------------------------------------------------
# q55 — SimHash fingerprints (rows-only: engine-specific hashes)
# ---------------------------------------------------------------------------

@register(
    "q55_simhash_fingerprints",
    oracle=None,
    doc="64-bit SimHash per document, map-only higher-order built-ins. "
        "rows-only (xxhash64 has no DuckDB twin); q142 is the sha-lane "
        "twin that hash-checks the vote-and-pack algebra.",
)
def q55_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select("doc_id", simhash("text").alias("simhash64"))


# ---------------------------------------------------------------------------
# q142 — 32-bit sha-lane SimHash (oracle-paired twin of q55)
# ---------------------------------------------------------------------------

def _simhash_sha_oracle(bits: int = 32) -> str:
    """Rebuilds the SimHash vote-and-pack in SQL: per-token sha256
    hex-prefix hash, per-bit ±1 vote sums, two's-complement sign packing
    — all integer arithmetic."""
    sums = ",\n           ".join(
        f"SUM((CAST((hv >> {j}) & 1 AS INT)) * 2 - 1) AS s{j}"
        for j in range(bits)
    )
    pack = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {-(1 << (bits - 1)) if j == bits - 1 else (1 << j)} ELSE 0 END"
        for j in range(bits)
    )
    return rf"""
    WITH tk AS (
        SELECT doc_id,
               unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS tok
        FROM documents WHERE doc_id < 200
    ),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(sha256(tok), 1, 8)) AS BIGINT) AS hv
        FROM tk
    ),
    v AS (
        SELECT doc_id,
           {sums}
        FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({pack} AS BIGINT) AS fingerprint
    FROM v
    """


@register(
    "q142_simhash_sha_twin",
    oracle=_simhash_sha_oracle(),
    doc="Oracle-paired twin of q55: the same SimHash vote-and-pack "
        "(llm/dedup.py::simhash_from_hashes) fed 32-bit sha256 hex-prefix "
        "token hashes instead of xxhash64, so DuckDB reproduces every "
        "vote sum and sign bit and the driver hash-checks the "
        "fingerprint algebra q55 can only row-count. The token-hash "
        "array is materialized as a bound attribute (two projections) so "
        "the 32 per-bit aggregates don't re-run the sha chain; xxhash64 "
        "remains the production default.",
)
def q142_simhash_sha_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import simhash_from_hashes

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    sha_hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.sha2(t, 256), 1, 8), 16, 10).cast(
            "bigint"
        ),
    )
    return docs.withColumn("_th", sha_hashes).select(
        "doc_id", simhash_from_hashes("_th", bits=32).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# q143 — sha-lane winnowing fingerprints (oracle-paired twin of q74)
# ---------------------------------------------------------------------------

@register(
    "q143_winnowing_sha_twin",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS t
        FROM documents WHERE doc_id < 100
    ),
    g AS (
        SELECT doc_id, u['pos'] AS pos,
               CAST(('0x' || substr(sha256(u['gram']), 1, 8))
                    AS BIGINT) % 2147483647 AS gh
        FROM (
            SELECT doc_id,
                   unnest([{'pos': i, 'gram': array_to_string(t[i:i+4], ' ')}
                           for i in range(1, len(t) - 3)]) AS u
            FROM toks WHERE len(t) >= 5
        )
    )
    SELECT DISTINCT doc_id,
           MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
               AS fingerprint
    FROM g
    """,
    doc="Oracle-paired twin of q74: the same winnowing scheme "
        "(llm/dedup.py::winnowing_fingerprints, lane='sha256') — k-gram "
        "hash stream, 4-row sliding MIN, distinct minima — with "
        "hex-prefix-of-sha gram hashes so DuckDB replays the rolling "
        "window exactly. The k+w-1 shared-substring guarantee is pinned "
        "by q74's property test; this twin pins the window algebra "
        "cross-engine.",
)
def q143_winnowing_sha_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import winnowing_fingerprints

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return winnowing_fingerprints(docs, "doc_id", "text", lane="sha256")


# ---------------------------------------------------------------------------
# q56 — top-k cosine similarity search (exact baseline)
# ---------------------------------------------------------------------------

@register(
    "q56_topk_cosine",
    oracle="""
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(
               list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
               (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
                FROM embeddings WHERE vec_id = 0)), 4) AS cosine_sim
    FROM embeddings e
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
    doc="Exact brute-force top-k cosine against vec_id=0's embedding: one map "
        "pass + TakeOrdered, no shuffle.",
)
def q56_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    qvec = em.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return topk_cosine(em, list(qvec), k=10)


# ---------------------------------------------------------------------------
# q57 — embedding near-duplicate pairs (bounded exact self-join)
# ---------------------------------------------------------------------------

@register(
    "q57_embedding_neardup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 300 AND b.vec_id < 300
      AND a.label = b.label
      AND list_cosine_similarity(
              list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
              list_transform(b.embedding, x -> CAST(x AS DOUBLE))) > 0.25
    """,
    doc="Embedding-cosine near-dup pairs, blocked by label (the blocking key stands "
        "in for an LSH bucket at scale) on a bounded id range.",
)
def q57_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = em.alias("a")
    b = em.alias("b")
    sim = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.label") == F.col("b.label")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("_sim"),
        )
        .filter(F.col("_sim") > 0.25)
        .select("id_a", "id_b", F.round("_sim", 4).alias("cosine_sim"))
    )


# ---------------------------------------------------------------------------
# q58 — ANN via LSH bucket (approximate → rows-only)
# ---------------------------------------------------------------------------

@register(
    "q58_ann_lsh_bucket",
    oracle=None,
    doc="Approximate top-k: random-hyperplane LSH bucket probe then exact rescoring "
        "within the bucket. Recall<1 by design → rows-only check; the bucket "
        "assignment itself is hash-checked by its exact-integer twin q137 "
        "and the rescoring by q56.",
)
def q58_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    qvec = em.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ann_search_bucketed(em, list(qvec), dim=len(qvec), k=10)


# ---------------------------------------------------------------------------
# q137 — exact-integer LSH bucket assignment (oracle-paired twin of q58)
# ---------------------------------------------------------------------------

def _lsh_exact_oracle(dim: int = 64, n_planes: int = 8, scale: int = 1000) -> str:
    """Oracle for q137: the seeded hyperplanes are deterministic driver-side
    Python, so quantize them to integers and embed them as SQL literals;
    DuckDB then recomputes every bucket bit with the same exact-integer
    dot products (integer-valued doubles stay exact below 2^53, so
    list_dot_product's double accumulation introduces no error)."""
    from ..llm.similarity import _hyperplanes_int

    planes = _hyperplanes_int(dim, n_planes, seed=42, scale=scale)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(qv, CAST([{','.join(str(v) for v in p)}]"
        f" AS DOUBLE[])) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH q AS (
        SELECT vec_id,
               [CAST(FLOOR(CAST(x AS DOUBLE) * {scale}) AS DOUBLE)
                for x in embedding] AS qv
        FROM embeddings
    )
    SELECT vec_id, CAST({bits} AS BIGINT) AS bucket FROM q
    """


@register(
    "q137_lsh_bucket_twin",
    oracle=_lsh_exact_oracle(),
    doc="Oracle-paired twin of q58's unverifiable half: the LSH bucket "
        "assignment itself. Same seeded hyperplanes as lsh_bucket_bits, "
        "quantized to integers (llm/similarity.py lsh_bucket_bits_exact) so "
        "every sign test is exact integer arithmetic — no FP summation-order "
        "ambiguity between engines — and the driver hash-checks the full "
        "(vec_id, bucket) table. q58's remaining stage (exact rescoring "
        "within a bucket) is the same top-k cosine already hash-green as "
        "q56, so between q137 and q56 the whole ANN path is oracle-covered; "
        "q58 stays rows-only only as the composed float-hyperplane query.",
)
def q137_lsh_bucket_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import lsh_bucket_bits_exact

    em = _t(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        lsh_bucket_bits_exact(F.col("embedding"), dim=64).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# q59 — grouped Pandas UDF (applyInPandas) with a SQL-checkable contract
# ---------------------------------------------------------------------------

@register(
    "q59_zscore_by_lang",
    oracle="""
    SELECT doc_id,
           ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                 / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4) AS z_chars
    FROM documents
    """,
    doc="applyInPandas: per-language z-score of document length. Arrow-batched "
        "grouped-map UDF; the oracle is the equivalent window formulation.",
)
def q59_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "z_chars": ((pdf["n_chars"] - mu) / sd).round(4)}
        )

    return docs.groupBy("lang").applyInPandas(_z, schema="doc_id bigint, z_chars double")


# ---------------------------------------------------------------------------
# q60 — multimodal plumbing through mapInPandas
# ---------------------------------------------------------------------------

@register(
    "q60_multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
    doc="Binary media column → mapInPandas feature extraction (byte length + "
        "sha256 stand in for decode/resize). The oracle checks the Arrow "
        "round-trip byte-exactly.",
)
def q60_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    return extract_features(media).select("doc_id", "n_bytes", "payload_sha256")


# ---------------------------------------------------------------------------
# q73 — IVF ANN (coarse quantizer + cluster probe; approximate → rows-only)
# ---------------------------------------------------------------------------

@register(
    "q73_ivf_ann",
    oracle=None,
    doc="IVF ANN: k-means coarse quantizer trained on a driver-side sample, "
        "JVM-side cluster assignment, nprobe-cluster exact rescoring. "
        "Approximate by design → rows-only; tests assert full-probe == exact "
        "and partial-probe recall; the cluster assignment is hash-checked by "
        "its exact-integer twin q138.",
)
def q73_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    qvec = list(em.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    cents = ivf_fit_centroids(em, n_clusters=16, sample_size=1024, iters=6)
    return ivf_search(em, qvec, cents, k=10, nprobe=4)


# ---------------------------------------------------------------------------
# q138 — exact-integer IVF cluster assignment (oracle-paired twin of q73)
# ---------------------------------------------------------------------------

@register(
    "q138_ivf_assign_twin",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS DOUBLE)
                for x in embedding] AS qv
        FROM embeddings
    ),
    c AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               qv AS cvec,
               list_dot_product(qv, qv) AS c2
        FROM q WHERE vec_id % 37 = 0
    ),
    scored AS (
        SELECT q.vec_id, c.cid,
               c.c2 - 2 * list_dot_product(q.qv, c.cvec) AS score
        FROM q CROSS JOIN c
    )
    SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY score, cid) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
    doc="Oracle-paired twin of q73's unverifiable half: the IVF cluster "
        "assignment. Runs the SAME ivf_assign operator (||c||^2 - 2<v,c> "
        "argmin, JVM-side) but on integer-quantized vectors with centroids "
        "taken deterministically from the data (every 37th vec_id, "
        "quantized) instead of the seeded k-means fit, so every distance "
        "is exact integer arithmetic and DuckDB reproduces the argmin "
        "bit-for-bit, tie-broken by centroid index on both sides. The "
        "bounded centroid collect (~n/37 rows) mirrors ivf_fit_centroids' "
        "driver-side quantizer training. q73's remaining stage (exact "
        "rescoring in probed clusters) is q56's hash-green top-k cosine; "
        "the k-means fit itself is pinned by full-probe==exact and recall "
        "tests.",
)
def q138_ivf_assign_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    qem = em.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1000)).cast("bigint"),
        ).alias("qv"),
    )
    cents = [
        [int(v) for v in r.qv]
        for r in qem.filter(F.col("vec_id") % 37 == 0).orderBy("vec_id").collect()
    ]
    return qem.select("vec_id", ivf_assign(F.col("qv"), cents).alias("cluster"))


# ---------------------------------------------------------------------------
# q74 — winnowing document fingerprints (rolling hash; rows-only)
# ---------------------------------------------------------------------------

@register(
    "q74_winnowing_fingerprints",
    oracle=None,
    doc="Winnowing (MOSS) rolling-hash fingerprints: k-gram xxhash64 stream, "
        "sliding-window minima, distinct per doc. Guaranteed shared "
        "fingerprint for substrings >= k+w-1 tokens. Engine-specific hashes "
        "→ rows-only; correctness covered by the planted-substring test "
        "and the q143 sha-lane twin hash-checks the rolling-window "
        "algebra.",
)
def q74_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import winnowing_fingerprints

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return winnowing_fingerprints(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q75 — dedup groups: connected components over exact-Jaccard pairs
# ---------------------------------------------------------------------------

@register(
    "q75_dedup_groups",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct([LOWER(TRIM(text))[i:i+2] for i in range(1, LENGTH(TRIM(text)) - 1)])
                   AS grams
        FROM documents WHERE doc_id < 100
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.65
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT a AS node, a AS label FROM edges
        UNION
        SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT node AS doc_id, MIN(label) AS canonical_id
    FROM reach GROUP BY node
    """,
    doc="Transitive closure of the near-dup relation: connected components "
        "via iterative min-label propagation (Spark) == recursive CTE "
        "(DuckDB). The canonical doc per group is the min doc_id.",
)
def q75_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import with_char_ngrams
    from ..operators.graph import dedup_groups

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = with_char_ngrams(docs, "text", "grams", 3).select("doc_id", "grams")
    # the filtered scan collapses to 1 partition, so the nested-loop join's
    # stream side must be spread or every Jaccard comparison runs on one
    # thread (measured 9s -> 1.3s at sf0.01 on local[32])
    a = sh.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(inter.cast("double") / union.cast("double") >= 0.65)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    return dedup_groups(pairs)


# ---------------------------------------------------------------------------
# q145 — near-dup-safe split (connected-component groups -> split buckets)
# ---------------------------------------------------------------------------

@register(
    "q145_neardup_safe_split",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct([LOWER(TRIM(text))[i:i+2] for i in range(1, LENGTH(TRIM(text)) - 1)])
                   AS grams
        FROM documents WHERE doc_id < 100
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.65
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT a AS node, a AS label FROM edges
        UNION
        SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
    ),
    groups AS (
        SELECT node AS doc_id, MIN(label) AS canonical_id
        FROM reach GROUP BY node
    ),
    full_map AS (
        SELECT d.doc_id, COALESCE(g.canonical_id, d.doc_id) AS canonical_id
        FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
        LEFT JOIN groups g ON g.doc_id = d.doc_id
    ),
    b AS (
        SELECT doc_id, canonical_id,
               CAST(('0x' || substr(sha256(CAST(canonical_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS bucket
        FROM full_map
    )
    SELECT doc_id, canonical_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="The near-dup-safe variant q144 promises: split assignment from "
        "the CONNECTED-COMPONENT canonical id (q75's transitive closure "
        "over exact-Jaccard pairs, coalesced to self for docs with no "
        "near-dup), so even non-identical near-duplicates cannot straddle "
        "train/test. Composition of three oracle-paired pieces (q75 "
        "groups, q144 bucketing, q84 hash_bucket) and itself hash-checked "
        "end-to-end via the same recursive-CTE oracle. Bounded window "
        "(doc_id < 100) like q75 — at scale the group map comes from the "
        "persisted dedup_groups output, and the split step stays map-only.",
)
def q145_neardup_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hash_bucket, with_char_ngrams
    from ..operators.graph import dedup_groups

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = with_char_ngrams(docs, "text", "grams", 3).select("doc_id", "grams")
    a = sh.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(inter.cast("double") / union.cast("double") >= 0.65)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    groups = dedup_groups(pairs)
    full = (
        docs.select("doc_id")
        .join(groups, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("canonical_id", F.col("doc_id")).alias("canonical_id"),
        )
    )
    bucket = hash_bucket(F.col("canonical_id"), 100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return full.select("doc_id", "canonical_id", split.alias("split"))


# ---------------------------------------------------------------------------
# q76 — one-pass data-quality validation report
# ---------------------------------------------------------------------------

@register(
    "q76_quality_report",
    oracle="""
    WITH m AS (
        SELECT ROUND(AVG(CASE WHEN text IS NULL THEN 1.0 ELSE 0.0 END), 6) AS text_null_ratio,
               ROUND(COUNT(DISTINCT doc_id)::DOUBLE / COUNT(*), 6)          AS doc_id_unique,
               ROUND(AVG(CASE WHEN n_chars BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END), 6)
                   AS chars_in_range
        FROM documents
    )
    SELECT 'text_null_ratio' AS rule, text_null_ratio AS value, CAST('-inf' AS DOUBLE) AS min_ok, 0.01 AS max_ok,
           (text_null_ratio <= 0.01) AS passed FROM m
    UNION ALL
    SELECT 'doc_id_unique', doc_id_unique, 1.0, CAST('inf' AS DOUBLE), doc_id_unique >= 1.0 FROM m
    UNION ALL
    SELECT 'chars_in_range', chars_in_range, 0.99, CAST('inf' AS DOUBLE), chars_in_range >= 0.99 FROM m
    """,
    doc="Declarative data-quality gate: every rule is a conditional aggregate "
        "in ONE scan (llm/quality.py::validate).",
)
def q76_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.quality import Rule, distinct_ratio, in_range_ratio, null_ratio, validate

    docs = _t(spark, sf_dir, "documents")
    rules = [
        Rule("text_null_ratio", null_ratio("text"), max_ok=0.01),
        Rule("doc_id_unique", distinct_ratio("doc_id"), min_ok=1.0),
        Rule("chars_in_range", in_range_ratio("n_chars", 10, 100000), min_ok=0.99),
    ]
    return validate(docs, rules)


# ---------------------------------------------------------------------------
# q82 — int8 embedding quantization (storage-scale compression)
# ---------------------------------------------------------------------------

@register(
    "q82_embedding_quantization",
    oracle="""
    WITH s AS (
        SELECT vec_id,
               embedding,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc
        FROM embeddings
    )
    SELECT vec_id,
           ROUND(sc, 6) AS scale,
           ROUND(list_max(list_transform(embedding,
                 x -> abs(floor(CAST(x AS DOUBLE) / sc + 0.5) * sc
                          - CAST(x AS DOUBLE)))), 6) AS max_abs_err
    FROM s
    """,
    doc="Symmetric int8 quantization of the embedding column (scale = "
        "max|x|/127) with per-vector max reconstruction error — the 4x "
        "storage compression a 100 TB vector corpus ships with. floor(x/s "
        "+ 0.5) on BOTH sides pins the rounding mode across engines. "
        "Map-only, zero shuffles.",
)
def q82_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    # bind the scale as a real column before the lambda references it —
    # HOF lambdas re-evaluate outer EXPRESSIONS per element (see
    # functions/text.py), attributes are free
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    with_scale = em.select(
        "vec_id",
        emb_d.alias("emb"),
        (F.array_max(F.transform(emb_d, F.abs)) / F.lit(127.0)).alias("sc"),
    )
    sc = F.col("sc")
    err = F.array_max(
        F.transform("emb", lambda x: F.abs(F.floor(x / sc + 0.5) * sc - x))
    )
    return with_scale.select(
        "vec_id",
        F.round(sc, 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# q87 — incremental dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------

@register(
    "q87_incremental_dedup",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([LOWER(TRIM(text))[i:i+2]
                              for i in range(1, LENGTH(TRIM(text)) - 1)]) AS grams
        FROM documents WHERE doc_id < 250
    ),
    old AS (SELECT * FROM sh WHERE doc_id < 150),
    new AS (SELECT * FROM sh WHERE doc_id >= 150)
    SELECT doc_id FROM new
    EXCEPT
    SELECT n.doc_id FROM new n JOIN old o
      ON len(list_intersect(o.grams, n.grams))::DOUBLE
         / len(list_distinct(list_concat(o.grams, n.grams))) >= 0.65
    """,
    doc="Incremental dedup (exact-Jaccard formulation, oracle-paired): "
        "keep new-batch docs with no >= 0.65 char-3-gram Jaccard match in "
        "the existing corpus. The scale path is llm/dedup.py::"
        "minhash_incremental_filter (band-hash equi-join probe of the "
        "persisted corpus signatures — cost scales with the increment, "
        "not the corpus; planted-dup test in tests/test_cleaning.py).",
)
def q87_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import with_char_ngrams

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sh = with_char_ngrams(docs, "text", "grams", 3).select("doc_id", "grams")
    old = sh.filter(F.col("doc_id") < 150).alias("o")
    # spread the probe (stream) side of the nested-loop join — the filtered
    # scan is 1 partition and would serialize the Jaccard comparisons
    new = (
        sh.filter(F.col("doc_id") >= 150)
        .repartition(spark.sparkContext.defaultParallelism)
        .alias("n")
    )
    inter = F.size(F.array_intersect(F.col("o.grams"), F.col("n.grams")))
    union = F.size(F.array_union(F.col("o.grams"), F.col("n.grams")))
    dup_ids = (
        new.join(old, inter.cast("double") / union.cast("double") >= 0.65)
        .select(F.col("n.doc_id").alias("doc_id"))
        .distinct()
    )
    return (
        new.select("doc_id").join(dup_ids, "doc_id", "left_anti")
    )


# ---------------------------------------------------------------------------
# q88/q89 — multimodal resize geometry + frame sampling
# ---------------------------------------------------------------------------

@register(
    "q88_image_resize",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               (64 + CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 1857)::INT AS width,
               (64 + CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 9, 8))
                          AS BIGINT) % 1017)::INT AS height
        FROM documents
    ),
    s AS (
        SELECT *, LEAST(1.0, 256.0 / GREATEST(width, height)) AS scale FROM m
    ),
    o AS (
        SELECT doc_id, n_bytes, width, height,
               GREATEST(1, CAST(FLOOR(width * scale) AS INT)) AS out_width,
               GREATEST(1, CAST(FLOOR(height * scale) AS INT)) AS out_height
        FROM s
    )
    SELECT doc_id, width, height, out_width, out_height,
           GREATEST(1, CAST(FLOOR(n_bytes * (out_width * out_height)
                                  / (width * height)) AS INT)) AS out_bytes
    FROM o
    """,
    doc="Multimodal resize plumbing: typed media metadata (sha256-derived, "
        "engine-portable) + aspect-preserving geometry computed in an "
        "Arrow-batched mapInPandas where a real decoder would slot in "
        "(llm/multimodal.py::resize_media). Oracle recomputes the geometry "
        "in SQL — IEEE-double on both engines.",
)
def q88_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = resize_media(attach_fake_media(docs), max_dim=256)
    return out.select(
        "doc_id", "width", "height", "out_width", "out_height", "out_bytes"
    )


@register(
    "q139_bmp_decode_twin",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               (4 + CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 61)::INT AS width,
               (4 + CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 9, 8))
                         AS BIGINT) % 45)::INT AS height
        FROM documents
    ),
    p AS (
        SELECT *,
               (((3 * width + 3) // 4) * 4 * height)::INT AS n_pixel_bytes,
               LEAST(1.0, 32.0 / GREATEST(width, height)) AS scale
        FROM m
    )
    SELECT doc_id, width, height, n_pixel_bytes,
           GREATEST(1, CAST(FLOOR(width * scale) AS INT)) AS out_width,
           GREATEST(1, CAST(FLOOR(height * scale) AS INT)) AS out_height
    FROM p
    """,
    doc="REAL image decode, hash-checked: attach_generated_bmp writes one "
        "valid 24bpp BMP per document (dims from sha256(doc_id) hex "
        "slices), decode_image_dims parses the actual binary headers with "
        "the stdlib struct codec (llm/multimodal.py::decode_bmp — no image "
        "library), and the resize geometry runs on the DECODED dims "
        "JVM-side. The oracle independently predicts what a correct "
        "decoder must read back (generator formula + BMP 4-byte row "
        "padding), so a header-parsing bug breaks the hash. Upgrades "
        "q88's geometry-only check to decode+geometry; n_pixel_bytes "
        "assumes the stdlib codec's padded BGR array (PIL, when installed, "
        "returns unpadded RGB — this twin is for the jar-free container).",
)
def q139_bmp_decode_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import attach_generated_bmp, decode_image_dims

    docs = _t(spark, sf_dir, "documents")
    dims = decode_image_dims(attach_generated_bmp(docs))
    scale = F.least(F.lit(1.0), F.lit(32.0) / F.greatest("width", "height"))
    return dims.select(
        "doc_id",
        "width",
        "height",
        "n_pixel_bytes",
        F.greatest(F.lit(1), F.floor(F.col("width") * scale).cast("int")).alias(
            "out_width"
        ),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale).cast("int")).alias(
            "out_height"
        ),
    )


@register(
    "q153_bmp_pixel_sum",
    oracle=r"""
    WITH m AS (
        SELECT doc_id,
               (4 + CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 61)::INT AS width,
               (4 + CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 9, 8))
                         AS BIGINT) % 45)::INT AS height,
               sha256(CAST(doc_id AS VARCHAR) || ':px') AS hx
        FROM documents
    ),
    b AS (
        SELECT doc_id, width, height, i,
               CAST(('0x' || substr(hx, i * 2 + 1, 2)) AS BIGINT) AS bv
        FROM m, unnest(generate_series(0, 31)) AS t(i)
    )
    SELECT doc_id, width, height, (width * height)::INT AS n_pixels,
           (width * 3 * height)::INT AS n_channel_bytes,
           CAST((width * 3 * height) // 32 * SUM(bv)
                + SUM(CASE WHEN i < (width * 3 * height) % 32 THEN bv ELSE 0 END)
                AS BIGINT) AS pixel_byte_sum
    FROM b GROUP BY doc_id, width, height
    """,
    doc="REAL pixel-content decode, hash-checked (extends q139's header "
        "check to the pixel array): the generator tiles sha256(doc_id':px') "
        "across w*3*h BGR bytes, the stdlib codec decodes the BMP and "
        "strips the 4-byte row padding, and the EXACT integer sum of the "
        "true channel bytes must equal the oracle's closed form (full-"
        "digest repeats + hex-prefix remainder). A wrong offset or short "
        "row shifts the sum; kept padding (zero bytes, invisible to the "
        "sum) inflates n_channel_bytes past 3*w*h. Integer-exact: no "
        "float rounding anywhere.",
)
def q153_bmp_pixel_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import attach_generated_bmp, decode_pixel_stats

    docs = _t(spark, sf_dir, "documents")
    return decode_pixel_stats(attach_generated_bmp(docs))


@register(
    "q89_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    ),
    f AS (
        SELECT doc_id, n_bytes,
               unnest(range(0, CAST(CEIL(n_bytes / 256.0) AS BIGINT), 4)) AS fi
        FROM m WHERE n_bytes > 0
    )
    SELECT doc_id, fi::INT AS frame_idx,
           LEAST(256, n_bytes - fi * 256)::INT AS frame_len
    FROM f
    """,
    doc="Video-style frame sampling: payload split into 256-byte frames, "
        "every 4th kept, one output row per sampled frame (row-expanding "
        "mapInPandas, llm/multimodal.py::sample_frames). Oracle derives the "
        "same (frame_idx, frame_len) stream with a range() unnest.",
)
def q89_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = sample_frames(attach_fake_media(docs), frame_bytes=256, every=4)
    return out.select("doc_id", "frame_idx", "frame_len")


# ---------------------------------------------------------------------------
# q91 — per-label embedding centroids (semantic-cluster statistics)
# ---------------------------------------------------------------------------

@register(
    "q91_label_centroids",
    oracle="""
    SELECT label, dim::INT AS dim, ROUND(AVG(e), 4) + 0.0 AS centroid
    FROM (
        SELECT label,
               unnest(embedding) AS e,
               unnest(range(0, len(embedding))) AS dim
        FROM embeddings
    )
    GROUP BY label, dim
    """,
    doc="Per-label, per-dimension embedding centroid: posexplode the vector "
        "and hash-aggregate on (label, dim). The explode multiplies rows by "
        "the dimensionality but partial aggregation collapses them map-side, "
        "so the shuffle carries only |labels|*dim rows — the scalable way to "
        "compute class centroids for semantic dedup/clustering at 100 TB. "
        "Both sides add +0.0 after the round: a tiny negative mean rounds "
        "to IEEE negative zero, and -0.0 vs 0.0 is value-equal but "
        "repr/hash-different; x + 0.0 canonicalizes to +0.0.",
)
def q91_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    exploded = em.select("label", F.posexplode("embedding").alias("dim", "e"))
    return exploded.groupBy("label", "dim").agg(
        (F.round(F.avg("e"), 4) + F.lit(0.0)).alias("centroid")
    )


# ---------------------------------------------------------------------------
# q96 — corpus curation funnel (composed clean→dedup→quality pipeline)
# ---------------------------------------------------------------------------

@register(
    "q96_curation_funnel",
    oracle=None,
    doc="End-to-end curation funnel over documents: HTML strip + PII "
        "redaction, then quality gates, exact dedup, and MinHash near-dup "
        "— one declarative pass annotating drop_reason per doc, one groupBy "
        "for the report (llm/curation.py). MinHash stage is engine-specific "
        "→ rows-only; each stage is oracle-checked individually by "
        "q50/q54/q77/q78/q51, and the deterministic prefix of THIS funnel "
        "is hash-checked end-to-end by q132.",
)
def q96_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import curate_corpus, curation_report

    docs = _t(spark, sf_dir, "documents")
    return curation_report(
        curate_corpus(docs, min_tokens=5, near_threshold=0.7)
    )


# ---------------------------------------------------------------------------
# q132 — deterministic curation prefix (oracle-paired twin of q96's funnel)
# ---------------------------------------------------------------------------

def _curation_prefix_oracle() -> str:
    from ..llm.cleaning import pii_redact_sql, strip_html_sql

    clean = pii_redact_sql(strip_html_sql("text"))
    return rf"""
    WITH cleaned AS (
        SELECT doc_id, {clean} AS clean_text FROM documents
    ),
    quality AS (
        SELECT doc_id, clean_text,
               CASE WHEN len(string_split_regex(TRIM(clean_text), '\s+')) < 5
                    THEN 'too_short' END AS q_reason
        FROM cleaned
    ),
    keepers AS (
        SELECT MIN(doc_id) AS keep_id
        FROM quality WHERE q_reason IS NULL
        GROUP BY sha256(clean_text)
    )
    SELECT q.doc_id,
           COALESCE(q.q_reason,
                    CASE WHEN k.keep_id IS NULL THEN 'exact_dup'
                         ELSE 'entered_near_dup' END) AS stage
    FROM quality q LEFT JOIN keepers k ON q.doc_id = k.keep_id
    """


@register(
    "q132_curation_prefix",
    oracle=_curation_prefix_oracle(),
    doc="Per-document drop_reason for the DETERMINISTIC prefix of the q96 "
        "curation funnel (clean → too_short gate → exact dedup), with "
        "near-dup survivors collapsed to 'entered_near_dup'. Runs the same "
        "curate_corpus code with near_threshold=None, so the driver "
        "hash-checks the composed pipeline end-to-end (q96's only "
        "unverifiable stage is the engine-specific MinHash band join). "
        "Oracle SQL is composed from the SAME pattern tables as the Spark "
        "expressions (pii_redact_sql/strip_html_sql) plus q50's keeper rule.",
)
def q132_curation_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    # cache_cleaned=False: the deterministic prefix has only two downstream
    # branches (keeper groupBy + final join), and curate_corpus's persist
    # lives for the session — repeated correctness sweeps (q96 + q132 +
    # tests) would otherwise accumulate persisted frames in executor storage.
    ann = curate_corpus(
        docs, min_tokens=5, near_threshold=None, cache_cleaned=False
    )
    return ann.select(
        "doc_id",
        F.coalesce("drop_reason", F.lit("entered_near_dup")).alias("stage"),
    )


# ---------------------------------------------------------------------------
# q128/q129 — embedding-cosine near-dup (exact oracle + LSH scale path)
# ---------------------------------------------------------------------------

def _planted_embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table has no natural near-dups (max pair cosine 0.51
    at sf0.01), so plant them: each base vector gets a slightly perturbed
    twin (x*1.001 + 0.01, id + 10000). Planted pairs land at cosine >=
    0.996 while everything else stays <= 0.40 — a margin no cross-engine
    float noise can flip."""
    base = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
    )
    dup = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001 + 0.01).alias("embedding"),
    )
    return base.unionByName(dup)


_PLANTED_CORPUS_SQL = """
    base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
    dup AS (SELECT vec_id + 10000 AS vec_id,
                   list_transform(embedding, x -> x * 1.001 + 0.01) AS embedding
            FROM base),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM dup)
"""


@register(
    "q128_embedding_near_dup",
    oracle=f"""
    WITH {_PLANTED_CORPUS_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
    """,
    doc="Embedding-cosine near-dup pairs (semantic dedup): exact all-pairs "
        "rescorer on a bounded window with planted duplicates — the "
        "verification stage that LSH candidates (q129) feed into at scale.",
)
def q128_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import cosine_near_dup_pairs

    return cosine_near_dup_pairs(
        _planted_embedding_corpus(spark, sf_dir), threshold=0.9
    )


@register(
    "q129_embedding_near_dup_lsh",
    oracle=None,  # approximate by design (recall < 1); precision/recall tests
    doc="LSH-bucketed embedding near-dup: candidates are same-bucket pairs "
        "(hash equi-join on the random-hyperplane bucket id — never "
        "all-pairs), exact-rescored by cosine. Rows-only check; "
        "tests/test_similarity.py pins precision=1 and planted-pair recall.",
)
def q129_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import cosine_near_dup_pairs_lsh

    return cosine_near_dup_pairs_lsh(
        _planted_embedding_corpus(spark, sf_dir), threshold=0.9, dim=64
    )


# ---------------------------------------------------------------------------
# q130/q131 — incremental semantic dedup: admit a new embedding batch
# against the existing corpus (exact oracle + LSH scale path)
# ---------------------------------------------------------------------------

def _incremental_batches(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """corpus = vectors 0..99; new batch = 25 perturbed corpus twins
    (planted dups, ids +20000) + 25 genuinely fresh vectors (ids 100..124).
    A correct filter admits exactly the 25 fresh ids."""
    emb = _t(spark, sf_dir, "embeddings")

    def _dbl(col):
        return F.transform(col, lambda x: x.cast("double")).alias("embedding")

    corpus = emb.filter(F.col("vec_id") < 100).select("vec_id", _dbl("embedding"))
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.001 + 0.01).alias(
            "embedding"
        ),
    )
    fresh = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 125)).select(
        "vec_id", _dbl("embedding")
    )
    return corpus, planted.unionByName(fresh)


_INCREMENTAL_SQL = """
    corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
    newb AS (
        SELECT vec_id + 20000 AS vec_id,
               list_transform(embedding, x -> x * 1.001 + 0.01) AS embedding
        FROM embeddings WHERE vec_id < 25
        UNION ALL
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 100 AND vec_id < 125
    ),
    dups AS (
        SELECT DISTINCT n.vec_id
        FROM newb n JOIN corpus c
          ON list_cosine_similarity(n.embedding, c.embedding) >= 0.9
    )
"""


@register(
    "q130_embedding_incremental_dedup",
    oracle=f"""
    WITH {_INCREMENTAL_SQL}
    SELECT vec_id FROM newb WHERE vec_id NOT IN (SELECT vec_id FROM dups)
    """,
    doc="Incremental semantic dedup (exact twin): new-batch vectors with no "
        "corpus neighbor at cosine >= 0.9 survive admission — the embedding "
        "counterpart of q87's text-based incremental filter.",
)
def q130_embedding_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import cosine_incremental_filter

    corpus, new = _incremental_batches(spark, sf_dir)
    return cosine_incremental_filter(corpus, new, threshold=0.9)


@register(
    "q131_embedding_incremental_lsh",
    oracle=None,  # recall < 1 by design; containment pinned in tests
    doc="Incremental semantic dedup, LSH scale path: candidates from a "
        "bucket equi-join so cost scales with |new| + collisions, not "
        "|corpus|. A bucket-straddled dup is admitted (recall loss), never "
        "a fresh vector rejected — tests pin exact-kept ⊆ lsh-kept and "
        "all-fresh-kept.",
)
def q131_embedding_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import cosine_incremental_filter

    corpus, new = _incremental_batches(spark, sf_dir)
    return cosine_incremental_filter(corpus, new, threshold=0.9, dim=64)


# ---------------------------------------------------------------------------
# q166 — prefix-filtered exact Jaccard near-dup degree (PPJoin-style)
# ---------------------------------------------------------------------------

@register(
    "q166_prefix_filter_neardup",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               list_distinct(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS toks
        FROM documents
        WHERE doc_id < 800 AND LENGTH(TRIM(text)) > 0
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.toks, b.toks))::DOUBLE
                   / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    ),
    und AS (
        SELECT id_a AS doc_id, jaccard FROM pairs
        UNION ALL
        SELECT id_b AS doc_id, jaccard FROM pairs
    )
    SELECT doc_id,
           COUNT(*) AS n_neighbors,
           ROUND(MAX(jaccard), 4) AS best_jaccard
    FROM und GROUP BY doc_id
    """,
    doc="Per-doc near-dup degree from an EXACT Jaccard >= 0.8 self-join. "
        "The Spark side prunes candidates with PPJoin-style prefix "
        "filtering (rarest-token prefixes, equi-join — lossless by the "
        "prefix-filter lemma); the oracle brute-forces all pairs. Hash "
        "equality proves the pruning drops no pair. Bounded to doc_id < "
        "800 so the ORACLE'S O(n^2) side stays feasible — the Spark path "
        "is the scale formulation (dedup.py::prefix_filter_jaccard_pairs).",
)
def q166_prefix_filter_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import prefix_filter_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
    pairs = prefix_filter_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
    und = pairs.select(F.col("id_a").alias("doc_id"), "jaccard").unionAll(
        pairs.select(F.col("id_b").alias("doc_id"), "jaccard")
    )
    return und.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.round(F.max("jaccard"), 4).alias("best_jaccard"),
    )


# ---------------------------------------------------------------------------
# q192 — deterministic negative sampling for contrastive training
# ---------------------------------------------------------------------------

@register(
    "q192_negative_samples",
    oracle="""
    WITH cand AS (SELECT lang AS query_id, doc_id FROM documents),
    pos AS (
      SELECT lang AS query_id, doc_id FROM documents
      WHERE CAST(SUBSTR(source, 4) AS INT) % 5 IN (0, 1, 2)
    ),
    neg AS (
      SELECT c.query_id, c.doc_id
      FROM cand c ANTI JOIN pos p
        ON c.query_id = p.query_id AND c.doc_id = p.doc_id
    ),
    r AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY sha256(query_id || ':' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS neg_rank
      FROM neg
    )
    SELECT query_id, doc_id, CAST(neg_rank AS INT) AS neg_rank
    FROM r WHERE neg_rank <= 5
    """,
    doc="operators/sampling.py::deterministic_negative_samples — 5 "
        "negatives per query (query = lang, candidates blocked to the "
        "query's own language, positives = the q177 relevance rule) "
        "drawn as the smallest sha256(query:id) after an anti-join "
        "guarantees no positive leaks in. Seedless and engine-"
        "independent: any cluster, any partitioning, any engine redraws "
        "the identical sample — what makes contrastive training data "
        "auditable. Anti-join + per-query WindowGroupLimit top-k; "
        "parallelism = query cardinality.",
)
def q192_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import deterministic_negative_samples

    docs = _t(spark, sf_dir, "documents")
    cand = docs.select(F.col("lang").alias("query_id"), "doc_id")
    src_num = F.substring("source", 4, 10).cast("int")
    pos = docs.filter((src_num % 5).isin(0, 1, 2)).select(
        F.col("lang").alias("query_id"), "doc_id"
    )
    return deterministic_negative_samples(cand, pos, "query_id", "doc_id", k=5)


# ---------------------------------------------------------------------------
# q193 — benchmark decontamination (n-gram overlap screen), sha lane
# ---------------------------------------------------------------------------

@register(
    "q193_decontamination",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest([array_to_string(t[i:i+3], ' ')
                       for i in range(1, len(t) - 2)]) AS gram
        FROM toks WHERE len(t) >= 4
    ),
    gh AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(sha256(gram), 1, 8)) AS BIGINT)
                 % 2147483647 AS hv
        FROM g
    ),
    tg AS (SELECT doc_id, hv FROM gh WHERE doc_id % 11 <> 0),
    bg AS (SELECT doc_id AS bid, hv FROM gh WHERE doc_id % 11 = 0),
    sizes AS (SELECT doc_id, COUNT(*) AS train_grams FROM tg GROUP BY doc_id),
    pairs AS (
      SELECT tg.doc_id, bg.bid, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM tg JOIN bg USING (hv) GROUP BY 1, 2
    )
    SELECT pairs.doc_id AS train_id, pairs.bid AS bench_id,
           pairs.n_shared,
           CAST(sizes.train_grams AS BIGINT) AS train_grams,
           ROUND(CAST(pairs.n_shared AS DOUBLE) / sizes.train_grams, 6)
             AS contamination_frac
    FROM pairs JOIN sizes USING (doc_id)
    """,
    doc="llm/dedup.py::contamination_report — the GPT-3/Llama n-gram "
        "overlap decontamination screen, PAIR-ATTRIBUTED (q112 is the "
        "pooled sibling: it scores each train doc against the union of "
        "all bench grams; this operator reports WHICH bench document "
        "leaked into which train document — the form you act on when "
        "pruning): which training documents share "
        "word 4-grams with the held-out slice (doc_id mod 11 — standing "
        "in for an eval benchmark), reported as (train, bench, shared "
        "grams, contamination fraction). Distinct gram-hash sets each "
        "side, bench side broadcast (eval sets are thousands of docs), "
        "equi-join on the gram hash, count per pair — a map-side "
        "broadcast probe of the train shingle stream at 100 TB. Runs "
        "the sha256-hex-prefix lane so the oracle rebuilds the exact "
        "hash space (collisions included), same protocol as q141; "
        "production uses the ~5x cheaper xxhash64 lane.",
)
def q193_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import contamination_report

    docs = _t(spark, sf_dir, "documents")
    return contamination_report(
        docs.filter(F.col("doc_id") % 11 != 0),
        docs.filter(F.col("doc_id") % 11 == 0),
        id_col="doc_id",
        text_col="text",
        n=4,
        lane="sha256",
    )


# ---------------------------------------------------------------------------
# q199 — distributed BPE training: first-iteration merge candidates
# ---------------------------------------------------------------------------

@register(
    "q199_bpe_merge_candidates",
    oracle=r"""
    WITH w AS (
      SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
      FROM documents
    ),
    wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM w WHERE LENGTH(word) > 0 GROUP BY word
    ),
    p AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, freq
      FROM wf, unnest(range(1, LENGTH(word))) t(i)
      WHERE LENGTH(word) >= 2
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 10
    """,
    doc="llm/bpe.py — the distributed core of BPE tokenizer training "
        "(Sennrich et al.): corpus reduced once to the (distinct word, "
        "frequency) table (Zipf head collapses map-side), adjacent "
        "symbol pairs weighted by word frequency, top merge candidates "
        "by (count DESC, pair) — the argmax the first merge iteration "
        "consumes. Character-level symbols make the pair a 2-char "
        "substring, so the oracle replays it exactly in SQL. The "
        "multi-iteration trainer (train_bpe: JVM higher-order merge "
        "fold, 1-row driver argmax per iteration, vocab-sized not "
        "corpus-sized work) matches a sequential Python reference on "
        "the textbook corpus in tests/test_pipeline_ops.py; "
        "functions/text.py::bpe_ish_tokens remains the counting-side "
        "heuristic for token budgeting.",
)
def q199_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.bpe import chars_of, pair_counts, word_frequencies

    docs = _t(spark, sf_dir, "documents")
    vocab = word_frequencies(docs, "text").select(
        "freq", chars_of("word").alias("syms")
    )
    return (
        pair_counts(vocab)
        .select(F.concat("a", "b").alias("pair"), "cnt")
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q208 — vocabulary growth curve (Heaps' law audit over ingest order)
# ---------------------------------------------------------------------------

@register(
    "q208_vocab_growth",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, doc_id % 10 AS batch,
             unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS w
      FROM documents WHERE LENGTH(TRIM(text)) > 0
    ),
    first_seen AS (
      SELECT w, MIN(batch) AS fb FROM words GROUP BY w
    ),
    new_types AS (
      SELECT fb AS batch, CAST(COUNT(*) AS BIGINT) AS new_types
      FROM first_seen GROUP BY fb
    ),
    tok AS (
      SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM words GROUP BY batch
    )
    SELECT tok.batch,
           tok.n_tokens,
           COALESCE(new_types.new_types, 0) AS new_types,
           CAST(SUM(tok.n_tokens) OVER (ORDER BY tok.batch) AS BIGINT)
             AS cum_tokens,
           CAST(SUM(COALESCE(new_types.new_types, 0))
                  OVER (ORDER BY tok.batch) AS BIGINT) AS cum_types,
           ROUND(CAST(SUM(COALESCE(new_types.new_types, 0))
                        OVER (ORDER BY tok.batch) AS DOUBLE)
                 / SUM(tok.n_tokens) OVER (ORDER BY tok.batch), 6)
             AS type_token_ratio
    FROM tok LEFT JOIN new_types USING (batch)
    """,
    doc="Vocabulary growth curve over ingest batches (doc_id mod 10 as "
        "the arrival order): per batch, new-type count (tokens whose "
        "FIRST sighting is that batch — one min-aggregation over the "
        "vocab, the same first-occurrence idiom as q198 applied to the "
        "corpus grain) and cumulative types vs cumulative tokens — the "
        "Heaps'-law diagnostic that tells a crawl operator whether new "
        "data still adds vocabulary or the corpus has saturated (and "
        "sizes the BPE vocab q199 trains). Token streams shuffle once "
        "to the word grain and once to the 10-row batch grain; the "
        "cumulative window runs over |batches| rows.",
)
def q208_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            (F.col("doc_id") % 10).alias("batch"),
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
        )
    )
    first_seen = words.groupBy("w").agg(F.min("batch").alias("fb"))
    new_types = first_seen.groupBy(F.col("fb").alias("batch")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_types")
    )
    tok = words.groupBy("batch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    w = Window.orderBy("batch")
    out = tok.join(new_types, "batch", "left").withColumn(
        "new_types", F.coalesce("new_types", F.lit(0))
    )
    return out.select(
        "batch",
        "n_tokens",
        "new_types",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_types"),
        F.round(
            F.sum("new_types").over(w).cast("double") / F.sum("n_tokens").over(w),
            6,
        ).alias("type_token_ratio"),
    )


# ---------------------------------------------------------------------------
# q210/q211 — BPE APPLY: vocabulary encode + corpus token counts
# ---------------------------------------------------------------------------

# A trained tokenizer snapshot: the 12 merges llm/bpe.py::train_bpe learns
# on the documents corpus (deterministic count-desc/(a,b)-asc tie-break).
# Frozen as a literal because that IS the production shape — a tokenizer
# is trained once and shipped to every encode site; both the Spark query
# and the oracle consume this one table, so they can never drift.
_BPE_MERGES_12: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"),
]

_BPE_MERGES_SQL = ",".join(
    f"({r + 1},'{a}','{b}')" for r, (a, b) in enumerate(_BPE_MERGES_12)
)

# Shared oracle scaffold: recursive CTE applying merge r to its REPLACE
# fixpoint before advancing to r+1 (equivalent to the engine's one
# left-to-right pass per merge — fusing (a,b) never creates a new (a,b)).
_BPE_ENC_CTE = rf"""
    WITH RECURSIVE merges(r, a, b) AS (VALUES {_BPE_MERGES_SQL}),
    words AS (
      SELECT DISTINCT w AS word
      FROM (SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS w
            FROM documents)
      WHERE length(w) > 0
    ),
    enc AS (
      SELECT word,
             ' ' || array_to_string(list_transform(range(1, length(word)+1),
                                                   i -> word[i]), ' ') || ' '
               AS s,
             1 AS r
      FROM words
      UNION ALL
      SELECT word,
             CASE WHEN rep <> s THEN rep ELSE s END,
             CASE WHEN rep <> s THEN r ELSE r + 1 END
      FROM (
        SELECT e.word, e.s, e.r,
               REPLACE(e.s, ' '||m.a||' '||m.b||' ', ' '||m.a||m.b||' ') AS rep
        FROM enc e JOIN merges m ON m.r = e.r
      )
      WHERE r <= 12
    ),
    vocab AS (
      SELECT word,
             CAST(len(string_split(TRIM(s), ' ')) AS BIGINT) AS n_tokens,
             TRIM(s) AS encoded
      FROM enc WHERE r = 13
    )
"""


@register(
    "q210_bpe_encode_vocab",
    oracle=_BPE_ENC_CTE + "SELECT word, n_tokens, encoded FROM vocab",
    doc="llm/bpe.py::bpe_encode_words — the APPLY side of the BPE "
        "trainer (q199 counts pairs, train_bpe learns the table, THIS "
        "encodes with it): the vocabulary encoding table for a frozen "
        "12-merge tokenizer. Spark runs one constant-depth nested "
        "aggregate fold (merges outer, symbols inner, skip-flag pair "
        "merge) over the DISTINCT-word table only — the Zipf trick that "
        "makes BPE apply corpus-size-independent; the oracle's recursive "
        "CTE iterates delimiter-padded REPLACE to fixpoint per rank, "
        "which lands on the identical leftmost-greedy pairing.",
)
def q210_bpe_encode_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.bpe import bpe_encode_words, word_frequencies

    words = word_frequencies(_t(spark, sf_dir, "documents"), "text").select("word")
    return bpe_encode_words(words, _BPE_MERGES_12)


@register(
    "q211_bpe_token_counts",
    oracle=_BPE_ENC_CTE + r"""
    , corpus AS (
      SELECT doc_id, unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
      FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_bpe_tokens
    FROM corpus JOIN vocab USING (word)
    GROUP BY doc_id
    """,
    doc="llm/bpe.py::bpe_token_counts — corpus-grain BPE token counts "
        "through the broadcast vocabulary table: explode words, "
        "broadcast-join the encoded vocab (dim-sized), one doc-keyed "
        "aggregation. The merge fold never touches corpus rows — this "
        "is the token-budget accounting a packing/packer stage (q186, "
        "q113) consumes, now in REAL trained-tokenizer units instead of "
        "the whitespace proxy.",
)
def q211_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.bpe import bpe_token_counts

    return bpe_token_counts(_t(spark, sf_dir, "documents"), _BPE_MERGES_12)


# ---------------------------------------------------------------------------
# q212 — SemDeDup: cluster-then-dedup-within-cluster composition
# ---------------------------------------------------------------------------

@register(
    "q212_semdedup_drop_list",
    oracle=f"""
    WITH {_PLANTED_CORPUS_SQL},
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM corpus),
    cents AS (SELECT vec_id AS cid, v AS c FROM emb WHERE vec_id < 4),
    d AS (
        SELECT emb.vec_id, cents.cid,
               list_sum(list_transform(list_zip(emb.v, cents.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist2
        FROM emb CROSS JOIN cents
    ),
    rn AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS r
        FROM d
    ),
    asg AS (
        SELECT emb.vec_id, rn.cid AS cluster, emb.v
        FROM emb JOIN rn ON emb.vec_id = rn.vec_id AND rn.r = 1
    ),
    pairs AS (
        SELECT x.vec_id AS id, x.cluster, y.vec_id AS nid,
               ROUND(list_cosine_similarity(x.v, y.v), 6) AS cos
        FROM asg x JOIN asg y
          ON x.cluster = y.cluster AND x.vec_id > y.vec_id
        WHERE list_cosine_similarity(x.v, y.v) >= 0.9
    )
    SELECT id, cluster,
           CAST(MIN(nid) AS BIGINT) AS keeper_id,
           MIN_BY(cos, nid) AS keeper_cos
    FROM pairs GROUP BY id, cluster
    """,
    doc="llm/similarity.py::semantic_dedup_drop_list — the SemDeDup "
        "(Abbas et al.) composition of q150 + q128 registered as its own "
        "recipe: one k-means assignment pass from deterministic seeds "
        "(4 lowest vec_ids) partitions the planted corpus, then cosine "
        "near-dup runs WITHIN clusters only (pair join keyed by cluster "
        "id — Σ|cluster|², never all-pairs; at 100 TB the cluster id is "
        "a persisted partition column). Output is the drop list: each "
        "planted twin names its surviving base via the keep-lowest-id "
        "rule. Assignment ties, survivor choice, and the 6-dp cosine "
        "are all mirrored by the oracle's ORDER BY / MIN / MIN_BY.",
)
def q212_semdedup_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import semantic_dedup_drop_list

    corpus = _planted_embedding_corpus(spark, sf_dir)
    seeds = [
        [float(x) for x in r[1]]
        for r in corpus.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    return semantic_dedup_drop_list(corpus, seeds, threshold=0.9)
