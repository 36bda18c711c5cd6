"""End-to-end corpus curation: clean → dedup → quality-gate in ONE
declarative pass (SURVEY.md §2 Part B "LLM-data extensions", composed).

Instead of filtering stage by stage (each filter hiding what it dropped),
every document is annotated with its first-matching ``drop_reason``:

    NULL          survives curation
    'too_short'   fewer than ``min_tokens`` whitespace tokens after cleaning
    'low_quality' stopword ratio outside ``[min_stopword, max_stopword]``
    'exact_dup'   same cleaned text as a lower-id document
    'near_dup'    MinHash-estimated Jaccard >= ``near_threshold`` against a
                  lower-id exact-dedup survivor (greedy: the match itself
                  may also be near-dup-dropped)

so the curated set is ``drop_reason IS NULL`` and the funnel report is a
single groupBy — stats cost one scan, not one scan per stage. At 100 TB the
expensive stages (exact-dup groupBy, MinHash band join) shuffle only ids and
hashes, never the payload text; the text rides along in the final join by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cleaning import redact_pii, strip_html
from .dedup import exact_dedup_keepers, minhash_near_dup_pairs
from ..functions.text import stopword_ratio, token_count


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_stopword: float = 0.0,
    max_stopword: float = 1.0,
    near_threshold: float | None = 0.8,
    cache_cleaned: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Annotate every document with ``clean_text`` and ``drop_reason``
    (NULL = keep). Quality gates run before dedup so a near-dup of a
    rejected doc is charged to quality, not dedup; exact-dup beats
    near-dup so the reasons are deterministic.

    ``near_threshold=None`` skips the MinHash near-dup stage entirely —
    the deterministic prefix of the funnel (clean → quality → exact dup),
    cheap enough to run on every ingest batch and exactly reproducible on
    any engine (the driver hash-checks it via q132 against a DuckDB twin).

    The cleaned+gated frame feeds FOUR downstream branches (exact dedup,
    band join, and the two final joins); without materialization Spark
    re-runs the HTML/PII regex chain once per branch (~2.6x wall on the
    bench corpus). Two materialization postures:

    - ``cache_cleaned`` (default): executor-memory persist — right for a
      single-session run that fits the cluster's storage fraction. The
      persist is intentionally NOT unpersisted here (the returned frame is
      lazy; downstream branches haven't run yet), so it lives until the
      session ends or the caller unpersists — callers composing many
      curations in one session should pass ``cache_cleaned=False`` when
      the funnel is cheap (e.g. the ``near_threshold=None`` prefix has
      only two downstream branches).
    - ``checkpoint_dir``: write the cleaned stage to parquet and read it
      back — the 100 TB posture. The lake checkpoint survives executor
      loss, frees memory for the band join's shuffle, and severs the
      lineage so the regex chain provably runs in exactly ONE job (every
      downstream branch scans the checkpoint files, never the source).
      Takes precedence over ``cache_cleaned``."""
    cleaned = docs.select(
        F.col(id_col).alias("id"),
        redact_pii(strip_html(F.col(text_col))).alias("clean_text"),
    )

    sw = stopword_ratio("clean_text")
    quality = cleaned.select(
        "id",
        "clean_text",
        F.when(token_count("clean_text") < min_tokens, F.lit("too_short"))
        .when((sw < min_stopword) | (sw > max_stopword), F.lit("low_quality"))
        .alias("q_reason"),
    )
    if checkpoint_dir is not None:
        path = checkpoint_dir.rstrip("/") + "/curation_cleaned"
        quality.write.mode("overwrite").parquet(path)
        quality = docs.sparkSession.read.parquet(path)
    elif cache_cleaned:
        quality = quality.persist()
    passing = quality.filter(F.col("q_reason").isNull()).select("id", "clean_text")

    # exact dup: every passing doc that is NOT its sha-group's keeper
    keepers = exact_dedup_keepers(passing, "id", "clean_text").select(
        F.col("id").alias("keep_id")
    )
    exact_kept = passing.join(
        keepers, passing["id"] == keepers["keep_id"], "left_semi"
    )

    reason = (
        F.when(F.col("q_reason").isNotNull(), F.col("q_reason"))
        .when(F.col("keep_id").isNull(), F.lit("exact_dup"))
    )
    annotated = quality.join(keepers, quality["id"] == keepers["keep_id"], "left")

    if near_threshold is not None:
        # near dup among exact-survivors: drop the higher id of each pair
        pairs = minhash_near_dup_pairs(
            exact_kept, "id", "clean_text", threshold=near_threshold
        )
        near_drops = pairs.select(F.col("id_b").alias("nd_id")).distinct()
        annotated = annotated.join(
            near_drops, annotated["id"] == near_drops["nd_id"], "left"
        )
        reason = reason.when(F.col("nd_id").isNotNull(), F.lit("near_dup"))

    return annotated.select(
        F.col("id").alias(id_col),
        "clean_text",
        reason.alias("drop_reason"),
    )


def curation_report(annotated: DataFrame) -> DataFrame:
    """Funnel counts by drop reason ('kept' for survivors) — one groupBy."""
    return (
        annotated.groupBy(
            F.coalesce("drop_reason", F.lit("kept")).alias("stage")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-split
    primitive of a training pipeline.  Each row's split is a pure
    function of ``md5(salt || key)``: stable across runs, sessions,
    cluster sizes and row order (``randomSplit`` is none of those), so
    a document keeps its split when the corpus is re-curated and
    leakage across splits is structurally impossible for a given key.
    Changing ``salt`` draws a fresh independent assignment.

    Sibling surfaces, deliberately distinct: ``functions/text.py::
    hash_bucket`` quantizes to N integer buckets (modulo — callers
    build their own CASE), ``operators/sampling.py::
    leakage_safe_split`` decides WHO must share a split (the exact-
    dedup group's canonical key feeds the hash).  This function is the
    FRACTION surface — named splits from a fraction dict with no
    100-bucket quantization, plus the salt.  Compose them: pass a
    canonical/group id as ``key_col`` to get leakage-safety with
    arbitrary fractions.

    Mechanics: the first 8 hex digits of the md5 partition [0, 16^8)
    uniformly; cumulative fractions become fixed hex thresholds and the
    assignment is a lexicographic CASE over them — one map-side
    expression, no shuffle, no UDF, and mirrorable in any engine with
    md5() (the oracle runs the identical CASE).  Fractions must sum to
    1 (±1e-9); the last named split absorbs the hex tail so rounding
    never orphans a row."""
    from pyspark.sql import functions as F

    fr = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})
    if not fr or abs(sum(fr.values()) - 1.0) > 1e-9:
        raise ValueError(f"hash_split: fractions must sum to 1, got {fr}")
    h = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )
    names = list(fr)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fr[name]
        ival = int(cum * 16**8)
        if ival >= 16**8:
            # trailing zero fractions: the cumulative threshold reaches
            # the full range, and format() would emit the 9-char
            # '100000000' whose LEXICOGRAPHIC compare misroutes every
            # hash starting a-f — this split simply takes everything
            # left
            cond = F.lit(True)
        else:
            cond = h < F.lit(format(ival, "08x"))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out_col, expr)
