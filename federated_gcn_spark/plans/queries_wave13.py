"""Round-4 wave 13: embedding compression fidelity, corpus quality
rules, and sequential testing — LLM-data-pipeline operators.

- ``embedding_int8_quant_report``: per-label reconstruction error of
  symmetric int8 quantization (scale = max|x|/127) — the fidelity
  audit run before shipping quantized vectors to an ANN index.
- ``embedding_truncation_fidelity``: cosine fidelity of truncating
  embeddings to their first 32 of 64 dims (the Matryoshka/MRL
  truncation question): since the truncated vector is a prefix,
  cos(full, trunc) = ||x_1..32|| / ||x||, an energy ratio.
- ``gopher_quality_rules``: Gopher-style document quality rules
  (token count, mean token length, alphabetic ratio, top-token
  dominance) with per-rule and all-rules pass counts — the standard
  pretraining corpus filter battery.
- ``sprt_conversion_monitor``: Wald's sequential probability ratio
  test on the purchase rate (H0 p=0.18 vs H1 p=0.22, alpha=beta=0.05)
  over the daily event stream — the earliest-decision monitor that
  inspired modern always-valid A/B inference.

Cross-engine determinism: int8 codes, rule tallies and SPRT counts
are exact integers; per-vector float metrics are sequential 64-step
folds (identical order both engines, the embedding_norms precedent),
rounded to 9 dp and summed as DECIMAL; SPRT log-likelihood constants
are 12-dp literals CAST to DOUBLE in both engines, so the cumulative
LLR is a fixed expression of exact integer counts.

Reference anchor: SURVEY.md §2.10-2.11 (embedding pipeline +
curation operators; the reference's embedding sink at
distributed_nograd.py:19-34 is what a quantization audit would gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import _event_epoch_sec, register


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum over an array<double> — same element
    order as DuckDB's list_sum, so the float result is bit-identical."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


# ---------------------------------------------------------------------------
# Symmetric int8 quantization fidelity
# ---------------------------------------------------------------------------

@register(
    "embedding_int8_quant_report",
    """
    WITH v AS (
        SELECT label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               list_max(list_transform(embedding,
                        x -> ABS(CAST(x AS DOUBLE)))) / 127 AS scale
        FROM embeddings
    ), q AS (
        SELECT label, e, scale,
               list_transform(e, x -> ROUND(x / scale) * scale) AS r
        FROM v WHERE scale > 0
    ), m AS (
        SELECT label,
               list_sum(list_transform(list_zip(e, r),
                        p -> (p[1] - p[2]) * (p[1] - p[2])))
                   / 64 AS mse,
               list_sum(list_transform(list_zip(e, r),
                        p -> p[1] * p[2]))
                   / (SQRT(list_sum(list_transform(e, x -> x * x)))
                      * SQRT(list_sum(list_transform(r, x -> x * x))))
                   AS cos
        FROM q
    ), t AS (
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CAST(ROUND(mse, 12) AS DECIMAL(24,12))) AS DOUBLE)
                   AS mse_sum,
               CAST(SUM(CAST(ROUND(cos, 12) AS DECIMAL(24,12))) AS DOUBLE)
                   AS cos_sum
        FROM m GROUP BY label
    )
    SELECT label, n_vecs,
           ROUND(mse_sum / CAST(n_vecs AS DOUBLE), 12) AS avg_mse,
           ROUND(cos_sum / CAST(n_vecs AS DOUBLE), 8) AS avg_cos
    FROM t ORDER BY label
    """,
)
def embedding_int8_quant_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label fidelity of symmetric int8 quantization: each vector
    is coded as round(x / (max|x|/127)) and reconstructed; the report
    gives mean squared error and mean cosine between original and
    reconstruction — the go/no-go audit before serving a quantized
    ANN index (4x memory cut).

    100 TB shape: embarrassingly parallel per-vector folds fused into
    the scan (no shuffle until the tiny per-label tally); the Arrow
    boundary never ships vectors anywhere.  Determinism: folds are
    sequential 64-step sums (identical order both engines); per-vector
    metrics round to 12 dp into DECIMAL sums; two single divisions at
    emit."""
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    e = F.col("embedding").cast("array<double>")
    scale = (
        F.array_max(F.transform(e, lambda x: F.abs(x))) / 127
    )
    v = emb.select("label", e.alias("e"), scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    r = F.transform(
        F.col("e"), lambda x: F.round(x / F.col("scale")) * F.col("scale")
    )
    q = v.select("label", "e", r.alias("r"))
    diff_sq = F.zip_with(
        F.col("e"), F.col("r"), lambda a, b: (a - b) * (a - b)
    )
    dot = F.zip_with(F.col("e"), F.col("r"), lambda a, b: a * b)
    ne = F.sqrt(_fold_sum(F.transform(F.col("e"), lambda x: x * x)))
    nr = F.sqrt(_fold_sum(F.transform(F.col("r"), lambda x: x * x)))
    m = q.select(
        "label",
        (_fold_sum(diff_sq) / 64).alias("mse"),
        (_fold_sum(dot) / (ne * nr)).alias("cos"),
    )
    t = m.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.round(F.col("mse"), 12).cast("decimal(24,12)"))
        .cast("double")
        .alias("mse_sum"),
        F.sum(F.round(F.col("cos"), 12).cast("decimal(24,12)"))
        .cast("double")
        .alias("cos_sum"),
    )
    nd = F.col("n_vecs").cast("double")
    return t.select(
        "label",
        "n_vecs",
        F.round(F.col("mse_sum") / nd, 12).alias("avg_mse"),
        F.round(F.col("cos_sum") / nd, 8).alias("avg_cos"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# Matryoshka-style truncation fidelity
# ---------------------------------------------------------------------------

@register(
    "embedding_truncation_fidelity",
    """
    WITH v AS (
        SELECT label,
               list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS full_sq,
               list_sum(list_transform(embedding[1:32],
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS head_sq
        FROM embeddings
    ), m AS (
        SELECT label, SQRT(head_sq / full_sq) AS cos
        FROM v WHERE full_sq > 0
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(CAST(ROUND(cos, 12) AS DECIMAL(24,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 8) AS avg_cos,
           ROUND(MIN(cos), 8) AS min_cos,
           CAST(SUM(CASE WHEN cos >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ge_070
    FROM m GROUP BY label ORDER BY label
    """,
)
def embedding_truncation_fidelity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fidelity of truncating 64-dim embeddings to their first 32 dims
    (the Matryoshka question: can we serve half the vector?): because
    the candidate is a strict prefix, cos(full, truncated) reduces to
    the energy ratio ||x[:32]|| / ||x|| — reported per label as mean,
    min, and the count with cosine >= 0.7.

    100 TB shape: two fused per-vector folds in the scan, one tiny
    per-label tally; nothing corpus-sized ever shuffles.  Determinism:
    sequential folds (embedding_norms precedent), 12-dp DECIMAL sums,
    single divisions; the 0.7-threshold count is exact."""
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    e = F.col("embedding").cast("array<double>")
    full_sq = _fold_sum(F.transform(e, lambda x: x * x))
    head_sq = _fold_sum(
        F.transform(F.slice(e, 1, 32), lambda x: x * x)
    )
    v = emb.select(
        "label", full_sq.alias("full_sq"), head_sq.alias("head_sq")
    ).filter(F.col("full_sq") > 0)
    m = v.select(
        "label", F.sqrt(F.col("head_sq") / F.col("full_sq")).alias("cos")
    )
    return (
        m.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum(F.round(F.col("cos"), 12).cast("decimal(24,12)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                8,
            ).alias("avg_cos"),
            F.round(F.min("cos"), 8).alias("min_cos"),
            F.sum(F.when(F.col("cos") >= 0.7, 1).otherwise(0))
            .cast("long")
            .alias("n_ge_070"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Gopher-style corpus quality rule battery
# ---------------------------------------------------------------------------

@register(
    "gopher_quality_rules",
    """
    WITH base AS (
        SELECT doc_id,
               LENGTH(text) AS len,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tok,
               LENGTH(REPLACE(text, ' ', '')) AS len_nospace,
               LENGTH(REGEXP_REPLACE(text, '[a-z ]', '', 'g')) AS non_alpha
        FROM documents
    ), toks AS (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
              FROM documents) t
        GROUP BY doc_id, tok
    ), dom AS (
        SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot_c
        FROM toks GROUP BY doc_id
    ), flags AS (
        SELECT b.doc_id,
               CASE WHEN b.n_tok BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS r1,
               CASE WHEN 3 * b.n_tok <= b.len_nospace
                         AND b.len_nospace <= 10 * b.n_tok
                    THEN 1 ELSE 0 END AS r2,
               CASE WHEN 5 * b.non_alpha <= b.len THEN 1 ELSE 0 END AS r3,
               CASE WHEN 5 * d.top_c <= d.tot_c THEN 1 ELSE 0 END AS r4
        FROM base b JOIN dom d ON b.doc_id = d.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r1) AS BIGINT) AS pass_token_count,
           CAST(SUM(r2) AS BIGINT) AS pass_mean_token_len,
           CAST(SUM(r3) AS BIGINT) AS pass_alpha_ratio,
           CAST(SUM(r4) AS BIGINT) AS pass_top_token_share,
           CAST(SUM(r1 * r2 * r3 * r4) AS BIGINT) AS pass_all,
           ROUND(CAST(SUM(r1 * r2 * r3 * r4) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS pass_all_rate
    FROM flags
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style pretraining quality filter battery: R1 token count
    in [20, 100k], R2 mean token length in [3, 10] chars, R3 >= 80%
    alphabetic characters, R4 top token <= 20% of tokens — per-rule
    pass counts plus the all-rules survivor rate.

    100 TB shape: R1-R3 are pure string-length expressions fused into
    the scan; only R4 needs the (doc, token) aggregate — one shuffle,
    map-side combined, and its output is doc-sized, not token-sized.
    Determinism: every rule is an exact integer comparison
    (cross-multiplied, no ratio division); one single division at
    emit."""
    # the (id, text) projection feeds the string-rule battery and the
    # token aggregate; staged once -> one scan instead of two
    documents = (
        load_table(spark, sf_dir, "documents", parallel=True)
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    base = documents.select(
        "doc_id",
        F.length("text").alias("len"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("n_tok"),
        F.length(
            F.replace(F.col("text"), F.lit(" "), F.lit(""))
        ).alias("len_nospace"),
        F.length(
            F.regexp_replace(F.col("text"), "[a-z ]", "")
        ).alias("non_alpha"),
    )
    toks = (
        documents.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dom = toks.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("tot_c")
    )
    flags = base.join(dom, "doc_id").select(
        F.when(F.col("n_tok").between(20, 100000), 1).otherwise(0).alias("r1"),
        F.when(
            (3 * F.col("n_tok") <= F.col("len_nospace"))
            & (F.col("len_nospace") <= 10 * F.col("n_tok")),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(5 * F.col("non_alpha") <= F.col("len"), 1)
        .otherwise(0)
        .alias("r3"),
        F.when(5 * F.col("top_c") <= F.col("tot_c"), 1)
        .otherwise(0)
        .alias("r4"),
    )
    allr = F.col("r1") * F.col("r2") * F.col("r3") * F.col("r4")
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("r1").cast("long").alias("pass_token_count"),
        F.sum("r2").cast("long").alias("pass_mean_token_len"),
        F.sum("r3").cast("long").alias("pass_alpha_ratio"),
        F.sum("r4").cast("long").alias("pass_top_token_share"),
        F.sum(allr).cast("long").alias("pass_all"),
        F.round(
            F.sum(allr).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("pass_all_rate"),
    )


# ---------------------------------------------------------------------------
# Wald SPRT on the purchase rate over the daily event stream
# ---------------------------------------------------------------------------

_C1 = "CAST('0.200670695462' AS DOUBLE)"   # ln(0.22/0.18), 12 dp
_C0 = "CAST('-0.050010420575' AS DOUBLE)"  # ln(0.78/0.82), 12 dp
_LNA = "CAST('2.944438979166' AS DOUBLE)"  # ln(0.95/0.05)


@register(
    "sprt_conversion_monitor",
    f"""
    WITH ev AS (
        SELECT epoch_ns(ts) // 1000000000 // 86400 AS day,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
        FROM events
    ), daily AS (
        SELECT day,
               CAST(SUM(hit) AS BIGINT) AS hits,
               CAST(COUNT(*) AS BIGINT) AS total
        FROM ev GROUP BY day
    ), cum AS (
        SELECT day,
               SUM(hits) OVER w AS ch,
               SUM(total) OVER w AS ct
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), llr AS (
        SELECT day, ch, ct,
               CAST(ch AS DOUBLE) * {_C1}
                   + CAST(ct - ch AS DOUBLE) * {_C0} AS llr
        FROM cum
    ), marked AS (
        SELECT day, ch, ct, llr,
               CASE WHEN llr >= {_LNA} THEN 1
                    WHEN llr <= -{_LNA} THEN -1
                    ELSE 0 END AS verdict
        FROM llr
    ), first_cross AS (
        SELECT MIN(day) AS dday FROM marked WHERE verdict <> 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(m.ct) AS BIGINT) AS n_events,
           CAST(COALESCE(ANY_VALUE(f.dday), -1) AS BIGINT) AS decision_day,
           CAST(COALESCE(MAX(CASE WHEN m.day = f.dday THEN m.verdict END), 0)
                AS BIGINT) AS decision,
           ROUND(MAX_BY(m.llr, m.day), 6) AS final_llr
    FROM marked m CROSS JOIN first_cross f
    """,
)
def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test on the purchase rate:
    H0 p=0.18 vs H1 p=0.22 at alpha=beta=0.05, LLR accumulated over
    the daily event totals; decision = +1 (accept H1) when LLR >=
    ln(19), -1 when <= -ln(19), else 0 (keep sampling) — the
    earliest-stopping monitor behind always-valid A/B testing.

    100 TB shape: the stream collapses to one daily (hits, total)
    aggregate; the cumulative scan runs over the calendar-bounded
    series.  Determinism: LLR = ch*c1 + (ct-ch)*c0 with c1/c0 12-dp
    string literals CAST to DOUBLE in both engines — a fixed double
    expression of exact integer counts, so the threshold comparison
    cannot drift."""
    events = load_table(spark, sf_dir, "events", parallel=True)
    sec = _event_epoch_sec(events)
    # integer floor: sec/86400 via double could drift — use floor div
    ev = events.select(
        F.floor(sec / 86400).cast("long").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("hit"),
    )
    daily = ev.groupBy("day").agg(
        F.sum("hit").cast("long").alias("hits"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("hits").over(w).alias("ch"),
        F.sum("total").over(w).alias("ct"),
    )
    c1 = F.lit("0.200670695462").cast("double")
    c0 = F.lit("-0.050010420575").cast("double")
    lna = F.lit("2.944438979166").cast("double")
    llr = cum.select(
        "day",
        "ch",
        "ct",
        (
            F.col("ch").cast("double") * c1
            + (F.col("ct") - F.col("ch")).cast("double") * c0
        ).alias("llr"),
    )
    marked = llr.select(
        "day",
        "ct",
        "llr",
        F.when(F.col("llr") >= lna, 1)
        .when(F.col("llr") <= -lna, -1)
        .otherwise(0)
        .alias("verdict"),
        # marked feeds both the first-crossing probe and the emit;
        # staged once -> one daily aggregate + window instead of two
    ).localCheckpoint(eager=False)
    first_cross = marked.filter(F.col("verdict") != 0).agg(
        F.min("day").alias("dday")
    )
    out = marked.crossJoin(first_cross)
    return out.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("ct").cast("long").alias("n_events"),
        F.coalesce(F.any_value(F.col("dday")), F.lit(-1))
        .cast("long")
        .alias("decision_day"),
        F.coalesce(
            F.max(
                F.when(F.col("day") == F.col("dday"), F.col("verdict"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("decision"),
        F.round(F.max_by(F.col("llr"), F.col("day")), 6).alias("final_llr"),
    )
