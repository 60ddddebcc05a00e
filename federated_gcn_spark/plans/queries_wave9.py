"""Round-4 wave 9: session-window analytics and community quality.

- ``session_window_stats``: corpus-wide session metrics (count, bounce
  rate, mean length/duration) computed with Spark's BUILT-IN
  ``session_window`` aggregation — while the DuckDB oracle spells the
  same sessions as a gaps-and-islands window.  Two INDEPENDENT
  sessionization spellings agreeing is the strongest form of the
  check (the scd2_point_in_time_join pattern), and it pins the exact
  boundary semantics of session_window (a gap of exactly the timeout
  MERGES — touching windows coalesce; verified empirically at sf0.01,
  where exact-gap ties exist).
- ``community_conductance``: per-community conductance
  cut(S) / min(vol(S), 2m - vol(S)) for the ten largest LPA
  communities — the cut-quality complement to ``community_modularity``
  (low conductance = well-separated community).  Embeds the unrolled
  deterministic-LPA oracle.

Cross-engine determinism: session flags, bounce counts, cut and volume
are exact integers; the emitted rates are single divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Built-in session_window vs gaps-and-islands oracle
# ---------------------------------------------------------------------------

@register(
    "session_window_stats",
    """
    WITH t AS (
        SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec
        FROM events
    ), flagged AS (
        SELECT user_id, sec,
               CASE WHEN LAG(sec) OVER w IS NULL
                         OR sec - LAG(sec) OVER w > 600
                    THEN 1 ELSE 0 END AS new_sess
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), ids AS (
        SELECT user_id, sec,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM flagged
    ), per AS (
        SELECT user_id, sid,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(sec) - MIN(sec) AS BIGINT) AS dur
        FROM ids GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS bounce_rate,
           CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_events,
           CAST(SUM(dur) AS DOUBLE) / COUNT(*) AS mean_duration_sec
    FROM per
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session metrics (10-minute inactivity gap): session count,
    bounce rate (single-event sessions), mean events per session, mean
    duration — the product-analytics overview row.  Spark uses the
    BUILT-IN ``session_window`` aggregation (the declarative form whose
    state management Structured Streaming reuses); the oracle spells
    the SAME sessions independently as a lag-flag + running-sum
    gaps-and-islands — agreement pins session_window's inclusive
    boundary (a gap of exactly the timeout still MERGES — touching
    windows coalesce; only a strictly larger gap opens a session).

    100 TB shape: session_window is ONE user-keyed aggregate (Catalyst
    merges overlapping windows inside the aggregation — no window sort,
    no self-join); the rollup is a singleton reduce.  Note the window
    flag rides on integer epoch seconds, so ordering ties are
    impossible to mis-break."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events", parallel=True)
    t = events.select(
        "user_id", _event_epoch_sec(events).alias("sec")
    )
    per = (
        t.groupBy(
            "user_id",
            F.session_window(F.timestamp_seconds("sec"), "600 seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("sec") - F.min("sec")).cast("long").alias("dur"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounce"),
        (
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("bounce_rate"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "mean_events"
        ),
        (F.sum("dur").cast("double") / F.count(F.lit(1))).alias(
            "mean_duration_sec"
        ),
    )


# ---------------------------------------------------------------------------
# Community conductance
# ---------------------------------------------------------------------------

def _conductance_oracle(rounds: int = 5, top: int = 10) -> str:
    """Unrolled-LPA labels (same chain as label_communities /
    community_modularity) + per-community conductance over the ten
    largest communities."""
    from federated_gcn_spark.plans.queries import _labelprop_oracle

    base = _labelprop_oracle(rounds=rounds)
    # _labelprop_oracle ends with the size-distribution SELECT; cut at
    # the ", sizes AS (" marker and keep the CTE chain through r{rounds}.
    marker = ", sizes AS ("
    prefix = base[: base.index(marker)]
    return f"""{prefix}, lab AS (
        SELECT id, label FROM r{rounds}
    ), mm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM ed
    ), deg AS (
        SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src
    ), vols AS (
        SELECT l.label, CAST(COUNT(*) AS BIGINT) AS size,
               CAST(SUM(deg.d) AS BIGINT) AS vol
        FROM lab l JOIN deg ON deg.id = l.id GROUP BY l.label
    ), cuts AS (
        SELECT la.label, CAST(COUNT(*) AS BIGINT) AS cut_half
        FROM sym s
        JOIN lab la ON la.id = s.src
        JOIN lab lb ON lb.id = s.dst
        WHERE la.label <> lb.label
        GROUP BY la.label
    ), top10 AS (
        SELECT v.label, v.size, v.vol,
               COALESCE(c.cut_half, 0) AS cut_edges
        FROM vols v LEFT JOIN cuts c ON c.label = v.label
        ORDER BY v.size DESC, v.label LIMIT {top}
    )
    SELECT t.label, t.size, t.vol AS volume, t.cut_edges,
           CAST(t.cut_edges AS DOUBLE)
               / LEAST(t.vol, 2 * mm.m_edges - t.vol) AS conductance
    FROM top10 t, mm
    """


@register("community_conductance", _conductance_oracle())
def community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conductance of the ten largest deterministic-LPA communities:
    phi(S) = cut(S) / min(vol(S), 2m - vol(S)) — the cut-quality score
    (low = well-separated) completing the community-quality trio with
    size (``label_communities``) and modularity
    (``community_modularity``).  Note cut(S) counts each boundary edge
    once per direction in the symmetrized list, i.e. it equals the
    directed boundary count — the standard volume-normalized form.

    100 TB shape: degrees, volumes, and cuts are id-keyed joins +
    groupBys over the linear (symmetrized) edge list; the top-10
    selection is a constant-k TakeOrdered on the community table.
    Integer moments, one guarded division."""
    from federated_gcn_spark.graph import Graph
    from federated_gcn_spark.graph.labelprop import label_propagation

    lineitem = load_table(spark, sf_dir, "lineitem")
    ed = (
        lineitem.where(F.col("l_orderkey") % 20 == 0)
        .select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_suppkey") + 10_000_000).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = ed.union(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    lab = label_propagation(Graph.from_edges(ed), max_iterations=5)
    mm = ed.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    vols = (
        lab.join(deg, "id")
        .groupBy(F.col("community").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.sum("d").cast("long").alias("vol"),
        )
    )
    la = lab.select(F.col("id").alias("src"), F.col("community").alias("cla"))
    lb = lab.select(F.col("id").alias("dst"), F.col("community").alias("clb"))
    cuts = (
        sym.join(la, "src")
        .join(lb, "dst")
        .where(F.col("cla") != F.col("clb"))
        .groupBy(F.col("cla").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("cut_half"))
    )
    top10 = (
        vols.join(cuts, "label", "left")
        .na.fill({"cut_half": 0})
        .orderBy(F.desc("size"), "label")
        .limit(10)
    )
    return top10.crossJoin(F.broadcast(mm)).select(
        "label", "size",
        F.col("vol").alias("volume"),
        F.col("cut_half").alias("cut_edges"),
        (
            F.col("cut_half").cast("double")
            / F.least(F.col("vol"), 2 * F.col("m_edges") - F.col("vol"))
        ).alias("conductance"),
    )
