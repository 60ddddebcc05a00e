"""Round-4 wave 33: Markov-chain analytics on the event stream — the
behavioral-model layer over event_transition_matrix.

- ``markov_stationary_distribution``: the stationary distribution of
  the event-type transition chain via 12 unrolled power-iteration
  steps from uniform (plus the last-step total-variation delta as the
  convergence certificate) — where does a user's session spend its
  time in the long run?
- ``markov_absorption_probabilities``: make 'purchase' and 'error'
  absorbing; the probability of absorbing in each, per transient
  start state, via a 20-term Neumann series B = sum Q^k R — the
  funnel-outcome model (conversion vs failure odds from every state).
- ``markov_entropy_rate``: per-state row entropy and the chain's
  entropy rate H = -sum_i pi_i sum_j P_ij log2 P_ij — how predictable
  is the next event?
- ``markov_mixing_curve``: total-variation distance to the stationary
  distribution after t = 1..8 steps starting from 'signup' — the
  mixing-time profile.

All four share one machinery: the 5-state transition matrix is a
bounded table (event-type vocabulary), every iteration is a 5x5
join-agg, and every per-term product rounds to 12 dp into exact
DECIMAL sums — so the unrolled DuckDB oracles replay the distributed
supersteps bit-for-bit.  Output is DEFINED as the fixed-step iterate
(truncation is part of the contract), so convergence speed cannot
cause cross-engine drift.

100 TB shape: the event stream reduces ONCE to the per-user LEAD
sequence shuffle (the event_transition_matrix shape); everything
after runs on a vocabulary-bounded matrix.

Reference anchor: SURVEY.md §2.8 streaming/events analytics; extends
event_transition_matrix (queries_wave3), funnel_conversion,
event_path_trigrams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import _event_epoch_sec, register

_STAT_STEPS = 12
_ABS_TERMS = 20
_MIX_STEPS = 8
_ABSORBING = ("error", "purchase")

_TRANS_SQL = """
    e AS (
        SELECT user_id, event_id, event_type,
               (epoch_ns(ts) // 1000000000) AS sec
        FROM events
    ), seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
               ) AS to_type
        FROM e
    ) , pairs AS MATERIALIZED (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ), tot AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        FROM pairs GROUP BY from_type
    ), p AS MATERIALIZED (
        SELECT p.from_type, p.to_type,
               CAST(p.n AS DOUBLE) / t.n_from AS prob
        FROM pairs p JOIN tot t USING (from_type)
    ), states AS MATERIALIZED (
        SELECT from_type AS s FROM tot
    )
"""


def _transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, prob) — bounded transition matrix,
    materialized once (the event_transition_matrix reduction)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events", parallel=True)
    e = events.select(
        "user_id", "event_id", "event_type",
        _event_epoch_sec(events).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    return (
        pairs.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            (F.col("n").cast("double") / F.col("n_from")).alias("prob"),
        )
        .localCheckpoint(eager=True)
    )


def _step_col(pi_col, prob_col):
    """one power-iteration term, 12-dp-rounded for exact summation."""
    return F.round(pi_col * prob_col, 12).cast("decimal(24,12)")


def _iterate_pi(spark, trans: DataFrame, pi: DataFrame, steps: int):
    """pi_{t+1}(j) = sum_i pi_t(i) P(i,j), terms rounded to 12 dp."""
    from federated_gcn_spark.barrier import iteration_barrier

    for _ in range(steps):
        pi = (
            trans.join(pi, trans.from_type == pi.s)
            .groupBy(F.col("to_type").alias("s2"))
            .agg(
                F.sum(_step_col(F.col("pi"), F.col("prob")))
                .cast("double")
                .alias("pi")
            )
            .select(F.col("s2").alias("s"), "pi")
        )
        pi = iteration_barrier(pi)
    return pi


def _stationary_oracle(steps: int) -> str:
    parts = [
        f"""
    WITH {_TRANS_SQL},
    pi0 AS (
        SELECT s, 1.0 / (SELECT COUNT(*) FROM states) AS pi FROM states
    )"""
    ]
    for t in range(1, steps + 1):
        parts.append(
            f""", pi{t} AS MATERIALIZED (
        SELECT p.to_type AS s,
               CAST(SUM(CAST(ROUND(x.pi * p.prob, 12) AS DECIMAL(24,12)))
                    AS DOUBLE) AS pi
        FROM pi{t - 1} x JOIN p ON p.from_type = x.s
        GROUP BY p.to_type
    )"""
        )
    parts.append(
        f"""
    SELECT a.s AS event_type,
           ROUND(a.pi, 9) AS stationary_prob,
           ROUND(ABS(a.pi - b.pi), 9) AS last_step_delta
    FROM pi{steps} a JOIN pi{steps - 1} b ON b.s = a.s
    ORDER BY event_type
    """
    )
    return "".join(parts)


@register("markov_stationary_distribution", _stationary_oracle(_STAT_STEPS))
def markov_stationary_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — 12
    power-iteration steps from uniform over the bounded transition
    matrix, with |pi_12 - pi_11| per state as the convergence
    certificate.  The long-run session-attention profile behind any
    'which surface do users end up on?' question.

    100 TB shape: the event stream reduces once to the per-user LEAD
    shuffle; all 12 supersteps run on the vocabulary-bounded matrix.
    Determinism: each term rounds to 12 dp into exact DECIMAL sums
    (float-sum order never matters); the oracle replays every
    superstep."""
    trans = _transitions(spark, sf_dir)
    states = trans.select(F.col("from_type").alias("s")).distinct()
    nstates = states.agg(F.count(F.lit(1)).alias("k"))
    pi = states.crossJoin(F.broadcast(nstates)).select(
        "s", (F.lit(1.0) / F.col("k")).alias("pi")
    )
    prev = _iterate_pi(spark, trans, pi, _STAT_STEPS - 1)
    last = _iterate_pi(spark, trans, prev, 1)
    return (
        last.alias("a")
        .join(F.broadcast(prev.alias("b")), F.col("a.s") == F.col("b.s"))
        .select(
            F.col("a.s").alias("event_type"),
            F.round(F.col("a.pi"), 9).alias("stationary_prob"),
            F.round(F.abs(F.col("a.pi") - F.col("b.pi")), 9).alias(
                "last_step_delta"
            ),
        )
        .orderBy("event_type")
    )


def _absorption_oracle(terms: int) -> str:
    a0, a1 = _ABSORBING
    parts = [
        f"""
    WITH {_TRANS_SQL},
    q AS MATERIALIZED (
        SELECT from_type, to_type, prob FROM p
        WHERE from_type NOT IN ('{a0}', '{a1}')
          AND to_type NOT IN ('{a0}', '{a1}')
    ), r AS MATERIALIZED (
        SELECT from_type, to_type, prob FROM p
        WHERE from_type NOT IN ('{a0}', '{a1}')
          AND to_type IN ('{a0}', '{a1}')
    ), bb0 AS (
        SELECT from_type AS s, to_type AS a, prob AS b FROM r
    )"""
    ]
    for t in range(1, terms + 1):
        parts.append(
            f""", b{t} AS MATERIALIZED (
        SELECT r.from_type AS s, r.to_type AS a, r.prob AS b
        FROM r
        UNION ALL
        SELECT q.from_type AS s, x.a,
               CAST(SUM(CAST(ROUND(q.prob * x.b, 12) AS DECIMAL(24,12)))
                    AS DOUBLE) AS b
        FROM q JOIN bb{t - 1} x ON x.s = q.to_type
        GROUP BY q.from_type, x.a
    ), bb{t} AS MATERIALIZED (
        SELECT s, a, CAST(SUM(CAST(ROUND(b, 12) AS DECIMAL(24,12)))
                          AS DOUBLE) AS b
        FROM b{t} GROUP BY s, a
    )"""
        )
    parts.append(
        f"""
    SELECT s AS start_state,
           ROUND(MAX(CASE WHEN a = '{a1}' THEN b END), 6) AS p_purchase,
           ROUND(MAX(CASE WHEN a = '{a0}' THEN b END), 6) AS p_error,
           ROUND(MAX(CASE WHEN a = '{a1}' THEN b END)
                 + MAX(CASE WHEN a = '{a0}' THEN b END), 6) AS p_total
    FROM bb{terms} GROUP BY s ORDER BY start_state
    """
    )
    return "".join(parts)


@register("markov_absorption_probabilities", _absorption_oracle(_ABS_TERMS))
def markov_absorption_probabilities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Funnel-outcome model: with 'purchase' and 'error' absorbing,
    the probability of eventually absorbing in each, per transient
    start state — B = (I-Q)^(-1) R computed as the 20-term Neumann
    series B_t = R + Q B_{t-1} (truncation is part of the contract;
    p_total < 1 exposes the truncated tail).

    100 TB shape: everything after the one LEAD shuffle is a bounded
    matrix recursion.  Determinism: 12-dp-rounded DECIMAL sums per
    term; the oracle replays all 20 unrolled steps."""
    from federated_gcn_spark.barrier import iteration_barrier

    trans = _transitions(spark, sf_dir)
    a0, a1 = _ABSORBING
    absorbing = list(_ABSORBING)
    q = trans.where(
        ~F.col("from_type").isin(absorbing) & ~F.col("to_type").isin(absorbing)
    ).localCheckpoint(eager=True)
    r = trans.where(
        ~F.col("from_type").isin(absorbing) & F.col("to_type").isin(absorbing)
    ).localCheckpoint(eager=True)
    b = r.select(
        F.col("from_type").alias("s"),
        F.col("to_type").alias("a"),
        F.col("prob").alias("b"),
    )
    for _ in range(_ABS_TERMS):
        stepped = (
            q.join(b, b.s == q.to_type)
            .groupBy(F.col("from_type").alias("s2"), "a")
            .agg(
                F.sum(_step_col(F.col("prob"), F.col("b")))
                .cast("double")
                .alias("b")
            )
            .select(F.col("s2").alias("s"), "a", "b")
        )
        b = (
            r.select(
                F.col("from_type").alias("s"),
                F.col("to_type").alias("a"),
                F.col("prob").alias("b"),
            )
            .unionByName(stepped)
            .groupBy("s", "a")
            .agg(
                F.sum(F.round(F.col("b"), 12).cast("decimal(24,12)"))
                .cast("double")
                .alias("b")
            )
        )
        b = iteration_barrier(b)
    return (
        b.groupBy(F.col("s").alias("start_state"))
        .agg(
            F.round(F.max(F.when(F.col("a") == a1, F.col("b"))), 6).alias(
                "p_purchase"
            ),
            F.round(F.max(F.when(F.col("a") == a0, F.col("b"))), 6).alias(
                "p_error"
            ),
            F.round(
                F.max(F.when(F.col("a") == a1, F.col("b")))
                + F.max(F.when(F.col("a") == a0, F.col("b"))),
                6,
            ).alias("p_total"),
        )
        .orderBy("start_state")
    )


@register(
    "markov_entropy_rate",
    _stationary_oracle(_STAT_STEPS).replace(
        f"""
    SELECT a.s AS event_type,
           ROUND(a.pi, 9) AS stationary_prob,
           ROUND(ABS(a.pi - b.pi), 9) AS last_step_delta
    FROM pi{_STAT_STEPS} a JOIN pi{_STAT_STEPS - 1} b ON b.s = a.s
    ORDER BY event_type
    """,
        f""", rowent AS (
        SELECT from_type AS s,
               CAST(SUM(CAST(ROUND(-prob * LN(prob) / LN(2), 12)
                             AS DECIMAL(24,12))) AS DOUBLE) AS h_row
        FROM p GROUP BY from_type
    )
    SELECT r.s AS event_type,
           ROUND(a.pi, 9) AS stationary_prob,
           ROUND(r.h_row, 6) AS row_entropy_bits,
           ROUND(CAST(ROUND(a.pi * r.h_row, 12) AS DOUBLE), 6)
               AS contribution_bits
    FROM rowent r JOIN pi{_STAT_STEPS} a ON a.s = r.s
    ORDER BY event_type
    """,
    ),
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate decomposition of the event chain: per-state
    next-event entropy (bits) and its stationary-weighted contribution
    — sum(contribution_bits) is the chain's entropy rate, the
    'how predictable is the next event?' number that caps any
    next-action model's accuracy.

    Shares the stationary machinery (12 rounded-decimal supersteps);
    row entropies are per-BUCKET transcendentals rounded to 12 dp."""
    trans = _transitions(spark, sf_dir)
    states = trans.select(F.col("from_type").alias("s")).distinct()
    nstates = states.agg(F.count(F.lit(1)).alias("k"))
    pi = states.crossJoin(F.broadcast(nstates)).select(
        "s", (F.lit(1.0) / F.col("k")).alias("pi")
    )
    pi = _iterate_pi(spark, trans, pi, _STAT_STEPS)
    ln2 = 0.6931471805599453
    rowent = trans.groupBy(F.col("from_type").alias("s")).agg(
        F.sum(
            F.round(
                -F.col("prob") * F.log(F.col("prob")) / F.lit(ln2), 12
            ).cast("decimal(24,12)")
        )
        .cast("double")
        .alias("h_row")
    )
    return (
        rowent.join(pi, "s")
        .select(
            F.col("s").alias("event_type"),
            F.round(F.col("pi"), 9).alias("stationary_prob"),
            F.round(F.col("h_row"), 6).alias("row_entropy_bits"),
            F.round(
                F.round(F.col("pi") * F.col("h_row"), 12).cast("double"), 6
            ).alias("contribution_bits"),
        )
        .orderBy("event_type")
    )


def _mixing_oracle(steps: int, stat_steps: int) -> str:
    parts = [
        f"""
    WITH {_TRANS_SQL},
    pi0 AS (
        SELECT s, 1.0 / (SELECT COUNT(*) FROM states) AS pi FROM states
    )"""
    ]
    for t in range(1, stat_steps + 1):
        parts.append(
            f""", pi{t} AS MATERIALIZED (
        SELECT p.to_type AS s,
               CAST(SUM(CAST(ROUND(x.pi * p.prob, 12) AS DECIMAL(24,12)))
                    AS DOUBLE) AS pi
        FROM pi{t - 1} x JOIN p ON p.from_type = x.s
        GROUP BY p.to_type
    )"""
        )
    parts.append(
        """, m0 AS (
        SELECT s, CASE WHEN s = 'signup' THEN 1.0 ELSE 0.0 END AS pi
        FROM states
    )"""
    )
    for t in range(1, steps + 1):
        parts.append(
            f""", m{t} AS MATERIALIZED (
        SELECT p.to_type AS s,
               CAST(SUM(CAST(ROUND(x.pi * p.prob, 12) AS DECIMAL(24,12)))
                    AS DOUBLE) AS pi
        FROM m{t - 1} x JOIN p ON p.from_type = x.s
        GROUP BY p.to_type
    )"""
        )
    tv = "\n    UNION ALL ".join(
        f"""SELECT {t} AS step,
               ROUND(0.5 * SUM(CAST(ROUND(ABS(m.pi - st.pi), 12)
                                    AS DECIMAL(24,12))), 9) AS tv_distance
        FROM m{t} m JOIN pi{stat_steps} st ON st.s = m.s"""
        for t in range(1, steps + 1)
    )
    parts.append(
        f"""
    SELECT CAST(step AS BIGINT) AS step, CAST(tv_distance AS DOUBLE)
               AS tv_distance
    FROM ({tv}) ORDER BY step
    """
    )
    return "".join(parts)


@register("markov_mixing_curve", _mixing_oracle(_MIX_STEPS, _STAT_STEPS))
def markov_mixing_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing profile of the event chain: total-variation distance to
    the (12-step) stationary distribution after t = 1..8 steps from a
    point mass at 'signup' — how many events until a new user's
    behavior is indistinguishable from the steady state?

    Shares the stationary machinery; each curve point is a bounded
    5-term TV sum of 12-dp-rounded DECIMALs."""
    trans = _transitions(spark, sf_dir)
    states = trans.select(F.col("from_type").alias("s")).distinct()
    nstates = states.agg(F.count(F.lit(1)).alias("k"))
    pi = states.crossJoin(F.broadcast(nstates)).select(
        "s", (F.lit(1.0) / F.col("k")).alias("pi")
    )
    stat = _iterate_pi(spark, trans, pi, _STAT_STEPS).select(
        "s", F.col("pi").alias("pi_stat")
    )
    m = states.select(
        "s",
        F.when(F.col("s") == "signup", F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("pi"),
    )
    rows = None
    for t in range(1, _MIX_STEPS + 1):
        m = _iterate_pi(spark, trans, m, 1)
        tv = (
            m.join(F.broadcast(stat), "s")
            .agg(
                F.round(
                    0.5
                    * F.sum(
                        F.round(
                            F.abs(F.col("pi") - F.col("pi_stat")), 12
                        ).cast("decimal(24,12)")
                    ),
                    9,
                )
                .cast("double")
                .alias("tv_distance")
            )
            .select(F.lit(t).cast("long").alias("step"), "tv_distance")
        )
        rows = tv if rows is None else rows.unionByName(tv)
    return rows.orderBy("step")
