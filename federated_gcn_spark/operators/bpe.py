"""Distributed BPE (byte-pair-encoding) tokenizer-merge training.

The canonical subword-vocabulary learner (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") as a
Spark dataflow. The reference engine ships only a token-count heuristic
(preprocessor word splits); a training-data pipeline at 100 TB needs the
real thing: learn the merge table ON the corpus being packaged so token
budgets (chunking, packing, pricing) reflect the tokenizer that will be
trained on it.

Algorithm (word-level BPE):
1. Pre-tokenize: lowercase, split on whitespace → per-WORD frequency
   table. All subsequent passes run over the *distinct-word* table —
   corpus scale enters only through this first aggregate; iterations
   cost O(|vocab|), not O(corpus).
2. Each word becomes a symbol sequence: its characters plus an
   end-of-word marker. Representation: a string with symbols separated
   by TWO spaces and double-space padding at each end (symbols
   themselves never contain spaces).
3. Repeat n_merges times:
   a. count adjacent symbol pairs weighted by word frequency,
   b. take the globally most frequent pair (ties → lexicographically
      smallest (left, right) — deterministic across engines/layouts),
   c. merge every adjacent occurrence left-to-right non-overlapping.

The merge step is ONE string ``replace`` per iteration:
``replace(s, ' A  B ', ' AB ')``.  With double-space delimiters the
pattern's outer single spaces consume one space of each neighboring
gap, so consecutive occurrences still match on the scan's next step —
a single left-to-right REPLACE pass IS the greedy non-overlapping BPE
merge (a run ``A B A B`` → ``AB AB`` in one pass, and the freshly
merged ``AB`` can never re-match inside the same iteration because the
pattern requires the literal symbols ``A``,``B``).  Both Spark's
``replace`` and DuckDB's ``REPLACE`` scan left-to-right over
non-overlapping matches, which is what makes the unrolled-SQL oracle
replay exact.

Scale shape: the driver loop collects ONE row per iteration (the argmax
pair — same driver/dataflow split as operators/logistic.logistic_fit);
pair counting is explode → partial-final groupBy over the distinct-word
table; the merge is a codegen string expression. No Python in the row
path anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_WORD = "</w>"


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct lowercase words with corpus frequencies."""
    return (
        docs.where(F.trim(F.col(text_col)) != "")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word) -> "F.Column":
    """Double-space-delimited symbol string: chars + end-of-word marker.

    ``split(word, '')`` yields single characters (Spark drops the
    trailing empty split); the end marker rides as one extra symbol.
    """
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(
        F.lit("  "),
        F.array_join(chars, "  "),
        F.lit("  " + END_WORD + "  "),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol strings.

    Tokens are recovered by splitting on the double-space delimiter
    (trimming the padding first); pairs come from a codegen transform
    over index sequences — explode → map-side-combined groupBy.
    """
    toks = F.split(F.trim(F.col("s")), "  ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("left"),
            F.element_at(toks, i + 2).alias("right"),
        ),
    )
    # A fully-merged word is a single symbol: no pairs, and
    # sequence(0, -1) would DESCEND in Spark — filter it out first.
    return (
        syms.where(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def learn_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns the merge table as a list of dicts
    ``{rank, left, right, merged, cnt}`` in learned order — the
    artifact a tokenizer trainer persists. Deterministic: ties on the
    pair count break lexicographically on (left, right).
    """
    base = (
        _words(docs, text_col)
        .withColumn("s", _initial_symbols(F.col("word")))
        .select("freq", "s")
        .persist()
    )
    words = base
    try:
        merges: list[dict] = []
        for rank in range(1, n_merges + 1):
            best = (
                _pair_counts(words)
                .orderBy(F.col("cnt").desc(), "left", "right")
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
            merged = left + right
            merges.append(
                {
                    "rank": rank,
                    "left": left,
                    "right": right,
                    "merged": merged,
                    "cnt": int(cnt),
                }
            )
            words = words.withColumn(
                "s",
                F.replace(
                    F.col("s"),
                    F.lit(f" {left}  {right} "),
                    F.lit(f" {merged} "),
                ),
            )
        return merges
    finally:
        base.unpersist()


def learn_bpe_df(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """``learn_bpe`` as a DataFrame (rank, left, right, merged, cnt)."""
    spark = docs.sparkSession
    rows = learn_bpe(docs, text_col=text_col, n_merges=n_merges)
    return spark.createDataFrame(
        [(r["rank"], r["left"], r["right"], r["merged"], r["cnt"]) for r in rows],
        "rank INT, left STRING, right STRING, merged STRING, cnt BIGINT",
    )


def segment_words(
    words: DataFrame,
    merges: list[dict],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge table to segment words into subword tokens.

    Adds ``subtokens: array<string>`` — the BPE segmentation of each
    word under the merge table (merges applied in learned order, each
    as the same greedy one-pass replace used during training). Pure
    codegen string expressions; usable corpus-wide via a join or
    directly on a token stream.
    """
    s = _initial_symbols(F.col(word_col))
    for m in merges:
        s = F.replace(
            s,
            F.lit(f" {m['left']}  {m['right']} "),
            F.lit(f" {m['merged']} "),
        )
    return words.withColumn("subtokens", F.split(F.trim(s), "  "))
