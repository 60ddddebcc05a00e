"""BPE merge learning: parity with a reference implementation and the
greedy-merge edge cases the one-pass REPLACE encoding must honor."""

from collections import Counter

from federated_gcn_spark.operators.bpe import (
    END_WORD,
    learn_bpe,
    segment_words,
)


def _reference_bpe(texts: list[str], n_merges: int) -> list[tuple]:
    """Sennrich-style word-level BPE, plain Python."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[w] += 1
    seqs = {w: [*w, END_WORD] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_learn_bpe_matches_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "that hat is flat",
        "the the the banana bandana",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    got = learn_bpe(docs, n_merges=6)
    want = _reference_bpe(texts, 6)
    assert [(m["left"], m["right"], m["merged"], m["cnt"]) for m in got] == want


def test_learn_bpe_greedy_on_repeated_symbols(spark):
    # 'aaaa' must merge left-to-right non-overlapping: (a,a) -> aa aa,
    # the case that breaks naive replace encodings.
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aa"), (1, "aaaa")], "doc_id long, text string"
    )
    got = learn_bpe(docs, n_merges=2)
    want = _reference_bpe(["aaaa aaaa aa", "aaaa"], 2)
    assert [(m["left"], m["right"], m["merged"], m["cnt"]) for m in got] == want


def test_segment_words_applies_merge_table(spark):
    texts = ["low lower lowest low low"]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    merges = learn_bpe(docs, n_merges=4)
    words = spark.createDataFrame([("low",), ("lowest",)], "word string")
    seg = {
        r["word"]: r["subtokens"]
        for r in segment_words(words, merges).collect()
    }
    # every word round-trips: concatenating subtokens restores word+</w>
    for w, toks in seg.items():
        assert "".join(toks) == w + END_WORD
    # 'low' appears 3x plus as prefix of lower/lowest -> its full form
    # must be learned within 4 merges and segment to a single token
    assert seg["low"] in ([f"low{END_WORD}"], ["low", END_WORD])
