"""Hypothesis property tests over the engine's pure kernels (SURVEY §5:
property-based coverage beside the example-based suites).  All
Spark-free, so the whole file runs in seconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from federated_gcn_spark.functions.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from federated_gcn_spark.operators.pack import _next_fit


@settings(max_examples=50, deadline=None)
@given(
    arrays(
        np.uint8,
        st.tuples(
            st.integers(1, 12), st.integers(1, 12), st.just(3)
        ),
    )
)
def test_bmp_roundtrip_property(px):
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=50, deadline=None)
@given(
    arrays(
        np.int16,
        st.tuples(st.integers(1, 64), st.integers(1, 2)),
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    got_rate, got = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(got, samples)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=120),
    st.integers(1, 64),
)
def test_next_fit_properties(tokens, budget):
    bins = _next_fit(tokens, budget).tolist()
    # bin ids are 0..k contiguous and non-decreasing (order preserved)
    assert bins == sorted(bins)
    assert bins[0] == 0
    assert set(bins) == set(range(max(bins) + 1))
    # each bin respects the budget unless it is a single oversized item
    from collections import defaultdict

    contents = defaultdict(list)
    for tok, b in zip(tokens, bins):
        contents[b].append(tok)
    for items in contents.values():
        assert sum(items) <= budget or len(items) == 1
    # NEXT-fit (not first-fit): an item opens a new bin only because it
    # did not fit in the immediately preceding bin
    for i in range(1, len(tokens)):
        if bins[i] != bins[i - 1]:
            prev_sum = sum(contents[bins[i - 1]])
            assert prev_sum + tokens[i] > budget


@settings(max_examples=50, deadline=None)
@given(
    arrays(
        np.uint8,
        st.tuples(st.integers(2, 16), st.integers(2, 16), st.just(3)),
    ),
    st.integers(1, 8),
    st.integers(1, 8),
)
def test_resize_index_map_property(px, out_h, out_w):
    """Nearest-neighbor resize picks exactly px[(i*h)//out_h, (j*w)//out_w]
    and is idempotent at the same size."""
    h, w = px.shape[0], px.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    resized = px[rows][:, cols]
    assert resized.shape == (out_h, out_w, 3)
    # exact source-pixel membership
    for i in range(out_h):
        for j in range(out_w):
            assert (resized[i, j] == px[(i * h) // out_h, (j * w) // out_w]).all()
    # idempotence: resizing the result to its own size is the identity
    rows2 = (np.arange(out_h) * out_h) // out_h
    cols2 = (np.arange(out_w) * out_w) // out_w
    assert np.array_equal(resized[rows2][:, cols2], resized)
