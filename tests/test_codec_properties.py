"""Hypothesis property tests over the codec layer.

The parametrized sweep in test_codecs.py covers the reference's tier-1
grid (/root/reference/test/test_block_codecs.cpp:9-49); these tests add
adversarial SHAPES the grid can't reach: mixed magnitudes inside one
block (zero runs next to 32-bit spikes), arbitrary lengths, and
boundary-heavy monotone sequences for the Elias-Fano family.  No Ray —
pure kernel properties.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dint_ray.codecs import (interpolative, maskedvbyte, mixed, optpfor,
                             qmx, simple16, streamvbyte, u32, varbyte,
                             varint_g8iu, varintgb)
from dint_ray.codecs.ef import ef_encode, ef_decode
from dint_ray.config import U32_INVALID

FULL_RANGE = [u32, varbyte, varintgb, streamvbyte,
              optpfor, varint_g8iu, maskedvbyte]
# These self-describe an unknown sum as a u32 varbyte (interpolative
# wire header; qmx and mixed delegate partial blocks to it), so their
# block sums must stay below 2^32-1 — enforced by an explicit encode
# guard, tested separately below.
SUM_BOUNDED = [interpolative, qmx, mixed]


def _mixed_block(draw, max_bits: int) -> np.ndarray:
    """A block assembled from runs of zeros, small values and spikes —
    the shape dictionary-coded postings actually have."""
    segs = draw(st.lists(
        st.tuples(st.integers(1, 40),
                  st.sampled_from(["zero", "small", "spike"])),
        min_size=1, max_size=10))
    out: list[int] = []
    for length, kind in segs:
        if kind == "zero":
            out.extend([0] * length)
        elif kind == "small":
            out.extend(draw(st.lists(st.integers(0, 7), min_size=length,
                                     max_size=length)))
        else:
            out.extend(draw(st.lists(
                st.integers(0, (1 << max_bits) - 1), min_size=length,
                max_size=length)))
    return np.asarray(out[:300], dtype=np.uint32)


@st.composite
def blocks32(draw):
    return _mixed_block(draw, 32)


@st.composite
def blocks28(draw):
    return _mixed_block(draw, 28)


@st.composite
def blocks22(draw):
    # 300 values x 2^22 max keeps every block sum < 2^32-1
    return _mixed_block(draw, 22)


def _roundtrip(codec, values: np.ndarray, sum_known: bool) -> None:
    sov = int(values.sum()) if sum_known else U32_INVALID
    blob = codec.encode(values, sov)
    buf = np.frombuffer(blob + b"\xaa" * 7, dtype=np.uint8)
    out, consumed = codec.decode(buf, 0, sov, len(values))
    np.testing.assert_array_equal(out.astype(np.uint64),
                                  values.astype(np.uint64))
    assert consumed == len(blob)


@pytest.mark.parametrize("codec", FULL_RANGE,
                         ids=[c.__name__.split(".")[-1] for c in FULL_RANGE])
@settings(max_examples=25, deadline=None)
@given(values=blocks32(), sum_known=st.booleans())
def test_roundtrip_property(codec, values, sum_known):
    _roundtrip(codec, values, sum_known)


@settings(max_examples=25, deadline=None)
@given(values=blocks28(), sum_known=st.booleans())
def test_simple16_roundtrip_property(values, sum_known):
    _roundtrip(simple16, values, sum_known)


@pytest.mark.parametrize("codec", SUM_BOUNDED,
                         ids=[c.__name__.split(".")[-1]
                              for c in SUM_BOUNDED])
@settings(max_examples=25, deadline=None)
@given(values=blocks22(), sum_known=st.booleans())
def test_roundtrip_property_sum_bounded(codec, values, sum_known):
    _roundtrip(codec, values, sum_known)


def test_interpolative_sum_overflow_raises():
    """A self-described sum past the u32 wire limit must fail loudly
    (the reference wrapper wraps and decodes garbage here); qmx partial
    blocks delegate and inherit the guard."""
    v = np.array([1, 4294967295], dtype=np.uint32)
    with pytest.raises(ValueError):
        interpolative.encode(v, U32_INVALID)
    with pytest.raises(ValueError):
        qmx.encode(v, U32_INVALID)
    # the pure-Python fallback path (no C kernel) must guard too
    from unittest import mock

    from dint_ray import native

    with mock.patch.object(native, "interp_encode", return_value=None):
        with pytest.raises(ValueError):
            interpolative.encode(v, U32_INVALID)


@st.composite
def monotone(draw):
    """Strictly increasing uint32 sequence + universe, gap-skewed (long
    dense runs then jumps — EF's boundary cases live at bucket edges)."""
    gaps = _mixed_block(draw, 20).astype(np.uint64) + 1
    docs = np.cumsum(gaps) - 1
    slack = draw(st.integers(0, 1000))
    return docs.astype(np.uint64), int(docs[-1]) + 1 + slack


@settings(max_examples=50, deadline=None)
@given(args=monotone())
def test_ef_roundtrip_property(args):
    docs, universe = args
    blob = ef_encode(np.asarray(docs, dtype=np.uint32), universe)
    out, _ = ef_decode(np.frombuffer(blob + b"\xaa" * 7, dtype=np.uint8))
    np.testing.assert_array_equal(out.astype(np.uint64), docs)
