"""Mixed per-block codec: best representation chosen block by block.

Behavior of the reference's ``mixed_block``
(/root/reference/include/ds2i/mixed_block.hpp:10-218): every block is
encoded with the candidate codec that wins a space/decode-time
trade-off, with a per-block type tag read back at decode time.

Documented deviation: the reference picks points on a Pareto frontier
using a LEARNED linear decode-time predictor
(dec_time_prediction.hpp:13-160, fitted per machine); this container
has no measured time model, so the choice is SMALLEST ENCODED SIZE
with a fixed deterministic candidate order as the tie-break — the
space-optimal corner of the same frontier.  The candidate set mirrors
mixed_block::block_type {interpolative, pfor, varint}.

Layout: u8 tag, then the winning codec's bytes.
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID


def _candidates():
    from dint_ray.codecs import interpolative, optpfor, streamvbyte, varbyte

    return (
        (0, interpolative),   # needs known sum_of_values
        (1, optpfor),
        (2, streamvbyte),
        (3, varbyte),
    )


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    best = None
    for tag, mod in _candidates():
        if tag == 0 and sum_of_values == U32_INVALID:
            continue
        enc = mod.encode(values, sum_of_values)
        if best is None or len(enc) < len(best[1]):
            best = (tag, enc)
    tag, enc = best
    return bytes([tag]) + enc


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    tag = int(buf[offset])
    for t, mod in _candidates():
        if t == tag:
            return mod.decode(buf, offset + 1, sum_of_values, n)
    raise ValueError(f"unknown mixed-block tag {tag}")
