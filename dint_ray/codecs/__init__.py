"""Block codec registry.

Mirrors the reference's block-codec concept
(/root/reference/include/ds2i/block_codecs.hpp): each codec exposes
``encode(values, sum_of_values) -> bytes`` and
``decode(buf, offset, sum_of_values, n) -> (values, new_offset)`` over
uint32 numpy arrays, where ``sum_of_values == U32_INVALID`` means
"unknown" (the codec must then self-describe).
"""

from __future__ import annotations

from dint_ray.codecs import (
    interpolative,
    maskedvbyte,
    mixed,
    optpfor,
    qmx,
    simple16,
    streamvbyte,
    u32,
    varbyte,
    varint_g8iu,
    varintgb,
)

CODECS: dict[str, object] = {
    "u32": u32,
    "vbyte": varbyte,
    "interpolative": interpolative,
    "simple16": simple16,
    "varintgb": varintgb,
    "streamvbyte": streamvbyte,
    "optpfor": optpfor,
    "varint_g8iu": varint_g8iu,
    "maskedvbyte": maskedvbyte,
    "qmx": qmx,
    "mixed": mixed,
}


def register(name: str, module) -> None:
    CODECS[name] = module
