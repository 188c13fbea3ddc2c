"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module;
nothing here (or in dint_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship: DINT index build over sf0.001 documents +
                      float32 WAND top-10 serving of the fixed query log.
- ``queries()``     — one callable per implemented operator/pipeline from
                      SURVEY.md §2 (sf_dir -> Dataset/DataFrame/Table).
- ``oracle_sql()``  — matching DuckDB SQL per query where the operator is
                      SQL-expressible; omitted for probabilistic /
                      stateful ops (LSH recall, fingerprint hashes,
                      multimodal stubs) which get rows-only checks.

Implementations live in dint_ray/entry.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from dint_ray import entry as _impl

# Warm the C-kernel compile cache at import so the first entry call
# doesn't pay it; a missing compiler must never abort an entry — every
# kernel caller falls back to the vectorized numpy path, we just say so
# loudly once.
try:
    from dint_ray import native as _native

    if not _native.available():
        import logging

        logging.getLogger(__name__).warning(
            "dint_ray C kernels unavailable (no working `cc`?) — "
            "running on the pure-Python/numpy fallback paths; results "
            "are identical, throughput is lower")
except Exception:  # pragma: no cover - the warm-up itself must be safe
    pass


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _impl.flagship_entry()


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _) in _impl.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _impl.registry().items()
            if sql is not None}
