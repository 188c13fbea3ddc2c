"""Engine configuration.

Mirrors the reference's compile-time constants
(/root/reference/include/dint/dint_configuration.hpp:6-29,
 /root/reference/include/util.hpp:33-35) as a runtime dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Reserved codewords (dint_configuration.hpp:6 `#define EXCEPTIONS 2`;
# single_dictionary.hpp:22 `reserved = EXCEPTIONS + 5`):
#   0 -> 2-byte exception escape
#   1 -> 4-byte exception escape
#   2..6 -> runs of 256, 128, 64, 32, 16 zeros
EXCEPTIONS = 2
RESERVED = EXCEPTIONS + 5
RUN_LENGTHS = (256, 128, 64, 32, 16)  # codewords 2..6 in order

INVALID_INDEX = 0xFFFFFFFF
U32_INVALID = 0xFFFFFFFF  # "unknown sum_of_values" sentinel


@dataclass(frozen=True)
class DintConfig:
    """DINT dictionary/codec parameters (dint_configuration.hpp:20-28)."""

    block_size: int = 256           # util.hpp:35 constants::block_size
    max_entry_size: int = 16        # dint_configuration.hpp:23
    num_entries: int = 65536        # dictionary capacity, 2^16
    log2_num_entries: int = 16      # codeword width b (bits)
    target_sizes: tuple[int, ...] = (16, 8, 4, 2, 1)
    num_selectors: int = 6          # multi-dict contexts
    # dictionary_builders.hpp:15-25: eps=1e-4, DSF filter uses eps/1000
    dsf_filter_threshold: float = 1e-4 / 1000
    # util.hpp:33-34
    min_list_size: int = 0
    max_list_size: int = 50_000_000


@dataclass(frozen=True)
class BuildConfig:
    """Distributed build knobs (sized for 32-CPU local; scale notes inline)."""

    # Postings shuffle: salt terms with df > salt_df_threshold into
    # doc_id-range buckets of salt_bucket_docs docs each (SURVEY.md §7.3).
    # Low threshold on purpose so fixtures exercise the salted path.
    salt_df_threshold: int = 4096
    salt_bucket_docs: int = 4096
    # merge strategy: "single" (one exchange; default when head lists
    # fit one task), "salted" (two-phase bucketed runs), or "auto"
    # (salted iff max df > chunk_df_threshold)
    merge_strategy: str = "auto"
    chunk_df_threshold: int = 4_000_000
    # vocabulary handling: "driver" broadcasts a term->id dict per
    # actor (fast below ~10^7 terms); "dataset" keeps the vocabulary a
    # Dataset and assigns ids via a distributed hash join on term (the
    # 10^12-doc path — no O(num_terms) driver/actor state); "auto"
    # picks dataset when the df-partial row count exceeds the
    # threshold.  20M matches _sum_by_key's driver_limit: below it the
    # driver reduce is a sub-second arrow group_by, and the dataset
    # path's term-string exchange + distributed rank costs ~6 s of
    # fixed wall that doesn't shrink with cluster size.
    vocab_mode: str = "auto"
    vocab_dataset_threshold: int = 20_000_000
    # tokenize-output checkpoint: True writes postings_rows/ parquet
    # (resume granularity worth one disk roundtrip when tokenize is a
    # long stage), False keeps the rows in the object store
    # (spillable; a crash before the postings checkpoint re-tokenizes),
    # None = auto (checkpoint above 5M docs)
    checkpoint_rows: bool | None = None
    # Map-side combine bundling for the posting exchange: scalar
    # (term_id, doc_id, tf) rows gathered per combine call.  The
    # combine emits <= one list row per (term, call), so bundling ~40
    # tokenizer blocks per call collapses ~40x more duplicate terms
    # before the hash exchange — which is per-ROW-overhead bound, not
    # byte bound (BASELINE.md negative result).  None = one input
    # block per call (the pre-bundling behavior, kept for A/B).
    combine_batch_rows: int | None = 4_000_000
    # actor pools; concurrency 0 = size to the cluster (one per CPU)
    encode_batch_size: int = 64
    encode_concurrency: int = 0
    tokenize_batch_size: int = 1024
    tokenize_concurrency: int = 0

    def pool_size(self, configured: int) -> int:
        """Max actor-pool size for build stages (headroom below the
        CPU count so shuffle aggregators/tasks in the same execution
        stay schedulable)."""
        if configured:
            return configured
        try:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8))
            return max(1, ncpu - max(1, ncpu // 8))
        except Exception:
            return 8

    def pool_bounds(self, configured: int) -> tuple[int, int]:
        """(min, max) actor-pool bounds for build stages.

        A (1, N) pool ramps from one actor and — under streaming
        backpressure, which keeps queues small — often never widens,
        so short stages run near-serial at any CPU count (measured:
        tokenize wall identical at 6 and 24 CPUs).  A FIXED full-size
        pool deadlocks executions that also contain hash-shuffle
        aggregator actors (all logical CPUs reserved by the pool, no
        slot left for an aggregator or task).  The fix is a meaningful
        MIN floor (~1/3 of the CPUs): immediate parallel startup, with
        enough headroom that aggregators and task operators schedule.

        The cap is clamped below the cluster CPU count even for
        explicitly configured sizes — a pool covering every logical
        CPU starves the fused read tasks / write operator of the same
        execution and the stage deadlocks (observed at 8 CPUs)."""
        cap = self.pool_size(configured)
        try:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        # max(1, ...) INSIDE the clamp: a floor of 2 outside it would
        # hand a 1- or 2-CPU cluster a pool covering every logical CPU
        # — exactly the all-reserved deadlock this clamp exists to
        # prevent.  On 1 CPU a 1-actor pool is the best we can do.
        cap = max(1, min(cap, ncpu - max(1, ncpu // 8)))
        return (max(1, min(cap, ncpu // 3)), cap)


DEFAULT = DintConfig()
