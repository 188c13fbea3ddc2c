"""DINT dictionaries: packed single and packed multi variants.

Re-expresses (no code copied) the semantics of
/root/reference/include/dint/single_dictionary.hpp:15-255,
multi_dictionary.hpp:15-324 and the ``pack_policy`` compaction
(dictionary_building_utils.hpp:241-293):

- a dictionary has ``num_entries`` codewords; the first 7 are reserved:
  0/1 = 2-/4-byte exception escapes, 2..6 = runs of 256/128/64/32/16
  zeros (offset 0 into a table that starts with 16 zeros);
- appended targets (gap patterns, sizes in {1,2,4,8,16}) are compacted:
  sort by (length, lex), dedupe, drop every entry that is a strict
  prefix of a longer entry, concatenate the rest into one flat table;
- each codeword maps to ``(size-1) << 24 | offset`` into the table.

Documented deviation (SURVEY.md §7.4.6): for a *removed* (prefix)
entry the reference locates its bytes with a first-occurrence substring
search over the table; we point it at the first kept entry (in lex
order) of which it is a prefix.  The referenced content is identical,
so decode output is unchanged; only the stored offset value may differ.

Encode-side lookup is hash-only, like the reference
(single_dictionary.hpp:163-171): a 64-bit pattern hash maps to a
codeword with no equality verification.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass

import numpy as np

from dint_ray.config import EXCEPTIONS, INVALID_INDEX, RESERVED, RUN_LENGTHS, DintConfig
from dint_ray.util import hash_pattern


@dataclass
class LookupTable:
    """Sorted-hash lookup: vectorized many-at-once codeword resolution."""

    hashes: np.ndarray     # uint64, sorted
    codewords: np.ndarray  # uint32, aligned with hashes

    @classmethod
    def from_pairs(cls, pairs: list[tuple[int, int]]) -> "LookupTable":
        """pairs in insertion order; later insertions of the same hash win
        (C++ unordered_map operator[] overwrite semantics)."""
        if not pairs:
            return cls(np.empty(0, np.uint64), np.empty(0, np.uint32))
        h = np.array([p[0] for p in pairs], dtype=np.uint64)
        c = np.array([p[1] for p in pairs], dtype=np.uint32)
        order = np.arange(len(h))
        # stable sort by hash; keep last occurrence of each hash
        idx = np.lexsort((order, h))
        h, c = h[idx], c[idx]
        keep = np.ones(len(h), dtype=bool)
        keep[:-1] = h[1:] != h[:-1]
        return cls(h[keep], c[keep])

    def lookup_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized: returns codeword per hash, INVALID_INDEX if absent."""
        if len(self.hashes) == 0 or len(hashes) == 0:
            return np.full(len(hashes), INVALID_INDEX, dtype=np.uint32)
        pos = np.searchsorted(self.hashes, hashes)
        pos_c = np.minimum(pos, len(self.hashes) - 1)
        hit = self.hashes[pos_c] == hashes
        out = np.where(hit, self.codewords[pos_c], INVALID_INDEX)
        return out.astype(np.uint32)

    def lookup(self, h: int) -> int:
        return int(self.lookup_many(np.array([h], dtype=np.uint64))[0])

    # the C probe table (native.probe_table) caches its open-addressing
    # slots array here (>= 4x entry count at 16 B/slot); shipping it
    # inside every ray.put broadcast / checkpoint pickle of the
    # dictionary bundle inflated serialized size ~5x — drop it and let
    # each process rebuild lazily (one cheap C call)
    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_probe", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)


def _reserved_lookup_pairs() -> list[tuple[int, int]]:
    """Run codewords 2..6 for zero patterns of sizes 256..16
    (single_dictionary.hpp prepare_for_encoding)."""
    pairs = []
    zeros = np.zeros(256, dtype=np.uint32)
    for i, n in enumerate(RUN_LENGTHS):
        pairs.append((hash_pattern(zeros[:n]), EXCEPTIONS + i))
    return pairs


def _compact_pack(targets: list[tuple[int, ...]]) -> list[tuple[int, ...]]:
    """pack_policy::compact (dictionary_building_utils.hpp:241-293):
    sort by (len, lex), dedupe, drop entries that are strict prefixes of
    longer entries; returns kept entries in (len, lex) order."""
    uniq = sorted(set(targets), key=lambda t: (len(t), t))
    # prefix test via pure-lex sort: an entry is a prefix of a longer
    # entry iff it is a prefix of its immediate lex successor.
    lex = sorted(uniq)
    dropped = set()
    for a, b in zip(lex, lex[1:]):
        if len(a) < len(b) and b[: len(a)] == a:
            dropped.add(a)
    # a may be a prefix of an already-dropped successor whose own longer
    # superstring also extends a, so one pass over lex order suffices:
    # if a is a prefix of ANY longer entry, it is a prefix of its lex
    # successor (entries sharing the prefix sort contiguously after it).
    return [t for t in uniq if t not in dropped]


@dataclass
class PackedDict:
    """Decode + encode structures for one dictionary (single variant)."""

    table: np.ndarray        # uint32 flat table (starts with 16 zeros, 16-zero padded tail)
    offsets: np.ndarray      # uint32 packed (size-1)<<24 | offset, len == size()
    # derived decode arrays
    lengths: np.ndarray      # int32 per codeword (runs: 256..16)
    entries16: np.ndarray    # (size, 16) uint32 gather matrix
    lookup: LookupTable      # encode-side map

    @property
    def size(self) -> int:
        return len(self.offsets)

    def entry(self, i: int) -> np.ndarray:
        off = int(self.offsets[i]) & 0xFFFFFF
        ln = (int(self.offsets[i]) >> 24) + 1
        return self.table[off : off + ln]

    @classmethod
    def from_offsets(cls, table: np.ndarray, offsets: np.ndarray,
                     build_lookup: bool = True, small_codeword_limit: int | None = None) -> "PackedDict":
        table = np.ascontiguousarray(table, dtype=np.uint32)
        offsets = np.ascontiguousarray(offsets, dtype=np.uint32)
        padded = np.concatenate([table, np.zeros(16, dtype=np.uint32)])
        lengths = ((offsets >> 24) + 1).astype(np.int32)
        offs = (offsets & 0xFFFFFF).astype(np.int64)
        # gather (size,16); rows for runs are zeros (offset 0, table head zeros)
        idx = offs[:, None] + np.arange(16)[None, :]
        entries16 = padded[np.minimum(idx, len(padded) - 1)]
        # rows past table end would gather garbage; clamp handled by pad
        lut = None
        if build_lookup:
            pairs = _reserved_lookup_pairs()
            for i in range(RESERVED, len(offsets)):
                if small_codeword_limit is not None and i >= small_codeword_limit:
                    break
                ln = int(lengths[i])
                pairs.append((hash_pattern(padded[offs[i] : offs[i] + ln]), i))
            lut = LookupTable.from_pairs(pairs)
        return cls(table=table, offsets=offsets, lengths=lengths,
                   entries16=entries16, lookup=lut)


def build_packed_single(targets: list[np.ndarray], cfg: DintConfig = DintConfig()) -> PackedDict:
    """single_dictionary::builder with pack_policy.

    ``targets`` are the DSF-selected patterns in append order (at most
    num_entries - RESERVED are used; single_dictionary.hpp:112-125).
    """
    max_targets = cfg.num_entries - RESERVED
    tup_targets = [tuple(int(x) for x in t) for t in targets[:max_targets]]
    kept = _compact_pack(tup_targets)

    # table: 16 zeros then kept entries in (len, lex) order
    flat = [0] * cfg.max_entry_size
    starts: dict[tuple[int, ...], int] = {}
    for t in kept:
        starts[t] = len(flat)
        flat.extend(t)
    table = np.asarray(flat, dtype=np.uint32)

    kept_lex = sorted(kept)

    def locate(t: tuple[int, ...]) -> int:
        if t in starts:
            return starts[t]
        i = bisect.bisect_left(kept_lex, t)
        # first lex successor with t as prefix (guaranteed to exist:
        # t was dropped because it prefixes a longer kept entry)
        while i < len(kept_lex):
            cand = kept_lex[i]
            if len(cand) > len(t) and cand[: len(t)] == t:
                return starts[cand]
            if cand[: len(t)] > t:
                break
            i += 1
        raise AssertionError(f"dropped entry {t} has no superstring")

    # offsets: reserved first (single_dictionary.hpp:39-56)
    offs = [0] * EXCEPTIONS + [(n - 1) << 24 for n in RUN_LENGTHS]
    for t in tup_targets:
        offs.append(((len(t) - 1) << 24) | locate(t))
    offsets = np.asarray(offs, dtype=np.uint32)
    return PackedDict.from_offsets(table, offsets)


def build_rect_single(targets: list[np.ndarray],
                      cfg: DintConfig = DintConfig()) -> PackedDict:
    """rectangular_dictionary::builder
    (/root/reference/include/dint/rectangular_dictionary.hpp:14-227):
    every entry occupies a FIXED max_entry_size-u32 slot — no packing,
    no prefix compaction; codeword i addresses slot i directly, trading
    dictionary storage for an offset-free decode.

    The codeword STREAM is identical to the packed variant built from
    the same targets (the reference README shows equal bits/int for
    single_rect and single_packed); only the table layout differs, so
    we reuse PackedDict with stride-16 offsets."""
    max_targets = cfg.num_entries - RESERVED
    seen: set[tuple[int, ...]] = set()
    tups: list[tuple[int, ...]] = []
    for t in targets:
        tt = tuple(int(x) for x in t)
        if tt not in seen:
            seen.add(tt)
            tups.append(tt)
        if len(tups) >= max_targets:
            break

    stride = cfg.max_entry_size
    flat = [0] * stride                      # slot 0: zeros (runs/escapes)
    offs = [0] * EXCEPTIONS + [(n - 1) << 24 for n in RUN_LENGTHS]
    for j, t in enumerate(tups):
        off = stride * (j + 1)
        flat.extend(t)
        flat.extend([0] * (stride - len(t)))
        offs.append(((len(t) - 1) << 24) | off)
    table = np.asarray(flat, dtype=np.uint32)
    offsets = np.asarray(offs, dtype=np.uint32)
    return PackedDict.from_offsets(table, offsets)


def _compact_overlap(targets: list[tuple[int, ...]]):
    """overlap_policy::compact (dictionary_building_utils.hpp:63-239):
    drop entries contained as a SUBSTRING of another entry, then greedily
    merge suffix/prefix overlaps (longest overlap first), so entries
    share table cells.  Returns (segments, locate) where ``segments`` is
    the list of merged integer sequences and ``locate[target] ->
    (segment_idx, pos)``.

    Deviations from the reference, documented: candidate containment is
    pre-filtered by 64-bit window hashes (verified by direct comparison
    on hit, so a collision can only *miss* a merge, never corrupt one),
    and ties are broken by (len desc, lex asc) instead of priority-queue
    insertion order — the same determinism fix as the stats sorter."""
    uniq = sorted(set(targets), key=lambda t: (-len(t), t))
    if not uniq:
        return [], {}

    from dint_ray.util import window_hashes

    # 1. substring containment: window-hash index over all entries
    win_index: dict[int, tuple[int, int]] = {}  # hash -> (entry_idx, pos)
    for i, t in enumerate(uniq):
        arr = np.asarray(t, dtype=np.uint32)
        for ln in range(1, len(t)):
            for pos, h in enumerate(window_hashes(arr, ln)):
                win_index.setdefault((ln, int(h)), (i, pos))
    contained: dict[tuple[int, ...], tuple[int, int]] = {}
    alive: list[tuple[int, ...]] = []
    for i, t in enumerate(uniq):
        hit = win_index.get((len(t), int(hash_pattern(np.asarray(t, np.uint32)))))
        if hit is not None and hit[0] != i:
            ci, pos = hit
            if uniq[ci][pos : pos + len(t)] == t:  # verify (collision guard)
                contained[t] = (ci, pos)
                continue
        alive.append(t)

    # 2. greedy suffix/prefix overlap merge, longest overlaps first
    segs: list[list[int] | None] = [list(t) for t in alive]
    members: list[list[tuple[tuple[int, ...], int]] | None] = [
        [(t, 0)] for t in alive]           # per segment: (target, pos)
    head = list(range(len(segs)))          # live segment ids
    max_k = max((len(t) for t in alive), default=1) - 1
    for k in range(max_k, 0, -1):
        pref: dict[tuple[int, ...], list[int]] = {}
        for s in head:
            if segs[s] is not None and len(segs[s]) >= k:
                pref.setdefault(tuple(segs[s][:k]), []).append(s)
        merged_any = True
        while merged_any:
            merged_any = False
            for s in head:
                if segs[s] is None or len(segs[s]) < k:
                    continue
                key = tuple(segs[s][-k:])
                for cand in pref.get(key, []):
                    if cand == s or segs[cand] is None:
                        continue
                    # merge cand onto s, sharing k cells
                    base = len(segs[s]) - k
                    members[s].extend((t, base + pos)
                                      for t, pos in members[cand])
                    members[cand] = None
                    segs[s].extend(segs[cand][k:])
                    segs[cand] = None
                    merged_any = True
                    break
        head = [s for s in head if segs[s] is not None]

    final_segs = [segs[s] for s in head]
    locate: dict[tuple[int, ...], tuple[int, int]] = {}
    for new_i, s in enumerate(head):
        for t, pos in members[s]:
            locate[t] = (new_i, pos)
    for t, (ci, pos) in contained.items():
        si, spos = locate[uniq[ci]]
        locate[t] = (si, spos + pos)
    return final_segs, locate


def build_packed_single_overlap(targets: list[np.ndarray],
                                cfg: DintConfig = DintConfig()) -> PackedDict:
    """single_dictionary::builder with overlap_policy: same codeword
    assignment as pack, smaller table (entries share overlapping
    cells).  Not used by the three shipped index types
    (index_types.hpp:62-80) — provided for parity with the reference's
    compaction-policy axis."""
    max_targets = cfg.num_entries - RESERVED
    tup_targets = [tuple(int(x) for x in t) for t in targets[:max_targets]]
    segs, locate = _compact_overlap(tup_targets)

    flat = [0] * cfg.max_entry_size
    seg_start = []
    for seg in segs:
        seg_start.append(len(flat))
        flat.extend(seg)
    table = np.asarray(flat, dtype=np.uint32)

    offs = [0] * EXCEPTIONS + [(n - 1) << 24 for n in RUN_LENGTHS]
    for t in tup_targets:
        si, pos = locate[t]
        offs.append(((len(t) - 1) << 24) | (seg_start[si] + pos))
    offsets = np.asarray(offs, dtype=np.uint32)
    return PackedDict.from_offsets(table, offsets)


@dataclass
class MultiPackedDict:
    """multi_dictionary (6 packed dicts sharing one table).

    dicts[s] is the b=16 view of dictionary s; small_lookups[s] is the
    b=8 lookup (entries with local codeword < 256 only,
    multi_dictionary.hpp:198-216).
    """

    dicts: list[PackedDict]
    small_lookups: list[LookupTable]

    @property
    def num_dictionaries(self) -> int:
        return len(self.dicts)


def build_packed_multi(targets_per_dict: list[list[np.ndarray]],
                       cfg: DintConfig = DintConfig()) -> MultiPackedDict:
    """multi_dictionary::builder with pack_policy: one global compaction
    over the union of all dictionaries' targets, shared table, per-dict
    offset ranges with their own reserved 7 entries."""
    assert len(targets_per_dict) == cfg.num_selectors
    max_targets = cfg.num_entries - RESERVED
    tup_per_dict = [
        [tuple(int(x) for x in t) for t in ts[:max_targets]]
        for ts in targets_per_dict
    ]
    all_targets = [t for ts in tup_per_dict for t in ts]
    kept = _compact_pack(all_targets)

    flat = [0] * cfg.max_entry_size
    starts: dict[tuple[int, ...], int] = {}
    for t in kept:
        starts[t] = len(flat)
        flat.extend(t)
    table = np.asarray(flat, dtype=np.uint32)
    kept_lex = sorted(kept)

    def locate(t: tuple[int, ...]) -> int:
        if t in starts:
            return starts[t]
        i = bisect.bisect_left(kept_lex, t)
        while i < len(kept_lex):
            cand = kept_lex[i]
            if len(cand) > len(t) and cand[: len(t)] == t:
                return starts[cand]
            if cand[: len(t)] > t:
                break
            i += 1
        raise AssertionError(f"dropped entry {t} has no superstring")

    dicts: list[PackedDict] = []
    small_lookups: list[LookupTable] = []
    for ts in tup_per_dict:
        offs = [0] * EXCEPTIONS + [(n - 1) << 24 for n in RUN_LENGTHS]
        for t in ts:
            offs.append(((len(t) - 1) << 24) | locate(t))
        offsets = np.asarray(offs, dtype=np.uint32)
        d = PackedDict.from_offsets(table, offsets)
        dicts.append(d)
        # b=8 sub-map: run hashes + entries with local index < 256
        pairs = _reserved_lookup_pairs()
        for i in range(RESERVED, min(256, len(offsets))):
            pairs.append((hash_pattern(d.entry(i)), i))
        small_lookups.append(LookupTable.from_pairs(pairs))
    return MultiPackedDict(dicts=dicts, small_lookups=small_lookups)


# --- artifact (de)serialization -------------------------------------------

def save_single(path: str, d: PackedDict) -> None:
    np.savez_compressed(path, kind="single", table=d.table, offsets=d.offsets)


def save_multi(path: str, m: MultiPackedDict) -> None:
    np.savez_compressed(
        path,
        kind="multi",
        table=m.dicts[0].table,
        **{f"offsets_{i}": d.offsets for i, d in enumerate(m.dicts)},
    )


def load(path: str):
    z = np.load(path, allow_pickle=False)
    if str(z["kind"]) == "single":
        return PackedDict.from_offsets(z["table"], z["offsets"])
    dicts = []
    small = []
    i = 0
    while f"offsets_{i}" in z:
        d = PackedDict.from_offsets(z["table"], z[f"offsets_{i}"])
        dicts.append(d)
        pairs = _reserved_lookup_pairs()
        for j in range(RESERVED, min(256, d.size)):
            pairs.append((hash_pattern(d.entry(j)), j))
        small.append(LookupTable.from_pairs(pairs))
        i += 1
    return MultiPackedDict(dicts=dicts, small_lookups=small)
