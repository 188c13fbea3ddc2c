"""Index build: single-process oracle + the distributed Ray pipeline.

Mirrors the create_freq_index lifecycle
(/root/reference/src/create_freq_index.cpp:54-110, SURVEY.md §3.1):

1. postings (term_id -> sorted docs + freqs)
2. build_model: gap-pattern stats (docs d-gaps, freqs-1) -> DSF
   dictionary per stream (cached/checkpointed)
3. per-list DINT encode -> payload bytes (+ per-term max BM25 weight,
   fused — SURVEY.md §2.7 A5)
4. shard layout + manifest (the freeze equivalent)

The oracle builder below is the conformance baseline: the distributed
pipeline must produce byte-identical payloads per term (SURVEY.md §5
tier 5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from dint_ray.config import DintConfig
from dint_ray.dint import stats as st
from dint_ray.dint.codec import MultiDintCodec, SingleDintCodec
from dint_ray.dint.dictionary import (
    MultiPackedDict,
    PackedDict,
    build_packed_multi,
    build_packed_single,
)
from dint_ray.index.layout import write_posting_list
from dint_ray.index.shards import InvertedIndex
from dint_ray.scoring import WandData, max_weight_of_list


@dataclass
class BuiltDicts:
    """Codec bundle for an index build.

    kind: "single_packed" | "multi_packed" (DINT, dictionary-backed) or
    "block_<codec>" for the reference's plain block-codec index family
    (block_freq_index<T>, /root/reference/include/ds2i/block_freq_index.hpp
    + index_types.hpp:25-37) — no dictionary stage, both streams encoded
    with the named codec from the block-codec registry."""

    kind: str
    docs_dict: PackedDict | MultiPackedDict | None = None
    freqs_dict: PackedDict | MultiPackedDict | None = None

    @property
    def is_block_codec(self) -> bool:
        return self.kind.startswith("block_")

    @property
    def is_sequence(self) -> bool:
        from dint_ray.index.sequences import SEQ_KINDS

        return self.kind in SEQ_KINDS

    @property
    def needs_model(self) -> bool:
        """True when the kind requires the dictionary-mining stages."""
        return not (self.is_block_codec or self.is_sequence)

    def codecs(self):
        if self.is_sequence:
            from dint_ray.index.sequences import SequenceCodecs

            c = SequenceCodecs(self.kind)
            return c, c
        if self.is_block_codec:
            from dint_ray.codecs import CODECS

            codec = CODECS[self.kind[len("block_"):]]
            return codec, codec
        if self.kind == "single_packed8":
            return (SingleDintCodec(self.docs_dict, b=8),
                    SingleDintCodec(self.freqs_dict, b=8))
        if self.kind in ("single_packed", "single_rect"):
            return SingleDintCodec(self.docs_dict), SingleDintCodec(self.freqs_dict)
        return MultiDintCodec(self.docs_dict), MultiDintCodec(self.freqs_dict)


def mine_counts_local(bufs: list[np.ndarray], multi: bool,
                      cfg: DintConfig = DintConfig()):
    """Hash-keyed mining over in-memory gap buffers.

    -> (per-ctx {pattern_bytes: freq} list, total_integers).  Shared
    two-phase algorithm with the Ray pipeline: count by window hash,
    select winners, resolve winning hashes to bytes (stats.py)."""
    nctx = cfg.num_selectors if multi else 1
    if multi:
        ctxs, sizes, hashes, freqs, total = st.hash_counts_multi(
            bufs, cfg.num_selectors)
    else:
        sizes, hashes, freqs, total = st.hash_counts_single(bufs)
        ctxs = np.zeros(len(sizes), dtype=np.uint8)
    winners = {}
    wanted: dict[tuple[int, int], list] = {}
    for ctx in range(nctx):
        m = ctxs == ctx
        ws, wh, wf = st.select_hash_winners(sizes[m], hashes[m], freqs[m],
                                            total, cfg)
        winners[ctx] = (ws, wh, wf)
        for s in np.unique(ws):
            wanted.setdefault((ctx, int(s)), []).append(wh[ws == s])
    wanted_sorted = {k: np.sort(np.concatenate(v)) for k, v in wanted.items()}
    found = st.resolve_patterns(bufs, wanted_sorted,
                                num_selectors=cfg.num_selectors if multi else None)
    per_ctx = []
    for ctx in range(nctx):
        ws, wh, wf = winners[ctx]
        per_ctx.append({found[int(h)]: int(f)
                        for h, f in zip(wh, wf) if int(h) in found})
    return per_ctx, total


def mine_dicts_local(postings: dict[int, tuple[np.ndarray, np.ndarray]],
                     kind: str = "single_packed",
                     cfg: DintConfig = DintConfig()) -> BuiltDicts:
    """Stats + DSF + compaction over in-memory postings (oracle path)."""
    from dint_ray.index.sequences import SEQ_KINDS

    if kind.startswith("block_") or kind in SEQ_KINDS:
        return BuiltDicts(kind=kind)
    doc_bufs = [st.docs_gap_buffer(d) for d, _ in postings.values()]
    freq_bufs = [st.freqs_gap_buffer(f) for _, f in postings.values()]
    multi = kind == "multi_packed"
    if kind not in ("single_packed", "single_packed8", "single_rect",
                    "multi_packed"):
        raise ValueError(f"unknown dict kind {kind!r}")
    cfg = cfg_for_kind(kind, cfg)
    dcs, dtot = mine_counts_local(doc_bufs, multi, cfg)
    fcs, ftot = mine_counts_local(freq_bufs, multi, cfg)
    if multi:
        docs_dict = build_packed_multi(
            [st.select_targets(c, dtot, cfg) for c in dcs], cfg)
        freqs_dict = build_packed_multi(
            [st.select_targets(c, ftot, cfg) for c in fcs], cfg)
    else:
        from dint_ray.dint.dictionary import build_rect_single

        build_one = (build_rect_single if kind == "single_rect"
                     else build_packed_single)
        docs_dict = build_one(st.select_targets(dcs[0], dtot, cfg), cfg)
        freqs_dict = build_one(st.select_targets(fcs[0], ftot, cfg), cfg)
    return BuiltDicts(kind=kind, docs_dict=docs_dict, freqs_dict=freqs_dict)


def cfg_for_kind(kind: str, cfg: DintConfig) -> DintConfig:
    """single_packed8 = the comment-compiled single-dictionary b=8
    variant (dint_configuration.hpp:6-29): 256-entry dictionary,
    single-byte codeword stream.  All other kinds keep cfg as given."""
    if kind == "single_packed8" and cfg.num_entries != 256:
        from dataclasses import replace

        return replace(cfg, num_entries=256, log2_num_entries=8)
    return cfg


def dicts_from_blocks_collections(docs_path: str, freqs_path: str,
                                  kind: str = "single_packed",
                                  cfg: DintConfig = DintConfig()) -> BuiltDicts:
    """Build dictionaries from precomputed ds2i binary_blocks_collection
    stats files (SURVEY.md S3) — the input the reference's
    dictionary_builders.hpp consumes instead of rescanning the corpus.

    total_integers isn't stored in the format; every window size tiles
    the whole stream, so the per-size freq×len sums each approximate it
    — we take their max (exact when size-1 blocks are present, since
    every integer is its own size-1 window)."""
    from dint_ray.sources.ds2i import read_blocks_collection

    if kind not in ("single_packed", "single_rect"):
        raise ValueError(
            "blocks collections carry no selector contexts; "
            "only single-dictionary kinds can be mined from them")
    from dint_ray.dint.dictionary import build_rect_single

    build_one = (build_rect_single if kind == "single_rect"
                 else build_packed_single)

    def one(path: str):
        blocks = read_blocks_collection(path)
        counts: dict[bytes, int] = {}
        per_size: dict[int, int] = {}
        for freq, vals in blocks:
            pat = np.asarray(vals, "<u4").tobytes()
            counts[pat] = counts.get(pat, 0) + int(freq)
            per_size[len(vals)] = per_size.get(len(vals), 0) \
                + int(freq) * len(vals)
        total = max(per_size.values(), default=0)
        return build_one(st.select_targets(counts, total, cfg), cfg)

    return BuiltDicts(kind=kind, docs_dict=one(docs_path),
                      freqs_dict=one(freqs_path))


@dataclass
class LocalIndex:
    index: InvertedIndex
    wand: WandData
    dicts: BuiltDicts
    sizes: np.ndarray

    def stats_bits_per_int(self) -> dict[str, float]:
        """bits/int over payload bytes (header+maxs+endpoints included),
        comparable to the reference README table shape."""
        total_postings = sum(self.index.size(t) for t in self.index.payloads)
        total_bits = 8 * sum(len(p) for p in self.index.payloads.values())
        return {
            "postings": total_postings,
            "bits_per_posting_pair": total_bits / max(total_postings, 1),
        }


def build_index_local(postings: dict[int, tuple[np.ndarray, np.ndarray]],
                      sizes: np.ndarray, num_docs: int,
                      kind: str = "single_packed",
                      cfg: DintConfig = DintConfig(),
                      dicts: BuiltDicts | None = None) -> LocalIndex:
    if dicts is None:
        dicts = mine_dicts_local(postings, kind, cfg)
    docs_codec, freqs_codec = dicts.codecs()
    avg = np.float32(float(np.asarray(sizes, dtype=np.float64).sum()) / num_docs)
    norm_lens = (np.asarray(sizes, dtype=np.float32) / avg).astype(np.float32)
    payloads: dict[int, bytes] = {}
    max_w = np.zeros(max(postings) + 1 if postings else 0, dtype=np.float32)
    for tid in sorted(postings):
        docs, freqs = postings[tid]
        payloads[tid] = write_posting_list(docs, freqs, docs_codec, freqs_codec)
        max_w[tid] = max_weight_of_list(docs, freqs, norm_lens)
    index = InvertedIndex(num_docs, payloads, docs_codec, freqs_codec)
    wand = WandData(norm_lens, max_w, sizes=sizes)
    return LocalIndex(index=index, wand=wand, dicts=dicts, sizes=sizes)


def verify_index(index: InvertedIndex,
                 postings: dict[int, tuple[np.ndarray, np.ndarray]]) -> None:
    """--check equivalent (verify_collection.hpp:7-53): replay every
    posting of the input against the index."""
    for tid, (docs, freqs) in postings.items():
        dd, ff = index.decode(tid)
        if not (np.array_equal(dd, docs.astype(dd.dtype)) and
                np.array_equal(ff, freqs.astype(ff.dtype))):
            raise AssertionError(f"index mismatch at term {tid}")


def load_codec_bundle(index_dir: str, kind: str) -> BuiltDicts:
    """Rebuild the codec bundle for a built index directory."""
    from dint_ray.index.sequences import SEQ_KINDS

    if kind.startswith("block_") or kind in SEQ_KINDS:
        return BuiltDicts(kind=kind)
    import os

    from dint_ray.dint.dictionary import load as _load

    dict_path = os.path.join(index_dir, f"dicts_{kind}.npz")
    return BuiltDicts(kind=kind, docs_dict=_load(dict_path + ".docs.npz"),
                      freqs_dict=_load(dict_path + ".freqs.npz"))
