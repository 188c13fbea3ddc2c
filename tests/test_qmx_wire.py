"""QMX wire-format conformance.

The md5 digests below were produced by compiling the reference's
vendored QMX codec (/root/reference/include/ds2i/qmx_codec.hpp,
Trotman 2014, 2-clause BSD) with g++ -msse4.1 and encoding the same
deterministic 256-integer vectors; `dint_ray.codecs.qmx._encode_full`
must reproduce every stream byte-for-byte.  The reference decoder was
also run over each stream to confirm it roundtrips (so matching its
bytes means C++-built and Python-built blocks are interchangeable).
A further 3000-vector randomized sweep was byte-compared out-of-band;
this file pins the curated battery so the suite stays self-contained.
"""

import hashlib

import numpy as np
import pytest

from dint_ray.codecs import qmx

B = 256


def _vectors():
    out = []
    out.append(("all_ones", np.ones(B, np.uint32)))
    out.append(("all_zeros", np.zeros(B, np.uint32)))
    for w in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 16, 21, 32):
        v = np.full(B, (1 << w) - 1 if w < 32 else 0xFFFFFFFF, np.uint32)
        out.append((f"uniform_w{w}", v))
        v2 = v.copy()
        v2[::7] = 1  # sprinkle of ones exercises the width-0 quirk
        out.append((f"uniform_w{w}_ones", v2))
    v = np.ones(B, np.uint32)
    v[64:128] = 200
    v[128:192] = 70000
    v[192:] = 3
    out.append(("runs_mixed", v))
    for tail, name in ((4, "tail4"), (8, "tail8"), (12, "tail12")):
        v = np.zeros(B, np.uint32)
        v[B - tail:] = 100000
        out.append((f"wide_{name}", v))
        v = np.zeros(B, np.uint32)
        v[B - tail:] = 200
        out.append((f"byte_{name}", v))
    for pos in (0, 3, 4, 127, 128, 131, 252, 255):
        v = np.ones(B, np.uint32) * 2
        v[pos] = 0xFFFFFFFF
        out.append((f"outlier_{pos}", v))
    for seed in range(20):
        rng = np.random.default_rng(seed)
        scale = 10 ** (seed % 6)
        v = rng.integers(0, max(2, scale), B, dtype=np.uint32)
        out.append((f"rand_s{seed}", v.astype(np.uint32)))
    for seed in range(10):
        rng = np.random.default_rng(100 + seed)
        v = (rng.pareto(1.3, B) * 3).astype(np.uint32)
        out.append((f"pareto_s{seed}", v))
    return out


# md5 of the reference encoder's output for each vector above
REFERENCE_MD5 = {
    "all_ones": "d838691e5d4ad06879ca721442e883d4",
    "all_zeros": "abadebcb1897b57d5a077caf2830372f",
    "uniform_w1": "d838691e5d4ad06879ca721442e883d4",
    "uniform_w1_ones": "d838691e5d4ad06879ca721442e883d4",
    "uniform_w2": "72b29034e78f1055c0dbce3b8f4c69bb",
    "uniform_w2_ones": "772a0204e3526dcb4149c1830ab60ed7",
    "uniform_w3": "5928a0e987fe202376f98b8656fddffe",
    "uniform_w3_ones": "9eda68ccbbe63de212a3cdecc90da3ad",
    "uniform_w4": "ba0dfb3d95eabfde006213ba69bfce86",
    "uniform_w4_ones": "ba15833e0bc2d44aef61acfc9e2d9856",
    "uniform_w5": "44740399610a703bb4b2645a7162b508",
    "uniform_w5_ones": "86dd775cd17e99e383c930cd832a2d60",
    "uniform_w6": "a4fdd11354331e0e656caccaae7dca0f",
    "uniform_w6_ones": "d6fdfb82f96f088afec81dedb1b5d434",
    "uniform_w7": "a223908f6d3a3a5e44ea87ebe400ef5c",
    "uniform_w7_ones": "125a5a84527e5fd85138f1da286c76fd",
    "uniform_w8": "5b3cf89ab08b6b97984a37730e50f6c1",
    "uniform_w8_ones": "0530562c5b6bcd5ee08d81a543c45ee9",
    "uniform_w9": "7fbeed0f3a428495053cd2d4abe3c608",
    "uniform_w9_ones": "f2be7d68d7816ed698e490d53d3102de",
    "uniform_w10": "779d357e092b1b217061a54e13c87d89",
    "uniform_w10_ones": "2c5325f9d318666c7176db09b20a517b",
    "uniform_w12": "8c7fc52221badeb443cbce5f1f489cf4",
    "uniform_w12_ones": "de26a2240b82f8f07e9a1225ed72346c",
    "uniform_w16": "270367239f580969f5fd02654fe2fdab",
    "uniform_w16_ones": "cf25b39d857094dcb650347b6548a003",
    "uniform_w21": "3fc1261400036ba59b9084d4b99cc707",
    "uniform_w21_ones": "e3639bbf93ce7eb774711b53381382c0",
    "uniform_w32": "ea2969468d490fa8cb7836c1b35b2ceb",
    "uniform_w32_ones": "d9b5cfb25099cf1d9ce6a1e5f22c155d",
    "runs_mixed": "a1bc3835ba7729485e558990bdcf4277",
    "wide_tail4": "38ebbfe4920ab07fc102976e997a1ab9",
    "byte_tail4": "ce921f8ad098041d7d84f10fc78d64a5",
    "wide_tail8": "6da6c988bf11c0d02f692979f83ab6b1",
    "byte_tail8": "57a1c93c801c2760e5a242b3a7fa2e63",
    "wide_tail12": "bdb3028ee8abfaab3201115584f72b68",
    "byte_tail12": "3505df4a9f3fd5420ec65f02825c3ee5",
    "outlier_0": "f3c4f43abaaf1f7ac2d61237c4260027",
    "outlier_3": "1b3f884f1d569a3a6941957d245eef80",
    "outlier_4": "7899b837e50ea69a4724639366392f80",
    "outlier_127": "19e01fdea0daf6dfa36b63bf82cc84a2",
    "outlier_128": "a2a6505b596642a89e6656b3418c4238",
    "outlier_131": "c9f60c2b8be1856a3a9a5a0758db3584",
    "outlier_252": "1337a66b1e116132fc489bd357afd27c",
    "outlier_255": "868dcfbdcb27207391936cd2e2ef7f53",
    "rand_s0": "659ffb5ce17f1487393e92889318de27",
    "rand_s1": "16473ba90e99a316393c76b9c103fea4",
    "rand_s2": "2ba29fb6a599f7fe2762950b199def65",
    "rand_s3": "698289bad0bddf27b3197abe38d618cb",
    "rand_s4": "0e78e7df14972f2a11dac2ab4aed3445",
    "rand_s5": "204294362aed6699109ce4dc69d195b3",
    "rand_s6": "04b2d422cda2fead5e5dd09dafef52c8",
    "rand_s7": "dd477ba7e541198399454e2163a618e6",
    "rand_s8": "ef0076ea2c883f23cfe2e8499cbe9994",
    "rand_s9": "78885322f86f09635a1b294e9828bfc8",
    "rand_s10": "f8dd0ef554ddd0d3f362d9291e031118",
    "rand_s11": "fbb6073f20b7b6a3a8d3dd89b275be93",
    "rand_s12": "f1a987920a3fc4c7fb96ad314c3040d6",
    "rand_s13": "8b7b123eca8998d3ca4d17040a532c42",
    "rand_s14": "7985627fb61ad2070ba019da23d8c0d4",
    "rand_s15": "355cc306e36fad73c8081234ce624f0a",
    "rand_s16": "faa19163ad6a29909223fa85b82f8171",
    "rand_s17": "93390b8875dadce42a793f340da17aae",
    "rand_s18": "74d4e396ea6a0dd923833b509d665cd0",
    "rand_s19": "72535c77560d089b8a43ac09392556ca",
    "pareto_s0": "e19f5d5d2fd8f518ed0c130c3c2b1d7c",
    "pareto_s1": "0ed3dd4a67347ed1e239d17666074060",
    "pareto_s2": "9b977a3935b69c2425dec23b3069ef54",
    "pareto_s3": "84191271fed0836001b87a3c4d2af1d4",
    "pareto_s4": "2ecc94fe10443d1f859636f91af7142a",
    "pareto_s5": "8af7c85aadcc9dbd99697335c2dfac5d",
    "pareto_s6": "66df437ceddbca15c4994df733689f74",
    "pareto_s7": "002b75990c3c0ea98e220161d2a4f4ea",
    "pareto_s8": "2f8c8724f3a7e35a6f7c657babe65358",
    "pareto_s9": "aebbfa3df8875b0e972c1b5333593760",
}


@pytest.mark.parametrize("name,v", _vectors(), ids=[n for n, _ in _vectors()])
def test_qmx_matches_reference_bytes(name, v):
    body = qmx._encode_full(v)
    assert hashlib.md5(body).hexdigest() == REFERENCE_MD5[name], name


@pytest.mark.parametrize("name,v", _vectors(), ids=[n for n, _ in _vectors()])
def test_qmx_roundtrip(name, v):
    enc = qmx.encode(v)
    buf = np.frombuffer(enc, np.uint8)
    dec, end = qmx.decode(buf, 0, 0, len(v))
    np.testing.assert_array_equal(dec, v)
    assert end == len(enc)


def test_qmx_randomized_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(200):
        v = rng.integers(
            0, rng.integers(1, 2 ** int(rng.integers(1, 33))),
            B, dtype=np.uint64).astype(np.uint32)
        buf = np.frombuffer(qmx.encode(v), np.uint8)
        dec, _ = qmx.decode(buf, 0, 0, B)
        np.testing.assert_array_equal(dec, v)


def test_qmx_partial_block_uses_interpolative():
    # n < block_size defers to interpolative coding, like the
    # reference wrapper (block_codecs.hpp:327-330)
    from dint_ray.codecs import interpolative

    v = np.sort(np.random.default_rng(3).integers(0, 50, 100)).astype(
        np.uint32)
    assert qmx.encode(v, int(v.sum())) == interpolative.encode(
        v, int(v.sum()))
