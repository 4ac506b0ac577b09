"""CABAC engine: roundtrip + adaptivity + table invariants.

The arithmetic core is shared by H.264 (9.3) and HEVC; closed-loop
roundtrip proves encoder/decoder consistency, and the compression test
proves the adaptive contexts actually approach source entropy (a codec
that roundtrips but doesn't compress is a broken state machine)."""

import math
import random

import pytest

from vcp_tpu.codec.cabac import (CabacDecoder, CabacEncoder, Context,
                                 validate_tables)


def test_table_invariants():
    validate_tables()


def _roundtrip(bins, ctx_ids, n_ctx, qp=26):
    encs = [Context.from_init_hevc(154, qp) for _ in range(n_ctx)]
    enc = CabacEncoder()
    for b, c in zip(bins, ctx_ids):
        enc.encode(encs[c], b)
    enc.encode_terminate(1)
    data = enc.flush()

    decs = [Context.from_init_hevc(154, qp) for _ in range(n_ctx)]
    dec = CabacDecoder(data)
    out = [dec.decode(decs[c]) for c in ctx_ids]
    assert dec.decode_terminate() == 1
    return out, data


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_random_bins(seed):
    rng = random.Random(seed)
    n = 5000
    bins = [rng.randint(0, 1) for _ in range(n)]
    ctx_ids = [rng.randrange(8) for _ in range(n)]
    out, _ = _roundtrip(bins, ctx_ids, 8)
    assert out == bins


def test_roundtrip_bypass_and_context_mix():
    rng = random.Random(7)
    ctx_e = Context.from_init_hevc(139, 30)
    enc = CabacEncoder()
    trace = []
    for _ in range(3000):
        kind = rng.randrange(3)
        b = rng.randint(0, 1)
        if kind == 0:
            enc.encode(ctx_e, b)
        elif kind == 1:
            enc.encode_bypass(b)
        else:
            b = rng.randrange(256)
            enc.encode_bypass_bits(b, 8)
        trace.append((kind, b))
    enc.encode_terminate(1)
    data = enc.flush()

    ctx_d = Context.from_init_hevc(139, 30)
    dec = CabacDecoder(data)
    for kind, b in trace:
        if kind == 0:
            assert dec.decode(ctx_d) == b
        elif kind == 1:
            assert dec.decode_bypass() == b
        else:
            assert dec.decode_bypass_bits(8) == b
    assert dec.decode_terminate() == 1


def test_adaptive_compression_approaches_entropy():
    """A p=0.05 bernoulli source has H = 0.286 bits/bin; one adaptive
    context must land well under 0.45 bits/bin (and far under the 1.0 a
    non-adaptive coder would need)."""
    rng = random.Random(3)
    p = 0.05
    n = 20000
    bins = [1 if rng.random() < p else 0 for _ in range(n)]
    ctx = Context.from_init_hevc(154, 26)
    enc = CabacEncoder()
    for b in bins:
        enc.encode(ctx, b)
    enc.encode_terminate(1)
    bits_per_bin = 8 * len(enc.flush()) / n
    h = -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
    assert bits_per_bin < h + 0.16, (bits_per_bin, h)


def test_bypass_costs_one_bit():
    rng = random.Random(5)
    n = 8000
    bins = [rng.randint(0, 1) for _ in range(n)]
    enc = CabacEncoder()
    for b in bins:
        enc.encode_bypass(b)
    enc.encode_terminate(1)
    assert abs(8 * len(enc.flush()) / n - 1.0) < 0.02


def test_terminate_zero_path():
    """Terminate bins with value 0 (not end of slice) must roundtrip."""
    ctx_e = Context.from_init_hevc(154, 26)
    enc = CabacEncoder()
    for i in range(100):
        enc.encode(ctx_e, i & 1)
        enc.encode_terminate(0)
    enc.encode_terminate(1)
    data = enc.flush()
    ctx_d = Context.from_init_hevc(154, 26)
    dec = CabacDecoder(data)
    for i in range(100):
        assert dec.decode(ctx_d) == (i & 1)
        assert dec.decode_terminate() == 0
    assert dec.decode_terminate() == 1


def test_context_init_matches_qp_dependence():
    """Higher QP shifts the initial probability (spec 9.3.1.1): states
    derived at different QPs from a slope-carrying initValue differ."""
    a = Context.from_init_hevc(200, 20)
    b = Context.from_init_hevc(200, 40)
    assert (a.state, a.mps) != (b.state, b.mps)
