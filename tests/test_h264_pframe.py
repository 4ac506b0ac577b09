"""Closed-loop P-frame tests: GOP encode → decode → exact recon match."""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
from vcp_tpu.codec.h264 import pframe

from video_util import synth_video


def encode_gop(w, h, n, qp, gop):
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop_size=gop,
                                    effort=2))
    frames = synth_video(w, h, n)
    aus, recons = [], []
    for y, u, v in frames:
        au, is_idr = enc.encode_frame(y, u, v)
        aus.append((au, is_idr))
        recons.append(tuple(np.asarray(p) for p in enc.recon_planes))
    return enc, frames, aus, recons


def test_gop_encode_decode_exact_recon():
    w, h, n = 64, 48, 6
    enc, frames, aus, recons = encode_gop(w, h, n, qp=26, gop=3)
    assert [is_idr for _, is_idr in aus] == [True, False, False,
                                             True, False, False]
    dec = H264Decoder()
    stream = enc.headers_annexb() + b"".join(au for au, _ in aus)
    out = dec.decode_annexb(stream)
    assert len(out) == n
    for i, f in enumerate(out):
        ry, ru, rv = recons[i]
        np.testing.assert_array_equal(f.y, ry, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(f.u, ru, err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(f.v, rv, err_msg=f"frame {i} cr")


def test_pframe_quality_and_rate():
    w, h, n = 64, 48, 5
    enc, frames, aus, recons = encode_gop(w, h, n, qp=26, gop=n)
    i_size = len(aus[0][0])
    p_sizes = [len(au) for au, _ in aus[1:]]
    # the I frame must be fully predicted/coded, nowhere near raw size
    # (4x3 MBs x 384 B = 4608 B raw; the old I_PCM row 0 alone cost 1536 B)
    assert i_size < 1000, i_size
    # and P frames must stay cheap for moving-box content
    assert max(p_sizes) < 400, p_sizes
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb()
                            + b"".join(au for au, _ in aus))
    for i, f in enumerate(out):
        y = frames[i][0]
        assert psnr(f.y, y) > 30, (i, psnr(f.y, y))


def test_static_scene_all_skip():
    """A fully static scene after the IDR should collapse to skip runs."""
    w, h = 48, 48
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=30, gop_size=10))
    y = np.tile(np.linspace(40, 200, w, dtype=np.uint8), (h, 1))
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    au0, _ = enc.encode_frame(y, u, v)
    au1, is_idr = enc.encode_frame(y, u, v)
    assert not is_idr
    # a skip-only P slice is tiny: header + one skip_run + trailing bits
    assert len(au1) < 32, len(au1)
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb() + au0 + au1)
    np.testing.assert_array_equal(out[0].y, out[1].y)


def test_motion_is_tracked():
    """The moving box must yield nonzero MVs (not all-intra fallback)."""
    w, h, n = 64, 48, 3
    enc, frames, aus, _ = encode_gop(w, h, n, qp=26, gop=n)
    data = enc._last_p_data
    assert np.any(data["mv"] != 0)


def test_mv_pred_rules():
    mvs = np.zeros((3, 3, 2), np.int32)
    valid = np.ones((3, 3), bool)
    # interior median
    mvs[1, 0] = (4, 0)   # A for (1,1)
    mvs[0, 1] = (2, 2)   # B
    mvs[0, 2] = (0, 6)   # C
    assert pframe.mv_pred(mvs, valid, 1, 1, 3) == (2, 2)
    # first MB: everything unavailable → 0
    assert pframe.mv_pred(mvs, valid, 0, 0, 3) == (0, 0)
    # row 0, A available only → copies A
    mvs[0, 0] = (8, 8)
    assert pframe.mv_pred(mvs, valid, 1, 0, 3) == (8, 8)
    # skip mv: zero-neighbor rule
    mvs[1, 0] = (0, 0)
    assert pframe.skip_mv(mvs, valid, 1, 1, 3) == (0, 0)


def test_search_range_effort_ladder():
    rs = [pframe.search_range_for_effort(e) for e in range(10)]
    assert rs == sorted(rs)
    assert rs[0] >= 4 and rs[-1] <= 24


def test_subpel_closed_loop_exact_effort5():
    """effort>=5 enables quarter-pel; decoder must still match bit-for-bit."""
    w, h, n = 64, 48, 4
    from vcp_tpu.codec.h264 import pframe as pf
    assert pf.subpel_for_effort(5) and not pf.subpel_for_effort(4)
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=26, gop_size=n,
                                    effort=5))
    frames = synth_video(w, h, n)
    aus = enc.encode_gop(frames)
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb()
                            + b"".join(a for a, _ in aus))
    ry, ru, rv = (np.asarray(p) for p in enc.recon_planes)
    np.testing.assert_array_equal(out[-1].y, ry)
    np.testing.assert_array_equal(out[-1].u, ru)
    np.testing.assert_array_equal(out[-1].v, rv)
    # quarter-pel vectors actually used: inspect the per-frame path's mvs
    enc2 = H264Encoder(EncoderConfig(width=w, height=h, qp=26, gop_size=n,
                                     effort=5))
    for f in frames:
        enc2.encode_frame(*f)
    assert np.any(np.asarray(enc2._last_p_data["mv"]) % 4 != 0) or \
        np.any(np.asarray(enc2._last_p_data["mv"]) % 2 != 0)

def test_refine_half_stays_near_base_and_improves():
    """Regression: refine_half once walked its candidate bookkeeping away
    from the full-pel base while gathering predictions AT the base, so it
    assigned MVs whose prediction it never evaluated (recon dropped ~5 dB
    at medium preset). Pin both properties: (a) the refined MV is within
    one half-step of the full-pel optimum, (b) on true half-pel motion the
    chosen prediction SAD is no worse than full-pel's."""
    import jax.numpy as jnp
    from vcp_tpu.ops import motion as mops

    rng = np.random.default_rng(11)
    h, w = 96, 128
    hi = rng.normal(128, 50, (2 * h, 2 * w + 4))
    k = np.ones(5) / 5
    for ax in (0, 1):
        hi = np.apply_along_axis(lambda a: np.convolve(a, k, "same"), ax, hi)
    ref = np.clip(hi[0::2, 0:2 * w:2], 0, 255).astype(np.int32)
    cur = np.clip(hi[0::2, 1:1 + 2 * w:2], 0, 255).astype(np.int32)

    sr, lam = 4, 16
    pad = sr + 6
    margin = pad - 3
    planes = jnp.stack(mops.half_planes(
        jnp.pad(jnp.asarray(ref), pad, mode="edge")))
    mv_full, _ = mops.full_search(jnp.asarray(cur), jnp.asarray(ref), sr, lam)
    mvq = np.asarray(mops.refine_half(jnp.asarray(cur), planes,
                                      mv_full, lam, margin))
    assert np.all(np.abs(mvq - np.asarray(mv_full) * 4) <= 2)

    def sad(m):
        pred = np.asarray(mops.mc_luma_q(planes, jnp.asarray(m), margin))
        return np.abs(pred - cur).sum()

    assert sad(mvq) <= sad(np.asarray(mv_full) * 4)
    # content shifts by exactly half a pel: most MBs should pick dx frac 2
    assert (mvq[..., 1] % 4 == 2).mean() > 0.5

def test_intra_mb_inside_p_slice_decodes():
    """The decoder defers P-slice recon; intra MBs parsed mid-slice must
    reconstruct AFTER the inter pass (their neighbors are final by then).
    Our encoder never emits intra-in-P, so craft the slice by hand: one
    16x16 picture, P slice whose only MB is I16x16-DC."""
    from vcp_tpu.codec.h264 import entropy, frame_ops, headers as H
    from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
    from vcp_tpu.utils.bitstream import BitWriter, nal_unit

    w, h, qp = 16, 16, 26
    rng = np.random.default_rng(2)
    y1 = rng.integers(0, 255, (h, w), np.uint8)
    y2 = rng.integers(0, 255, (h, w), np.uint8)
    flat = np.full((8, 8), 128, np.uint8)

    # hand-built slice below uses CAVLC syntax -> pin the PPS to CAVLC
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop_size=2,
                                    cabac=False))
    idr, _ = enc.encode_frame(y1, flat, flat)

    # device-side intra math for the single MB (a 1-MB frame is exactly
    # the row-0 DC case: no neighbors, pred = 128)
    out = frame_ops.encode_iframe(y2.astype(np.int32), flat.astype(np.int32),
                                  flat.astype(np.int32), qp, qp)
    bw = BitWriter()
    H.write_slice_header(bw, enc.sp, enc.pp, is_idr=False, frame_num=1,
                         slice_qp=qp)
    bw.ue(0)                                   # mb_skip_run
    nz_y = entropy.NzContext(4, 4)
    nz_cb = entropy.NzContext(2, 2)
    nz_cr = entropy.NzContext(2, 2)
    entropy._write_i16_mb(
        bw, 0, 0,
        np.asarray(out["luma_dc"])[0, 0], np.asarray(out["luma_ac"])[0, 0],
        (np.asarray(out["cb_dc"])[0, 0], np.asarray(out["cr_dc"])[0, 0]),
        (np.asarray(out["cb_ac"])[0, 0], np.asarray(out["cr_ac"])[0, 0]),
        nz_y, nz_cb, nz_cr, slice_type_p=True, pred_mode=2, chroma_mode=0)
    bw.rbsp_trailing_bits()
    pnal = nal_unit(1, bw.to_bytes(), nal_ref_idc=2)  # NAL_SLICE_NONIDR

    dec = H264Decoder()
    frames = dec.decode_annexb(enc.headers_annexb() + idr + pnal)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[1].y,
                                  np.asarray(out["recon_y"]))
    np.testing.assert_array_equal(frames[1].u,
                                  np.asarray(out["recon_u"]))
