"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax

from vcp_tpu.codec.h264.gop_ops import encode_pchunk
from vcp_tpu.parallel.mesh import encode_pchunk_sharded, make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["data"] * mesh.shape["tile"] == 8


_SHARDED_CHECK = r"""
import numpy as np
import jax
from vcp_tpu.codec.h264.gop_ops import encode_pchunk
from vcp_tpu.parallel.mesh import encode_pchunk_sharded, make_mesh

mesh = make_mesh(8)
rng = np.random.default_rng(3)
t = mesh.shape["tile"]
b = mesh.shape["data"]
n = 3
h, w = 32 * t, 64
qp, qpc, sr, lam = 26, 26, 4, 4
ys = rng.integers(0, 256, (b, n, h, w)).astype(np.int32)
us = rng.integers(0, 256, (b, n, h // 2, w // 2)).astype(np.int32)
vs = rng.integers(0, 256, (b, n, h // 2, w // 2)).astype(np.int32)
ref_y = np.roll(ys[:, 0], (0, 2, -1), (0, 1, 2)).astype(np.int32)
ref_u = np.roll(us[:, 0], (0, 1, 1), (0, 1, 2)).astype(np.int32)
ref_v = np.roll(vs[:, 0], (0, 1, 1), (0, 1, 2)).astype(np.int32)
for subpel, deblock in ((0, False), (1, True), (2, True)):
    packed_s, ry_s, ru_s, rv_s = encode_pchunk_sharded(
        mesh, ys, us, vs, ref_y, ref_u, ref_v, qp, qpc, sr, lam,
        subpel=subpel, deblock=deblock)
    packed_s, ry_s, ru_s, rv_s = map(np.asarray,
                                     (packed_s, ry_s, ru_s, rv_s))
    for i in range(b):
        packed1, ry1, ru1, rv1 = encode_pchunk(
            ys[i], us[i], vs[i], ref_y[i], ref_u[i], ref_v[i],
            qp, qpc, sr, lam, deblock, subpel)
        np.testing.assert_array_equal(packed_s[i], np.asarray(packed1))
        np.testing.assert_array_equal(ry_s[i], np.asarray(ry1))
        np.testing.assert_array_equal(ru_s[i], np.asarray(ru1))
        np.testing.assert_array_equal(rv_s[i], np.asarray(rv1))
    print(f"OK subpel={subpel} deblock={deblock}")
"""


def test_sharded_pchunk_bit_identical():
    """The band-sharded production P step (full sub-pel ladder, chroma,
    decimation, deblock) must be BIT-identical to the single-chip
    encode_pchunk — the sharded path IS the production path.

    Runs in a fresh subprocess (like the driver's dryrun_multichip): the
    8-virtual-device shard_map compile occasionally segfaults XLA:CPU
    when launched from a long-lived session with accumulated state."""
    import os
    import subprocess
    import sys

    env = dict(os.environ,
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"),
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__)))]
                   + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu')\n"
         + _SHARDED_CHECK],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert r.stdout.count("OK") == 3


def test_graft_entry_and_dryrun():
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out["recon_y"].shape == args[0].shape
    # the dryrun bootstraps its own 8 virtual devices — run it exactly
    # as the driver does, in a fresh process
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=800, cwd=root,
        env=dict(os.environ, PYTHONPATH=root))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "dryrun_multichip OK" in r.stdout


def test_mesh_executor_bitstream_identical():
    """Round-4 verdict item 7: the consumer executor on a multi-device
    mesh (VCP_MESH) must produce a BYTE-identical output file to the
    single-device path — the sharded step is the same math, the sparse/
    delta fetch machinery it bypasses is lossless repackaging. Runs in a
    fresh subprocess (8 virtual CPU devices) like the other mesh tests."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r"""
import jax; jax.config.update('jax_platforms', 'cpu')
import os, sys, tempfile
sys.path.insert(0, %r); sys.path.insert(0, %r)
from video_util import synth_video
from vcp_tpu.codec.y4m import write_y4m
from vcp_tpu.pipeline import executor
d = tempfile.mkdtemp()
src = os.path.join(d, 'in.y4m')
write_y4m(src, synth_video(96, 128, 10), fps_num=30)   # 8 MB rows
args = '-c:v libx264 -crf 28 -movflags +faststart'
os.environ['VCP_MESH'] = '0'
executor.execute(src, os.path.join(d, 'single.mp4'), args, timeout=600)
os.environ['VCP_MESH'] = '8'
executor.execute(src, os.path.join(d, 'mesh.mp4'), args, timeout=600)
a = open(os.path.join(d, 'single.mp4'), 'rb').read()
b = open(os.path.join(d, 'mesh.mp4'), 'rb').read()
assert len(a) > 0 and a == b, (len(a), len(b))
print('MESH-EXEC OK')
""" % (root, os.path.join(root, "tests"))
    env = dict(os.environ,
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"),
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [root] + os.environ.get("PYTHONPATH", "").split(
                       os.pathsep)))
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=900,
                       env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "MESH-EXEC OK" in r.stdout
