"""Multi-chip sharding validation on a virtual 8-device CPU mesh.

Runs in a clean subprocess because the axon harness binds the real TPU at
interpreter start (see tests/conftest.py). Validates exactly what the driver
does: dryrun_multichip compiles + executes the full sharded analysis step
(shard_map over 'dp', psum-merged QC stats)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(n_devices: int):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % n_devices
    return env


def test_dryrun_multichip_8():
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(8), capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip OK" in r.stdout


def test_sharded_stats_match_single_device():
    """psum-merged global stats must equal the unsharded computation."""
    code = """
import numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as g
from blazeseq_tpu.fastq.quality import SANGER_SCHEMA
from blazeseq_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from blazeseq_tpu.parallel.pipeline import build_qc_align_step

pb, ref = g._example_batch(n_records=32, max_len=128, ref_len=16)
args_np = (np.asarray(pb.seq), np.asarray(pb.qual),
           np.asarray(pb.lengths).astype(np.int32))
scal = (jnp.int32(pb.n_records), jnp.asarray(ref),
        jnp.int32(SANGER_SCHEMA.LOWER), jnp.int32(SANGER_SCHEMA.UPPER),
        jnp.int32(SANGER_SCHEMA.OFFSET))

single = build_qc_align_step(None)(*map(jnp.asarray, args_np), *scal)
mesh = make_mesh(4)
sh, rep = batch_sharding(mesh), replicated(mesh)
sharded_args = [jax.device_put(jnp.asarray(a), sh) for a in args_np]
multi = build_qc_align_step(mesh)(*sharded_args, *scal)

for name, a, b in zip(single.stats._fields, single.stats, multi.stats):
    assert np.array_equal(np.asarray(a), np.asarray(b)), name
assert np.array_equal(np.asarray(single.nw_scores), np.asarray(multi.nw_scores))
assert np.array_equal(np.asarray(single.error_codes), np.asarray(multi.error_codes))
print("SHARDED_MATCH_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env=_clean_env(4), capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SHARDED_MATCH_OK" in r.stdout


def test_2d_mesh_dp_sp_matches_single_device():
    """dp x sp sharding (records x positions): every QCStats leaf must equal
    the unsharded computation exactly — scalars psum over both axes,
    per-position leaves reassemble across the sp axis."""
    code = """
import numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as g
from blazeseq_tpu.fastq.quality import SANGER_SCHEMA
from blazeseq_tpu.parallel.mesh import make_mesh_2d
from blazeseq_tpu.parallel.pipeline import build_qc_align_step
from jax.sharding import NamedSharding, PartitionSpec as P

pb, ref = g._example_batch(n_records=32, max_len=256, ref_len=16)
scal = (jnp.int32(pb.n_records), jnp.asarray(ref),
        jnp.int32(SANGER_SCHEMA.LOWER), jnp.int32(SANGER_SCHEMA.UPPER),
        jnp.int32(SANGER_SCHEMA.OFFSET))
args = (jnp.asarray(np.asarray(pb.seq)), jnp.asarray(np.asarray(pb.qual)),
        jnp.asarray(np.asarray(pb.lengths), dtype=jnp.int32))

single = build_qc_align_step(None, with_alignment=False)(*args, *scal)

mesh = make_mesh_2d(4, 2)
step = build_qc_align_step(mesh, with_alignment=False)
seq = jax.device_put(args[0], NamedSharding(mesh, P("dp", "sp")))
qual = jax.device_put(args[1], NamedSharding(mesh, P("dp", "sp")))
lengths = jax.device_put(args[2], NamedSharding(mesh, P("dp")))
res = step(seq, qual, lengths, *scal)

for name in single.stats._fields:
    a = np.asarray(getattr(single.stats, name))
    b = np.asarray(getattr(res.stats, name))
    assert np.array_equal(a, b), (name, a, b)
assert np.array_equal(np.asarray(single.error_codes),
                      np.asarray(res.error_codes))
assert np.array_equal(np.asarray(single.phred), np.asarray(res.phred))
print("2D MESH OK")
"""
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env=_clean_env(8), capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2D MESH OK" in r.stdout
