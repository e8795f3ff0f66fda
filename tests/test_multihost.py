"""True multi-process (multi-host-shaped) QC: two jax.distributed CPU
processes parse disjoint record-boundary file shards and must both arrive at
identical merged global stats, equal to a single-process run over the whole
file (SURVEY §2.5 TPU-native equivalent: per-host input shards + cross-host
stat merge)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
from blazeseq_tpu.parallel.multihost import init_distributed, run_multihost_qc
init_distributed()
stats, reads, bases = run_multihost_qc(%(path)r, batch_records=512,
                                       max_len=192,
                                       reference=b"GATTACAGATTACAGATTACA")
qc = stats["qc"]
print("RESULT " + json.dumps({
    "pid": int(os.environ["JAX_PROCESS_ID"]),
    "local_reads": reads, "local_bases": bases,
    "g_reads": int(qc.reads), "g_bases": int(qc.bases),
    "g_base_counts": [int(x) for x in qc.base_counts],
    "g_nw_sum": int(stats["nw_sum"]), "g_nw_count": int(stats["nw_count"]),
}))
"""


_ALLREDUCE_WORKER = r"""
import json, os, sys
import numpy as np
sys.path.insert(0, %(repo)r)
from blazeseq_tpu.parallel.multihost import init_distributed, _allreduce_stats
init_distributed()
pid = int(os.environ["JAX_PROCESS_ID"])
local = {
    "big": np.int64(3) << np.int64(40),          # far beyond int32 per host
    "neg": np.int64(-(5 << 35)) + np.int64(pid),
    "vec": (np.arange(6, dtype=np.int64) << np.int64(33)) + np.int64(pid),
    "small": np.int32(7 + pid),                  # int32 leaves widen exactly
    "f": np.float32(0.5),
}
merged = _allreduce_stats(local)
print("RESULT " + json.dumps({
    "pid": pid,
    "big": int(merged["big"]),
    "neg": int(merged["neg"]),
    "vec": [int(x) for x in merged["vec"]],
    "small": int(merged["small"]),
    "f": float(merged["f"]),
}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _env(pid, nproc, port):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:%d" % port
    env["JAX_NUM_PROCESSES"] = str(nproc)
    env["JAX_PROCESS_ID"] = str(pid)
    return env


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    import blazeseq_tpu as bt

    buf = bytes(bt.generate_synthetic_fastq_buffer(3000, 40, 160, 2, 40,
                                                   "sanger"))
    p = tmp_path_factory.mktemp("mh") / "mh.fastq"
    p.write_bytes(buf)
    return str(p), buf


def _single_process_golden(path):
    code = _WORKER % {"repo": REPO, "path": path}
    r = subprocess.run([sys.executable, "-c", code],
                       env=_env(0, 1, _free_port()), capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")][0]
    return json.loads(line[len("RESULT "):])


def test_two_process_merge_equals_single(corpus_file):
    path, buf = corpus_file
    golden = _single_process_golden(path)
    assert golden["g_reads"] == 3000

    port = _free_port()
    code = _WORKER % {"repo": REPO, "path": path}
    procs = [
        subprocess.Popen([sys.executable, "-c", code],
                         env=_env(pid, 2, port), stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))

    # both processes see the same merged global stats (incl. NW alignment)
    for r in results:
        assert r["g_reads"] == golden["g_reads"]
        assert r["g_bases"] == golden["g_bases"]
        assert r["g_base_counts"] == golden["g_base_counts"]
        assert r["g_nw_sum"] == golden["g_nw_sum"]
        assert r["g_nw_count"] == golden["g_nw_count"] == 3000
    # shards are disjoint and complete
    assert results[0]["local_reads"] + results[1]["local_reads"] == 3000
    assert (results[0]["local_bases"] + results[1]["local_bases"]
            == golden["g_bases"])
    assert results[0]["local_reads"] > 0 and results[1]["local_reads"] > 0


def test_four_process_int64_merge_exact():
    """The cross-process stat merge must be exact far beyond int32: each of
    4 processes contributes values around 2^40-2^42 (and negatives), and
    every process must see the bit-exact int64 global sum (multihost.py
    gathers int32 hi/lo halves and reassembles host-side)."""
    nproc = 4
    port = _free_port()
    code = _ALLREDUCE_WORKER % {"repo": REPO}
    procs = [
        subprocess.Popen([sys.executable, "-c", code],
                         env=_env(pid, nproc, port), stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))
    exp_big = nproc * (3 << 40)
    exp_neg = nproc * -(5 << 35) + sum(range(nproc))
    exp_vec = [nproc * (i << 33) + sum(range(nproc)) for i in range(6)]
    exp_small = nproc * 7 + sum(range(nproc))
    for r in results:
        assert r["big"] == exp_big
        assert r["neg"] == exp_neg
        assert r["vec"] == exp_vec
        assert r["small"] == exp_small
        assert r["f"] == pytest.approx(nproc * 0.5)
