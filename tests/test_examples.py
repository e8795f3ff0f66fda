"""Smoke tests: the examples/ entry points run end-to-end (CPU mesh env,
tunnel-free subprocesses like tests/test_multichip.py)."""

import os
import subprocess
import sys

import pytest

import blazeseq_tpu as bt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return env


def _run(args, timeout=420):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, timeout=timeout, env=_env(), cwd=REPO)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    return r.stdout


def test_example_parser(tmp_path):
    buf = bytes(bt.generate_synthetic_fastq_buffer(50, 40, 90, 2, 40,
                                                   "sanger"))
    p = tmp_path / "t.fastq"
    p.write_bytes(buf)
    out = _run([os.path.join(REPO, "examples", "example_parser.py"), str(p)])
    assert "50 records" in out


def test_example_qc_report(tmp_path):
    buf = bytes(bt.generate_synthetic_fastq_buffer(200, 60, 60, 2, 40,
                                                   "sanger"))
    p = tmp_path / "t.fastq"
    p.write_bytes(buf)
    html = tmp_path / "t.html"
    out = _run([os.path.join(REPO, "examples", "qc_report.py"), str(p),
                str(html)])
    assert "reads=200" in out
    assert "bases=12000" in out
    assert html.exists() and "<svg" in html.read_text()


def test_example_analysis_panels():
    out = _run([os.path.join(REPO, "examples", "analysis_panels.py"), "500"])
    assert "adapter hit rate" in out
    assert "dup levels" in out
    assert "local adapter hit" in out


def test_example_nw_small():
    out = _run([os.path.join(REPO, "examples", "nw_tpu.py"),
                "2000", "40", "1024"])
    assert "Scores match" in out


def test_multihost_runner(tmp_path):
    buf = bytes(bt.generate_synthetic_fastq_buffer(300, 50, 50, 2, 40,
                                                   "sanger"))
    p = tmp_path / "t.fastq"
    p.write_bytes(buf)
    out = _run([os.path.join(REPO, "benchmark", "run_multihost.py"), str(p)])
    assert "GLOBAL: 300 15000" in out


def test_cli_commands(tmp_path):
    buf = bytes(bt.generate_synthetic_fastq_buffer(100, 50, 50, 2, 40,
                                                   "sanger"))
    fq = tmp_path / "c.fastq"
    fq.write_bytes(buf)
    fa = tmp_path / "c.fasta"
    fa.write_bytes(b">s1\nACGTACGT\nACGT\n>s2\nGGGG\n")

    def run(*args):
        r = subprocess.run([sys.executable, "-m", "blazeseq_tpu", *args],
                           capture_output=True, text=True, env=_env(),
                           cwd=REPO, timeout=420)
        assert r.returncode == 0, r.stderr[-1000:]
        return r.stdout.strip()

    assert run("count", str(fq)).endswith("100\t5000")
    assert run("fasta-count", str(fa)).endswith("2\t16")
    assert "2 sequences" in run("faidx", str(fa))
    assert run("fetch", str(fa), "s1", "2", "10") == "GTACGTAC"
    assert "reads=100" in run("stats", str(fq))

def test_example_ragged_align():
    out = _run([os.path.join(REPO, "examples", "ragged_align.py"), "3000"])
    assert "matches host exactly" in out
    assert "short-read tier" in out
    assert out.count("device == twin") == 6


def test_example_binned_quality(tmp_path):
    import numpy as np

    from blazeseq_tpu.ops.uniform_parse import detect_uniform_layout

    buf = bytes(bt.generate_synthetic_fastq_buffer(2000, 80, 80, 2, 40,
                                                   "sanger"))
    lay = detect_uniform_layout(buf)
    arr = np.frombuffer(buf, np.uint8).reshape(-1, lay.rs).copy()
    q = arr[:, lay.o3 + 1:lay.rs - 1].astype(np.int32) - 33
    lut, edges = np.array([2, 12, 23, 37]), np.array([7, 18, 30])
    arr[:, lay.o3 + 1:lay.rs - 1] = (lut[np.searchsorted(edges, q)]
                                     + 33).astype(np.uint8)
    p = tmp_path / "b.fastq"
    p.write_bytes(arr.tobytes())
    out = _run([os.path.join(REPO, "examples", "binned_quality.py"),
                str(p)])
    assert "reads=2000" in out
    assert "distinct phred values: [2, 12, 23, 37]" in out
    assert "eq-mode histogram sets used" in out


def test_example_random_access():
    out = _run([os.path.join(REPO, "examples", "random_access.py"), "3000"])
    assert "plain == bgzf record-for-record" in out
    assert out.rstrip().endswith("OK")
