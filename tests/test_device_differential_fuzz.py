"""Differential fuzz at the MODEL level: run_file_device vs run_file.

Random corpus shapes — read-length ranges straddling max_read_len, uniform
vs variable ids, gzip, mid-file corruption — must produce byte-identical
reports from the device pipeline (uniform template / ragged engine /
chained host fallback) and the pure host pipeline. This complements
tests/test_differential_fuzz.py (scan-kernel level) one layer up, where
the chunking, tail-carry, and fallback-chaining decisions live.
"""

import gzip
import random

import numpy as np
import pytest

pytest.importorskip("jax")

import blazeseq_tpu as bt
from blazeseq_tpu.models.qc import QCModel


def _reports_equal(a, b):
    da, db = a.to_dict(), b.to_dict()
    assert set(da) == set(db)
    for k in da:
        va, vb = da[k], db[k]
        if isinstance(va, float):
            assert va == pytest.approx(vb, rel=1e-12), k
        elif isinstance(va, list):
            assert np.allclose(np.asarray(va, dtype=np.float64),
                               np.asarray(vb, dtype=np.float64)), k
        else:
            assert va == vb, k


def _corpus(rng: random.Random) -> bytes:
    n = rng.randint(120, 900)
    lo = rng.choice([8, 30, 60, 100, 140, 200])
    hi = lo + rng.choice([0, 3, 40, 150, 400])
    seed = rng.randint(0, 1 << 30)
    if rng.random() < 0.5:
        buf = bytes(bt.generate_variable_id_fastq_buffer(
            n, lo, max(hi, lo + 1), 2, 40, "sanger", seed=seed))
    else:
        buf = bytes(bt.generate_synthetic_fastq_buffer(
            n, lo, max(hi, lo + 1), 2, 40, "sanger"))
    if rng.random() < 0.3:  # corrupt one byte mid-file
        b = bytearray(buf)
        b[rng.randrange(len(b) // 4, 3 * len(b) // 4)] = \
            rng.choice([0, 7, 200, 255])
        buf = bytes(b)
    return buf


@pytest.mark.parametrize("seed", range(8))
def test_device_vs_host_reports(tmp_path, seed):
    rng = random.Random(seed * 7919 + 13)
    buf = _corpus(rng)
    path = tmp_path / ("f%d.fastq" % seed)
    gz = rng.random() < 0.35
    if gz:
        path = tmp_path / ("f%d.fastq.gz" % seed)
        path.write_bytes(gzip.compress(buf, 1))
    else:
        path.write_bytes(buf)
    width = rng.choice([64, 128, 256])
    chunk_mb = 1
    mk = lambda: QCModel(quality_schema="sanger", check_ascii=True,
                         check_quality=True, max_read_len=width)
    dev = mk().run_file_device(str(path), chunk_mb=chunk_mb)
    host = mk().run_file(str(path))
    _reports_equal(dev, host)
