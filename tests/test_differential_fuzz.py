"""Differential fuzz: the native AVX-512 scan kernel vs the numpy fallback
on identical windows, byte-for-byte — including random corruptions.

The native path has three tiers (locked-layout group verify, per-record
speculation, bit-loop scan); any disagreement between tiers shows up as a
divergence from the branch-free numpy semantics. Offsets, consumed
positions, error codes, and error phases must match exactly; count mode
must agree with scan mode's accounting.
"""

import random

import numpy as np
import pytest

from blazeseq_tpu import native


def _scan_native(win, **kw):
    if not native.has_native():
        pytest.skip("native library unavailable")
    return native.scan_fastq(win, **kw)


def _scan_np(win, **kw):
    return native._scan_fastq_np(win, kw.get("start", 0), 2**62,
                                 kw.get("check_ascii", False),
                                 kw.get("check_quality", False),
                                 kw.get("q_lower", 33),
                                 kw.get("q_upper", 126))


def _compare(buf: bytes, check_ascii=False, check_quality=False):
    win = np.frombuffer(buf, dtype=np.uint8)
    kw = dict(check_ascii=check_ascii, check_quality=check_quality,
              q_lower=33, q_upper=73)
    a = _scan_native(win, **kw)
    b = native._scan_fastq_np(win, 0, 2**62, check_ascii, check_quality,
                              33, 73)
    assert a.err_code == b.err_code, (a.err_code, b.err_code)
    assert a.consumed == b.consumed
    assert len(a.offsets) == len(b.offsets)
    np.testing.assert_array_equal(np.asarray(a.offsets),
                                  np.asarray(b.offsets))
    if a.err_code == 0:
        assert a.err_phase == b.err_phase
    # count mode agrees with the scan accounting on clean prefixes
    recs, bases, consumed, err, phase = native.count_fastq(
        win, 0, check_ascii=check_ascii, check_quality=check_quality,
        q_lower=33, q_upper=73)
    if a.err_code == 0:
        assert recs == len(a.offsets)
        assert consumed == a.consumed
        if len(a.offsets):
            offs = np.asarray(a.offsets)
            assert bases == int((offs[:, 2] - offs[:, 1] - 1).sum())


def _mk(shapes, rng, qrange=(35, 73)):
    out = []
    for ident, n in shapes:
        seq = bytes(rng.choice(b"ACGT") for _ in range(n))
        qual = bytes(rng.randrange(*qrange) for _ in range(n))
        out.append(b"@" + ident + b"\n" + seq + b"\n+\n" + qual + b"\n")
    return b"".join(out)


@pytest.mark.parametrize("seed", range(8))
def test_clean_corpora_agree(seed):
    rng = random.Random(seed)
    style = seed % 4
    if style == 0:  # uniform (tier-1 territory)
        shapes = [(b"u%05d" % i, 96) for i in range(400)]
    elif style == 1:  # width jumps
        shapes = [(b"r%d" % i, 50 + (i % 7) * 13) for i in range(400)]
    elif style == 2:  # random everything
        shapes = [(bytes(rng.choice(b"abcXYZ") for _ in
                         range(rng.randint(1, 30))), rng.randint(1, 200))
                  for _ in range(300)]
    else:  # tiny reads
        shapes = [(b"t%d" % i, 1 + (i % 3)) for i in range(500)]
    buf = _mk(shapes, rng)
    for ca, cq in ((False, False), (True, False), (True, True)):
        _compare(buf, ca, cq)


@pytest.mark.parametrize("seed", range(12))
def test_corrupted_corpora_agree(seed):
    """Random single-byte corruptions anywhere in the stream: both paths
    must report the identical (err_code, consumed, offsets) outcome."""
    rng = random.Random(1000 + seed)
    shapes = [(b"c%04d" % i, 64) for i in range(250)]
    buf = bytearray(_mk(shapes, rng))
    for _ in range(10):
        i = rng.randrange(len(buf))
        buf[i] = rng.randrange(256)
        for ca, cq in ((False, False), (True, True)):
            _compare(bytes(buf), ca, cq)


def test_truncations_agree():
    rng = random.Random(7)
    shapes = [(b"z%03d" % i, 80) for i in range(50)]
    buf = _mk(shapes, rng)
    for cut in (1, 7, 80, 81, 85, 165, 166, 170, len(buf) - 1):
        _compare(buf[:cut])
        _compare(buf[:len(buf) - cut])
