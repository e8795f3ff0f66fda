"""Paired-end reading (beyond the reference, whose TODO lists it)."""

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu import PairedFastqParser, PairSyncError


def _mates(n, with_suffix=True, skew=False):
    r1, r2 = [], []
    for i in range(n):
        sfx1, sfx2 = ("/1", "/2") if with_suffix else ("", "")
        r1.append(b"@p%d%s extra1\nACGT\n+\nIIII\n" % (i, sfx1.encode()))
        r2.append(b"@p%d%s extra2\nTTGG\n+\nJJJJ\n" % (i, sfx2.encode()))
    if skew:
        r2.pop()
    return b"".join(r1), b"".join(r2)


def test_pairs_iteration_and_id_check():
    a, b = _mates(50)
    p = PairedFastqParser(bt.MemoryReader(a), bt.MemoryReader(b))
    pairs = list(p.pairs())
    assert len(pairs) == 50
    assert pairs[0][0].id() == "p0/1 extra1"
    assert pairs[0][1].sequence() == "TTGG"


def test_id_mismatch_raises():
    a, _ = _mates(3)
    _, b = _mates(3)
    b = b.replace(b"@p1/2", b"@zz/2")
    p = PairedFastqParser(bt.MemoryReader(a), bt.MemoryReader(b))
    with pytest.raises(PairSyncError):
        list(p.pairs())


def test_skewed_files_raise():
    a, b = _mates(4, skew=True)
    p = PairedFastqParser(bt.MemoryReader(a), bt.MemoryReader(b))
    with pytest.raises(PairSyncError):
        list(p.pairs())
    a, b = _mates(4, skew=True)
    with pytest.raises(PairSyncError):
        PairedFastqParser(bt.MemoryReader(a), bt.MemoryReader(b)).count()


def test_padded_pair_batches_aligned():
    import numpy as np
    a, b = _mates(130)
    p = PairedFastqParser(bt.MemoryReader(a), bt.MemoryReader(b))
    n = 0
    for pb1, pb2 in p.padded_pair_batches(32, max_len=128):
        assert pb1.n_records == pb2.n_records
        assert bytes(pb1.seq[0, :4].tobytes()) == b"ACGT"
        assert bytes(pb2.seq[0, :4].tobytes()) == b"TTGG"
        n += pb1.n_records
    assert n == 130


def test_count():
    a, b = _mates(20)
    p = PairedFastqParser(bt.MemoryReader(a), bt.MemoryReader(b))
    assert p.count() == (20, 80, 80)
