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


def _interleave(n, odd_tail=False, mismatch_at=None):
    out = []
    for i in range(n):
        id2 = i if mismatch_at is None or i != mismatch_at else i + 1000
        out.append(b"@p%d/1 c1\nACGT\n+\nIIII\n" % i)
        out.append(b"@p%d/2 c2\nTTGGCA\n+\nJJJJJJ\n" % id2)
    if odd_tail:
        out.append(b"@p%d/1 c1\nACGT\n+\nIIII\n" % n)
    return b"".join(out)


def test_interleaved_pairs_and_count():
    from blazeseq_tpu import InterleavedFastqParser

    p = InterleavedFastqParser(bt.MemoryReader(_interleave(8)))
    got = list(p.pairs())
    assert len(got) == 8
    assert got[0][0].id_bytes().startswith(b"p0/1")
    assert got[0][1].id_bytes().startswith(b"p0/2")
    p2 = InterleavedFastqParser(bt.MemoryReader(_interleave(8)))
    assert p2.count() == (8, 8 * 10)


def test_interleaved_id_mismatch_and_odd_tail_raise():
    from blazeseq_tpu import InterleavedFastqParser

    p = InterleavedFastqParser(bt.MemoryReader(
        _interleave(6, mismatch_at=3)))
    with pytest.raises(PairSyncError):
        list(p.pairs())
    p2 = InterleavedFastqParser(bt.MemoryReader(
        _interleave(4, odd_tail=True)))
    with pytest.raises(PairSyncError):
        list(p2.pairs())
    p3 = InterleavedFastqParser(bt.MemoryReader(
        _interleave(4, odd_tail=True)))
    with pytest.raises(PairSyncError):
        p3.count()


def test_interleaved_padded_pair_batches_deinterleave():
    import numpy as np

    from blazeseq_tpu import InterleavedFastqParser

    p = InterleavedFastqParser(bt.MemoryReader(_interleave(10)))
    batches = list(p.padded_pair_batches(max_records=4, max_len=16))
    assert sum(pb1.n_records for pb1, _ in batches) == 10
    for pb1, pb2 in batches:
        assert pb1.n_records == pb2.n_records
        for k in range(pb1.n_records):
            assert bytes(np.asarray(pb1.seq)[k, :4].tobytes()) == b"ACGT"
            assert bytes(np.asarray(pb2.seq)[k, :6].tobytes()) == b"TTGGCA"
            assert int(pb1.lengths[k]) == 4
            assert int(pb2.lengths[k]) == 6


def test_interleaved_padded_pad_records_to():
    from blazeseq_tpu import InterleavedFastqParser

    p = InterleavedFastqParser(bt.MemoryReader(_interleave(3)))
    (pb1, pb2), = list(p.padded_pair_batches(max_records=8, max_len=16,
                                             pad_records_to=8))
    assert pb1.n_records == 3 and pb2.n_records == 3
    assert pb1.seq.shape[0] == 8 and pb2.seq.shape[0] == 8


def test_batch_deinterleave():
    import numpy as np

    buf = _interleave(7)  # 14 records
    b = bt.FastqParser(bt.MemoryReader(buf)).next_batch(100)
    b1, b2 = b.deinterleave()
    assert b1.num_records() == 7 and b2.num_records() == 7
    for k in range(7):
        assert b1.get_record(k).id_bytes() == b"p%d/1 c1" % k
        assert b1.get_record(k).sequence_bytes() == b"ACGT"
        assert b2.get_record(k).id_bytes() == b"p%d/2 c2" % k
        assert b2.get_record(k).sequence_bytes() == b"TTGGCA"
        assert b2.get_record(k).quality_bytes() == b"JJJJJJ"
    with pytest.raises(ValueError):
        bt.FastqParser(bt.MemoryReader(
            _interleave(2, odd_tail=True))).next_batch(100).deinterleave()
