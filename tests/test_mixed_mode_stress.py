"""Property-based mixed-mode stress: random interleavings of every parser
consumption API must serve each record exactly once, in order, against a
model parse — the strongest form of the cursor-exactness guarantees
(views/records iterators, next_batch, next_padded, bucketed, count)."""

import random

import numpy as np
import pytest

import blazeseq_tpu as bt


def _model(buf):
    recs = []
    lines = buf.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    for i in range(0, len(lines), 4):
        recs.append((lines[i][1:].strip(), lines[i + 1], lines[i + 3]))
    return recs


def _corpus(rng, n):
    out = []
    for i in range(n):
        L = rng.randint(1, 180)
        seq = bytes(rng.choice(b"ACGT") for _ in range(L))
        out.append(b"@m%d x\n%s\n+\n%s\n" % (i, seq, b"I" * L))
    return b"".join(out)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_interleaving_serves_each_record_once(seed):
    rng = random.Random(seed)
    n = 600
    buf = _corpus(rng, n)
    golden = _model(buf)
    p = bt.FastqParser(bt.MemoryReader(buf))
    served = []
    it_views = None
    it_records = None
    while True:
        op = rng.randrange(7)
        try:
            if op == 0:  # single view
                v = p.next_view()
                served.append((bytes(v.id_bytes()), bytes(v.sequence_bytes()),
                               bytes(v.quality_bytes())))
            elif op == 1:  # single owned record
                r = p.next_record()
                served.append((r.id_bytes(), r.sequence_bytes(),
                               r.quality_bytes()))
            elif op == 2:  # a few from a (possibly reused) views iterator
                if it_views is None:
                    it_views = p.views()
                for _ in range(rng.randint(1, 5)):
                    v = next(it_views)
                    served.append((bytes(v.id_bytes()),
                                   bytes(v.sequence_bytes()),
                                   bytes(v.quality_bytes())))
            elif op == 3:  # a few from a records iterator
                if it_records is None:
                    it_records = p.records()
                for _ in range(rng.randint(1, 5)):
                    r = next(it_records)
                    served.append((r.id_bytes(), r.sequence_bytes(),
                                   r.quality_bytes()))
            elif op == 4:  # SoA batch
                b = p.next_batch(rng.randint(1, 40))
                for i in range(len(b)):
                    r = b.get_record(i)
                    served.append((r.id_bytes(), r.sequence_bytes(),
                                   r.quality_bytes()))
                if len(b) == 0 and not p.has_more():
                    break
            elif op == 5:  # padded batch (ids not carried: verify seq/qual)
                pb = p.next_padded(rng.randint(1, 40), max_len=192)
                for i in range(pb.n_records):
                    L = int(pb.lengths[i])
                    k = len(served)
                    exp_id, exp_seq, exp_qual = golden[k]
                    assert bytes(pb.seq[i, :L].tobytes()) == exp_seq
                    assert bytes(pb.qual[i, :L].tobytes()) == exp_qual
                    served.append(golden[k])
                if pb.n_records == 0 and not p.has_more():
                    break
            else:  # probe has_more (no consumption)
                p.has_more()
        except (bt.FastxEOFError, StopIteration):
            if not p.has_more():
                break
            # an iterator hit a scan boundary; keep going with other ops
            it_views = it_records = None
    assert served == golden, (
        "served %d vs %d" % (len(served), len(golden)))


def test_count_after_partial_consumption():
    rng = random.Random(9)
    buf = _corpus(rng, 300)
    golden = _model(buf)
    p = bt.FastqParser(bt.MemoryReader(buf))
    it = p.views()
    for _ in range(57):
        next(it)
    p.next_batch(43)
    records, bases = p.count()
    assert records == 300 - 57 - 43
    assert bases == sum(len(s) for _, s, _ in golden[100:])
