"""Regression tests for review findings: mixed iterator/direct usage,
reuse-buffer padding hygiene on the numpy fallback, and LineIterator
capacity enforcement in the parity APIs."""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu import LineIterator
from blazeseq_tpu.errors import ParseError


def _corpus(n=6, L=4):
    return b"".join(
        b"@r%d\n%s\n+\n%s\n" % (i, bytes([65 + i % 4]) * L, b"I" * L)
        for i in range(n))


def test_mixed_views_iterator_and_next_batch_no_duplicates():
    buf = _corpus(6)
    p = bt.FastqParser(bt.MemoryReader(buf))
    it = p.views()
    first = bytes(next(it).id_bytes())
    batch = p.next_batch(2)  # consumes r1, r2
    batch_ids = [batch.get_record(i).id_bytes() for i in range(len(batch))]
    rest = [bytes(v.id_bytes()) for v in it]
    assert first == b"r0"
    assert batch_ids == [b"r1", b"r2"]
    assert rest == [b"r3", b"r4", b"r5"]


def test_mixed_records_iterator_and_next_view_no_duplicates():
    buf = _corpus(6)
    p = bt.FastqParser(bt.MemoryReader(buf))
    it = p.records()
    assert next(it).id() == "r0"
    assert bytes(p.next_view().id_bytes()) == b"r1"
    assert [r.id() for r in it] == ["r2", "r3", "r4", "r5"]


def test_mixed_usage_without_native(monkeypatch):
    from blazeseq_tpu import native
    monkeypatch.setattr(native, "records_ext", lambda: None)
    buf = _corpus(5)
    p = bt.FastqParser(bt.MemoryReader(buf))
    it = p.records()
    assert next(it).id() == "r0"
    p.next_batch(2)
    assert [r.id() for r in it] == ["r3", "r4"]


def test_reused_padded_buffers_zero_padding_numpy_fallback(monkeypatch):
    """Second batch's rows must not leak bytes from a longer first batch."""
    from blazeseq_tpu import native
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    long_then_short = (b"@a\n" + b"A" * 12 + b"\n+\n" + b"J" * 12 + b"\n"
                       + b"@b\nACGT\n+\nIIII\n")
    p = bt.FastqParser(bt.MemoryReader(long_then_short))
    batches = list(p.padded_batches(1, max_len=16, reuse_buffers=True))
    assert len(batches) == 2
    pb = batches[-1]  # only the LAST batch is valid after iteration
    assert bytes(pb.seq[0, :4].tobytes()) == b"ACGT"
    assert bytes(pb.seq[0, 4:].tobytes()) == b"\x00" * 12
    assert bytes(pb.qual[0, 4:].tobytes()) == b"\x00" * 12


def test_read_exact_and_peek_respect_capacity():
    data = b"x" * 1000
    it = LineIterator(bt.MemoryReader(data), capacity=64)
    with pytest.raises(ParseError):
        it.read_exact(500)
    with pytest.raises(ParseError):
        it.peek(500)
    # growth enabled: allowed up to max_capacity
    it2 = LineIterator(bt.MemoryReader(data), capacity=64,
                       growth_enabled=True, max_capacity=2048)
    assert len(it2.read_exact(500)) == 500


def test_file_position_updates_in_parity_apis():
    it = LineIterator(bt.MemoryReader(b"aa\nbb\ncc\n"))
    it.next_complete_line()
    it.next_complete_line()
    assert it.get_file_position() == 3  # position of the line just served
    it.read_exact(3)  # consumes "cc\n"
    assert it.get_file_position() == 6


def test_records_ext_rejects_corrupt_offsets():
    from blazeseq_tpu import native
    ext = native.records_ext()
    if ext is None:
        pytest.skip("no C extension")
    from blazeseq_tpu.fastq.record import FastqRecord
    buf = np.frombuffer(b"@a\nAC\n+\nII\n", dtype=np.uint8)
    bad = np.array([[0, 1, 1, 1, 1]], dtype=np.int64)  # p == s etc.
    epoch = np.zeros(1, dtype=np.int64)
    progress = np.zeros(1, dtype=np.int64)
    calls = []

    def refill(served):
        if calls:
            return None
        calls.append(1)
        return (memoryview(buf), bad, 1, int(epoch[0]))

    it = ext.make_chain_iter(refill, epoch, progress, 33, FastqRecord, False)
    with pytest.raises(ValueError):
        next(it)


def test_next_batch_enforces_buffer_capacity():
    """The fused native batch path must honor the same capacity contract as
    next_record/next_padded (huge records raise, never grow unbounded)."""
    big = b"@r\n" + b"A" * (3 << 20) + b"\n+\n" + b"I" * (3 << 20) + b"\n"

    class Chunky:
        def __init__(self, data):
            self._d = memoryview(data)
            self._i = 0

        def readinto(self, mv):
            n = min(len(mv), 1 << 16, len(self._d) - self._i)
            mv[:n] = self._d[self._i : self._i + n]
            self._i += n
            return n

        def close(self):
            pass

    cfg = bt.ParserConfig(buffer_capacity=1 << 20,
                          buffer_growth_enabled=False)
    p = bt.FastqParser(Chunky(big), config=cfg)
    with pytest.raises(ParseError) as ei:
        p.next_batch(4)
    assert "capacity" in str(ei.value)
    cfg2 = bt.ParserConfig(buffer_capacity=1 << 18,
                           buffer_growth_enabled=True,
                           buffer_max_capacity=1 << 20)
    p2 = bt.FastqParser(Chunky(big), config=cfg2)
    with pytest.raises(ParseError):
        p2.next_batch(4)


def test_to_padded_max_len_is_a_hard_cap():
    """max_len fixes the width (static shapes) and clamps longer reads."""
    buf = b"@a\n" + b"A" * 300 + b"\n+\n" + b"I" * 300 + b"\n@b\nACGT\n+\nIIII\n"
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(10)
    pb = batch.to_padded(max_len=128)
    assert pb.seq.shape[1] == 128
    assert bytes(np.asarray(pb.seq[0, :128]).tobytes()) == b"A" * 128
    assert int(pb.lengths[0]) == 300  # true length kept (feed convention)
    # FASTA variant clamps lengths as documented
    from blazeseq_tpu.fasta import FastaParser
    fp = FastaParser(bt.MemoryReader(b">x\n" + b"G" * 500 + b"\n>y\nAC\n"))
    seq2d, lengths = fp.next_batch(10).to_padded(max_len=64)
    assert seq2d.shape[1] == 128  # lane-rounded
    assert int(lengths[0]) == 128


def test_c_record_pickles():
    """The C-native FastqRecord must pickle like the pure-Python variant
    (multiprocessing feeds pass records between processes)."""
    import pickle

    from blazeseq_tpu.fastq.record import FastqRecord

    r = FastqRecord("id desc", "ACGTN", "IIIII", phred_offset=64)
    r2 = pickle.loads(pickle.dumps(r))
    assert r2.id_bytes() == b"id desc"
    assert r2.sequence_bytes() == b"ACGTN"
    assert r2.quality_bytes() == b"IIIII"
    assert r2._phred_offset == 64
    assert r2 == r and hash(r2) == hash(r)


def test_chain_iterator_views_expose_memoryviews():
    """Round-3 regression: the single-owner refcount optimization left
    own[1]/own[2] NULL on chain-iterator views, so the _sequence/_quality
    memoryview getters returned None and FastqBatch.add(view) raised
    TypeError. View_mv must fall back to the shared owner."""
    buf = bytes(bt.generate_synthetic_fastq_buffer(20, 30, 60, 2, 40,
                                                   "sanger"))
    p = bt.FastqParser(bt.MemoryReader(buf))
    batch = bt.FastqBatch()
    for v in p.views():
        assert v._sequence is not None
        assert bytes(v._sequence) == v.sequence_bytes()
        assert bytes(v._quality) == v.quality_bytes()
        assert bytes(v._id) == v.id_bytes()
        batch.add(v)
        break
    assert batch.num_records() == 1


def test_trim_cli_appends_across_multiple_inputs(tmp_path):
    """Round-3 regression: per-path writers truncated --out, keeping only
    the last input's trimmed reads."""
    from blazeseq_tpu.__main__ import main

    a = tmp_path / "a.fastq"
    b = tmp_path / "b.fastq"
    a.write_bytes(b"@a0\nACGT\n+\nIIII\n")
    b.write_bytes(b"@b0\nGGGG\n+\nIIII\n")
    out = tmp_path / "out.fastq"
    rc = main(["trim", "--mode", "ends", "--q", "2", "--out", str(out),
               str(a), str(b)])
    assert rc == 0
    data = out.read_bytes()
    assert b"@a0" in data and b"@b0" in data


def test_trim_cli_no_truncation_for_long_reads(tmp_path):
    """Round-3 regression: a fixed 1024-wide pad zeroed the quality tail of
    longer reads, silently mis-trimming them."""
    from blazeseq_tpu.__main__ import main

    n = 2000
    src = tmp_path / "long.fastq"
    src.write_bytes(b"@L0\n" + b"A" * n + b"\n+\n" + b"I" * n + b"\n")
    out = tmp_path / "out.fastq"
    rc = main(["trim", "--mode", "window", "--q", "20", "--out", str(out),
               str(src)])
    assert rc == 0
    recs = list(bt.FastqParser(bt.open_reader(str(out))).records())
    assert len(recs) == 1
    assert recs[0].sequence_bytes() == b"A" * n  # uniformly high Q: untrimmed


def test_per_tile_accumulator_handles_varying_widths():
    """Round-3 regression: batches padded to their own max length feed the
    accumulator arrays of different widths."""
    from blazeseq_tpu.ops.tiles import PerTileAccumulator

    acc = PerTileAccumulator()
    tiles = np.asarray([2101], np.int32)
    acc.add_batch(tiles, np.full((1, 128), ord("I"), np.uint8),
                  np.asarray([100], np.int32), 33)
    acc.add_batch(tiles, np.full((1, 256), ord("5"), np.uint8),
                  np.asarray([200], np.int32), 33)
    ts, mean = acc.mean()
    assert list(ts) == [2101]
    assert mean.shape[1] == 256
    # position 0: (40 + 20) / 2; position 150: only the second batch -> 20
    assert mean[0, 0] == 30.0
    assert mean[0, 150] == 20.0
    _, dev = acc.deviation()
    assert abs(float(dev[0, 0])) < 1e-12


def test_overlapped_ingest_rejects_underprovisioned_buffers():
    """Round-3 regression: with n_buffers <= depth, acquire() recycles a
    buffer whose result has not been delivered yet — consumers that read
    delivered chunks' buffer bytes (QC failure-path stream reconstruction)
    must opt into keep_bytes=True and be refused that configuration.
    Byte-independent consumers may still under-provision."""
    from blazeseq_tpu.parallel.ingest import OverlappedIngest

    with pytest.raises(ValueError):
        OverlappedIngest(lambda c, n: c, 1024, depth=3, n_buffers=2,
                         keep_bytes=True)
    OverlappedIngest(lambda c, n: c, 1024, depth=3, n_buffers=2)  # ok


def test_nw_aligner_scores_reads_longer_than_128():
    """Round-3 regression: score_batch padded rows to min(max_query_len,
    128), so 129..256 bp reads had no extraction lane and 'scored' the
    NEG init sentinel (-5e8) in every mode."""
    from blazeseq_tpu.models import NWAligner

    long_read = b"ACGT" * 50  # 200 bp
    buf = b"@L\n" + long_read + b"\n+\n" + b"I" * 200 + b"\n" \
        + b"@s\nACGTACGT\n+\nIIIIIIII\n"
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(2)
    for mode in ("global", "semiglobal", "local"):
        for kw in ({}, {"gap_open": -4, "gap_extend": -1}):
            a = NWAligner(b"GATTACA" * 8, mode=mode,
                          prefer_pallas=False, **kw)
            scores = a.score_batch(batch)
            assert (scores > -(10**8)).all(), (mode, kw, scores)
            assert a.verify_batch(batch), (mode, kw)


def test_ragged_qc_step_without_mesh_covers_every_shard():
    """Round-3 regression: build_ragged_qc_step(None, ...) parsed only
    shard 0 of the documented [D*S] + i32[D] input contract."""
    import jax.numpy as jnp

    from blazeseq_tpu.fastq.quality import parse_schema
    from blazeseq_tpu.parallel.pipeline import build_ragged_qc_step

    D, K = 3, 256
    shards = [bt.generate_variable_id_fastq_buffer(
        200, 60, 90, 2, 40, "sanger", seed=40 + d) for d in range(D)]
    S = max(-(-len(s) // K) * K for s in shards)
    arr = np.zeros(D * S, np.uint8)
    nv = np.zeros(D, np.int32)
    for d, s in enumerate(shards):
        arr[d * S: d * S + len(s)] = np.frombuffer(bytes(s), np.uint8)
        nv[d] = len(s)
    step = build_ragged_qc_step(None, parse_schema("sanger"), width=128)
    good, fb, tail, st = step(jnp.asarray(arr), jnp.asarray(nv))
    assert np.asarray(good).all()
    assert np.array_equal(np.asarray(tail), nv)
    assert int(np.asarray(st.reads)) == 600  # every shard counted
