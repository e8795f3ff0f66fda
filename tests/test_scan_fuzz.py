"""Adversarial/fuzz coverage for the native scan kernels.

The AVX-512 scan core speculates on the previous record's newline layout and
verifies each speculation by exact bitmask equality (native/scan.cpp). The
shared corpus files are mostly layout-uniform, so they barely exercise the
mispredict/fallback machinery. These tests generate deterministic adversarial
record shapes — alternating lengths, header-width jumps, 1-base reads,
records longer than the 512-byte speculation window, CRLF records — and
check record-for-record equality against a trivial pure-Python splitter, in
all four parse modes (views, records, padded batches, count).

Reference behavior spec: blazeseq/fastq/parser.mojo:311-379 (scan),
blazeseq/utils.mojo:449-462 (structure checks).
"""

import random

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import FastxError


def naive_parse(buf: bytes):
    """Trivial reference: split on newlines, group by 4 (assumes valid file
    with trailing newline)."""
    lines = buf.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    recs = []
    for i in range(0, len(lines), 4):
        hdr, seq, sep, qual = lines[i : i + 4]
        recs.append((hdr[1:].strip(), seq, qual))
    return recs


def make_fastq(shapes, qual_byte_fn=None):
    """shapes: list of (id_bytes, seq_len). Quality defaults to 'I'."""
    rng = random.Random(1234)
    out = []
    for ident, n in shapes:
        seq = bytes(rng.choice(b"ACGT") for _ in range(n))
        if qual_byte_fn is None:
            qual = b"I" * n
        else:
            qual = bytes(qual_byte_fn(j) for j in range(n))
        out.append(b"@" + ident + b"\n" + seq + b"\n+\n" + qual + b"\n")
    return b"".join(out)


def check_all_modes(buf: bytes, chunk_sizes=(None, 64, 257)):
    golden = naive_parse(buf)
    for chunk in chunk_sizes:
        # views mode
    # (small chunk sizes force records to straddle stream refills)
        for mode in ("views", "records", "padded", "count", "batch"):
            reader = bt.MemoryReader(buf)
            p = bt.FastqParser(reader, config=bt.ParserConfig())
            if chunk is not None:
                # re-wrap through a chunked file-like to force refills
                class Chunky:
                    def __init__(self, data, size):
                        self._d = memoryview(data)
                        self._i = 0
                        self._size = size

                    def readinto(self, mv):
                        n = min(len(mv), self._size, len(self._d) - self._i)
                        mv[:n] = self._d[self._i : self._i + n]
                        self._i += n
                        return n

                    def close(self):
                        pass

                p = bt.FastqParser(Chunky(buf, chunk), config=bt.ParserConfig())
            if mode == "views":
                got = [(bytes(v.id_bytes()), bytes(v.sequence_bytes()),
                        bytes(v.quality_bytes())) for v in p.views()]
                assert got == golden, (mode, chunk)
            elif mode == "records":
                got = [(r.id_bytes(), r.sequence_bytes(), r.quality_bytes())
                       for r in p.records()]
                assert got == golden, (mode, chunk)
            elif mode == "padded":
                n_rec = 0
                bases = 0
                for pb in p.padded_batches(97, max_len=128):
                    n_rec += pb.n_records
                    bases += int(np.asarray(
                        pb.lengths[: pb.n_records], dtype=np.int64).sum())
                    # verify row contents for clamped width
                    for i in range(pb.n_records):
                        pass
                assert n_rec == len(golden), (mode, chunk)
                assert bases == sum(len(g[1]) for g in golden), (mode, chunk)
            elif mode == "batch":
                got = []
                for fb in p.batches(89):
                    for i in range(len(fb)):
                        r = fb.get_record(i)
                        got.append((r.id_bytes(), r.sequence_bytes(),
                                    r.quality_bytes()))
                assert got == golden, (mode, chunk)
            else:
                r, b = p.count()
                assert r == len(golden), (mode, chunk)
                assert b == sum(len(g[1]) for g in golden), (mode, chunk)


def test_uniform_then_jump():
    """Layout uniform for a while, then read length jumps (speculation must
    mispredict and recover exactly)."""
    shapes = [(b"r%04d" % i, 100) for i in range(300)]
    shapes += [(b"r%04d" % (300 + i), 37) for i in range(300)]
    shapes += [(b"r%04d" % (600 + i), 100) for i in range(17)]
    check_all_modes(make_fastq(shapes))


def test_alternating_lengths():
    """Every record has a different layout: speculation never hits."""
    shapes = [(b"x%d" % i, 1 + (i * 31 + 7) % 173) for i in range(500)]
    check_all_modes(make_fastq(shapes))


def test_header_width_jump():
    """Header widths change at decimal boundaries (the classic @read_9 ->
    @read_10 layout change)."""
    shapes = [(b"read_%d" % i, 50) for i in range(1500)]
    check_all_modes(make_fastq(shapes))


def test_one_base_reads():
    shapes = [(b"t%d" % i, 1) for i in range(200)]
    check_all_modes(make_fastq(shapes))


def test_records_longer_than_speculation_window():
    """Reads > 512B never enter the speculative path (SPEC_BLOCKS=8)."""
    shapes = [(b"long%d" % i, 700 + (i % 3)) for i in range(50)]
    shapes += [(b"short%d" % i, 30) for i in range(50)]
    check_all_modes(make_fastq(shapes))


def test_random_mix_deterministic():
    rng = random.Random(99)
    shapes = []
    for i in range(2000):
        ident = bytes(rng.choice(b"abcdefgh") for _ in range(rng.randint(1, 40)))
        shapes.append((ident, rng.randint(1, 300)))
    check_all_modes(make_fastq(shapes), chunk_sizes=(None, 1024))


def test_crlf_records_kept_in_seq_qual():
    """DOS line endings: CR is retained in seq/qual spans (reference keeps
    bytes verbatim inside lines; only ids are whitespace-stripped)."""
    buf = b"@id1\r\nACGT\r\n+\r\nIIII\r\n@id2\r\nGG\r\n+\r\nII\r\n"
    p = bt.FastqParser(bt.MemoryReader(buf))
    recs = [(r.id_bytes(), r.sequence_bytes(), r.quality_bytes())
            for r in p.records()]
    assert recs == [(b"id1", b"ACGT\r", b"IIII\r"), (b"id2", b"GG\r", b"II\r")]


def test_validation_error_position_independent_of_speculation():
    """A quality error deep in a uniform run must be reported at the exact
    record, whether or not the scan got there speculatively."""
    shapes = [(b"q%d" % i, 80) for i in range(777)]
    buf = bytearray(make_fastq(shapes))
    # corrupt the quality of record 500 with a byte below sanger lower bound
    golden = naive_parse(bytes(buf))
    # find record 500's quality start: records are uniform length
    rec_len = len(buf) // 777
    # not exactly uniform (ids differ); locate via split
    lines = bytes(buf).split(b"\n")
    qual_line_idx = 500 * 4 + 3
    qpos = sum(len(l) + 1 for l in lines[:qual_line_idx])
    buf[qpos + 10] = 0x20  # ' ' < '!' (sanger lower bound)
    cfg = bt.ParserConfig(check_quality=True, quality_schema="sanger")
    p = bt.FastqParser(bt.MemoryReader(bytes(buf)), config=cfg)
    seen = 0
    with pytest.raises(FastxError) as ei:
        for _ in p.views():
            seen += 1
    assert seen == 500
    assert "Record number: 501" in str(ei.value)
    assert golden[0][0] == b"q0"


@pytest.mark.parametrize("bad_rec", [500, 501, 502, 503])
def test_quality_error_at_each_group_offset(bad_rec):
    """The locked-layout group path verifies 4 records at a time; a quality
    error must stop at the exact record for every in-group offset (native
    scan.cpp group_step_impl rollback + per-record rerun)."""
    shapes = [(b"qq%04d" % i, 64) for i in range(600)]
    buf = bytearray(make_fastq(shapes))
    lines = bytes(buf).split(b"\n")
    qpos = sum(len(l) + 1 for l in lines[: bad_rec * 4 + 3])
    buf[qpos + 5] = 0x20  # below sanger lower bound
    cfg = bt.ParserConfig(check_quality=True, quality_schema="sanger")
    p = bt.FastqParser(bt.MemoryReader(bytes(buf)), config=cfg)
    seen = 0
    with pytest.raises(FastxError) as ei:
        for _ in p.views():
            seen += 1
    assert seen == bad_rec
    assert "Record number: %d" % (bad_rec + 1) in str(ei.value)


@pytest.mark.parametrize("bad_rec", [400, 401, 402, 403])
def test_at_marker_error_at_each_group_offset(bad_rec):
    """'@'-corruption at each in-group offset stops exactly there (the group
    path checks markers with scalar loads after the vector verify)."""
    shapes = [(b"mm%04d" % i, 48) for i in range(500)]
    buf = make_fastq(shapes)
    lines = buf.split(b"\n")
    lines[bad_rec * 4] = b"X" + lines[bad_rec * 4][1:]
    buf = b"\n".join(lines)
    p = bt.FastqParser(bt.MemoryReader(buf))
    seen = 0
    with pytest.raises(FastxError) as ei:
        for _ in p.views():
            seen += 1
    assert seen == bad_rec
    assert "Record number: %d" % (bad_rec + 1) in str(ei.value)


def test_ascii_error_in_uniform_run():
    """A high-bit byte mid-sequence in a uniform run: the whole-window ASCII
    prefilter trips and the scalar rescan must report the exact record."""
    shapes = [(b"aa%04d" % i, 72) for i in range(300)]
    buf = bytearray(make_fastq(shapes))
    lines = bytes(buf).split(b"\n")
    spos = sum(len(l) + 1 for l in lines[: 150 * 4 + 1])
    buf[spos + 3] = 0xC3
    cfg = bt.ParserConfig(check_ascii=True)
    p = bt.FastqParser(bt.MemoryReader(bytes(buf)), config=cfg)
    seen = 0
    with pytest.raises(FastxError) as ei:
        for _ in p.views():
            seen += 1
    assert seen == 150
    assert "Record number: 151" in str(ei.value)


def test_padded_group_rows_exact():
    """Row bytes produced by the group emit path (VBMI extraction at
    width=128) must equal the record bytes, zero-padded."""
    shapes = [(b"vb%04d" % i, 100) for i in range(200)]
    buf = make_fastq(shapes)
    golden = naive_parse(buf)
    p = bt.FastqParser(bt.MemoryReader(buf))
    rows = []
    for pb in p.padded_batches(64, max_len=128):
        for i in range(pb.n_records):
            L = int(pb.lengths[i])
            rows.append((bytes(pb.seq[i, :L]), bytes(pb.qual[i, :L]),
                         bytes(pb.seq[i, L:]), bytes(pb.qual[i, L:])))
    assert len(rows) == len(golden)
    for (seq, qual, spad, qpad), (_, gseq, gqual) in zip(rows, golden):
        assert seq == gseq and qual == gqual
        assert spad == b"\x00" * len(spad) and qpad == b"\x00" * len(qpad)


@pytest.mark.parametrize("width", [64, 128, 192, 256])
def test_padded_group_rows_widths(width):
    """Generic group emit path at non-128 widths (and the 128 VBMI path)
    against golden bytes, including reads clamped to the row width."""
    shapes = [(b"w%04d" % i, 150) for i in range(100)]
    buf = make_fastq(shapes)
    golden = naive_parse(buf)
    p = bt.FastqParser(bt.MemoryReader(buf))
    rows = []
    for pb in p.padded_batches(32, max_len=width):
        for i in range(pb.n_records):
            L = min(int(pb.lengths[i]), width)
            assert int(pb.lengths[i]) == 150
            rows.append((bytes(pb.seq[i, :L]), bytes(pb.qual[i, :L])))
    assert len(rows) == len(golden)
    for (seq, qual), (_, gseq, gqual) in zip(rows, golden):
        assert seq == gseq[:width] and qual == gqual[:width]


def test_structure_error_after_speculative_run():
    """A '+'-line corruption mid-file stops at the right record."""
    shapes = [(b"s%d" % i, 60) for i in range(400)]
    buf = make_fastq(shapes)
    lines = buf.split(b"\n")
    lines[200 * 4 + 2] = b"*"  # separator of record 200
    buf = b"\n".join(lines)
    p = bt.FastqParser(bt.MemoryReader(buf))
    seen = 0
    with pytest.raises(FastxError) as ei:
        for _ in p.views():
            seen += 1
    assert seen == 200
    assert "Record number: 201" in str(ei.value)
