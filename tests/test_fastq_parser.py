"""FASTQ parser unit tests (port of tests/fastq/test_parser.mojo: iterator
semantics, batch slicing, validation toggles, chunk-boundary stress, buffer
growth, EOF edge cases, synthetic determinism)."""

import os

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import ParseError, ValidationError

DATA = os.path.join(os.path.dirname(__file__), "data", "fastq_parser")

SIMPLE = b"@r1\nACGT\n+\nIIII\n@r2 desc here\nGGCC\n+x\n!!!!\n"


def _parser(data=SIMPLE, chunk=None, **cfg_kwargs):
    config = bt.ParserConfig(**cfg_kwargs) if cfg_kwargs else None
    p = bt.FastqParser(bt.MemoryReader(data), config=config)
    if chunk:
        from blazeseq_tpu.io.buffered import ByteStream

        p._stream = ByteStream(bt.MemoryReader(data), chunk_size=chunk)
    return p


def test_basic_views():
    p = _parser()
    v1 = p.next_view()
    assert v1.id() == "r1" and v1.sequence() == "ACGT" and v1.quality() == "IIII"
    v2 = p.next_view()
    assert v2.id() == "r2 desc here" and v2.sequence() == "GGCC"
    with pytest.raises(bt.FastxEOFError):
        p.next_view()


def test_definition_split():
    p = _parser()
    p.next_view()
    d = p.next_view().definition()
    assert d.Id == b"r2"
    assert d.Description == b"deschere"  # reference joins parts without spaces


def test_records_iterator_stops():
    p = _parser()
    recs = list(p.records())
    assert [r.id() for r in recs] == ["r1", "r2 desc here"]
    assert list(p.records()) == []  # exhausted


def test_has_more():
    p = _parser()
    assert p.has_more()
    list(p.records())
    assert not p.has_more()


def test_phred_scores():
    p = _parser()
    v = p.next_view()
    assert v.phred_scores().tolist() == [ord("I") - 33] * 4
    assert v.phred_scores(offset=64).tolist() == [ord("I") - 64] * 4


@pytest.mark.parametrize("chunk", [7, 13, 32, 64, 1024])
def test_chunk_boundary_stress(chunk):
    """Records split across refills must parse identically
    (reference: test_*_span_chunks)."""
    buf = bt.generate_synthetic_fastq_buffer(200, 30, 90, 2, 40, "sanger")
    ref = [
        (r.id_bytes(), r.sequence_bytes(), r.quality_bytes())
        for r in bt.FastqParser(bt.MemoryReader(buf)).records()
    ]
    p = _parser(bytes(buf), chunk=chunk)
    got = [(r.id_bytes(), r.sequence_bytes(), r.quality_bytes())
           for r in p.records()]
    assert got == ref
    assert len(got) == 200


def test_no_trailing_newline():
    p = _parser(b"@r1\nACGT\n+\nIIII")
    recs = list(p.records())
    assert len(recs) == 1 and recs[0].quality() == "IIII"


def test_trailing_blank_lines_unexpected_eof():
    # trailing spaces after final newline -> UNEXPECTED_EOF at phase 0
    p = _parser(b"@r1\nACGT\n+\nIIII\n  ")
    assert p.next_record().id() == "r1"
    with pytest.raises(ParseError, match="Unexpected end of file"):
        p.next_record()


def test_blank_tail_after_three_newlines_is_eof():
    # "@r2\nACGT\n+\n   " (no 4th newline, blank qual tail) -> EOF
    p = _parser(b"@r1\nACGT\n+\nIIII\n@r2\nACGT\n+\n \t ")
    assert p.next_record().id() == "r1"
    with pytest.raises(bt.FastxEOFError):
        p.next_record()


def test_truncated_mid_sequence():
    p = _parser(b"@r1\nACG")
    with pytest.raises(ParseError, match="at phase 1"):
        p.next_record()


def test_dos_line_endings():
    p = bt.FastqParser(bt.FileReader(os.path.join(DATA, "example_dos.fastq")))
    recs = list(p.records())
    assert len(recs) == 3
    # CR retained in seq/qual (reference semantics), stripped from id
    assert recs[0].sequence_bytes().endswith(b"\r")
    assert not recs[0].id_bytes().endswith(b"\r")


def test_validation_toggles():
    bad_q = b"@r1\nACGT\n+\n II \n"
    assert len(list(_parser(bad_q).records())) == 1  # no validation
    p = _parser(bad_q, check_quality=True)
    with pytest.raises(ValidationError, match="Corrupt quality"):
        p.next_record()
    bad_a = "@r1\nAC\xc3\x89T\n+\nIIIII\n".encode("latin-1")
    p = _parser(bad_a, check_ascii=True)
    with pytest.raises(ValidationError, match="Non ASCII"):
        p.next_record()


def test_validation_error_consumes_record():
    data = b"@r1\nACGT\n+\n!!!!\n@r2\nGGGG\n+\nIIII\n"
    cfg = bt.ParserConfig(check_quality=True, quality_schema="illumina_1.3")
    p = bt.FastqParser(bt.MemoryReader(data), config=cfg)
    with pytest.raises(ValidationError):
        p.next_record()
    # bad record was consumed; next record is r2
    assert p.next_record().id() == "r2"


def test_structure_error_context_fields():
    data = b"@r1\nACGT\n+\nIIII\nX2\nGGGG\n+\nIIII\n"
    p = _parser(data)
    assert p.next_record().id() == "r1"
    with pytest.raises(ParseError) as ei:
        p.next_record()
    e = ei.value
    assert e.record_number == 2
    assert e.line_number == 5
    assert e.file_position == 16
    assert "X2" in e.record_snippet


def test_batch_sizes():
    buf = bt.generate_synthetic_fastq_buffer(100, 20, 40, 2, 30, "sanger")
    p = bt.FastqParser(bt.MemoryReader(buf))
    sizes = [len(b) for b in p.batches(32)]
    assert sizes == [32, 32, 32, 4]


def test_batch_contents_roundtrip():
    p = _parser()
    b = p.next_batch(10)
    assert len(b) == 2
    r0, r1 = b.to_records()
    assert r0.id() == "r1" and r0.sequence() == "ACGT"
    assert r1.id() == "r2 desc here" and r1.quality() == "!!!!"
    assert b.get_ref(1).sequence() == "GGCC"
    assert b.seq_len() == 8


def test_batch_empty_input():
    p = _parser(b"")
    b = p.next_batch(10)
    assert len(b) == 0
    assert list(_parser(b"").batches()) == []


def test_batch_ends_cumulative():
    p = _parser()
    b = p.next_batch(10)
    b._finalize()
    assert b._ends.tolist() == [4, 8]
    assert b._id_ends.tolist() == [2, 14]


def test_batch_reuse_buffers_parity():
    # reuse_buffers=True serves views into parser-owned staging; contents
    # must match the owned path batch-for-batch (valid until the next call)
    buf = bt.generate_synthetic_fastq_buffer(5000, 40, 200, 2, 40, "sanger")
    cfg = bt.ParserConfig(check_ascii=True, check_quality=True,
                          quality_schema="sanger")
    p1 = bt.FastqParser(bt.MemoryReader(buf), config=cfg)
    p2 = bt.FastqParser(bt.MemoryReader(buf), config=cfg)
    total = 0
    while True:
        a = p1.next_batch(1000)
        b = p2.next_batch(1000, reuse_buffers=True)
        assert a.num_records() == b.num_records()
        if a.num_records() == 0:
            break
        a._finalize(), b._finalize()
        for f in ("_sequence_bytes", "_quality_bytes", "_id_bytes",
                  "_ends", "_id_ends"):
            assert np.array_equal(getattr(a, f), getattr(b, f)), f
        total += a.num_records()
    assert total == 5000


def test_batch_adaptive_sizing_growing_records():
    # bytes-per-record learned from short early records must not corrupt
    # later batches of much longer records (the -8 continue path refills
    # with fresh, larger buffers)
    short = bt.generate_synthetic_fastq_buffer(300, 50, 50, 2, 40, "sanger")
    llong = bt.generate_synthetic_fastq_buffer(300, 420, 420, 2, 40,
                                               "sanger")
    buf = bytes(short) + bytes(llong)
    for reuse in (False, True):
        p = bt.FastqParser(bt.MemoryReader(buf))
        seen = 0
        bases = 0
        for b in p.batches(64, reuse_buffers=reuse):
            seen += len(b)
            bases += b.seq_len()
        assert seen == 600
        assert bases == 300 * 50 + 300 * 420


def test_buffer_capacity_exceeded():
    big = b"@r1\n" + b"A" * 5000 + b"\n+\n" + b"I" * 5000 + b"\n"
    cfg = bt.ParserConfig(buffer_capacity=4096)
    p = bt.FastqParser(bt.MemoryReader(big), config=cfg)
    with pytest.raises(ParseError, match="exceeds buffer capacity"):
        p.next_record()


def test_buffer_growth_enabled():
    big = b"@r1\n" + b"A" * 5000 + b"\n+\n" + b"I" * 5000 + b"\n"
    cfg = bt.ParserConfig(buffer_capacity=4096, buffer_growth_enabled=True)
    p = bt.FastqParser(bt.MemoryReader(big), config=cfg)
    assert len(p.next_record()) == 5000


def test_buffer_growth_max_capacity():
    big = b"@r1\n" + b"A" * 9000 + b"\n+\n" + b"I" * 9000 + b"\n"
    cfg = bt.ParserConfig(buffer_capacity=1024, buffer_growth_enabled=True,
                          buffer_max_capacity=4096)
    p = bt.FastqParser(bt.MemoryReader(big), config=cfg)
    with pytest.raises(ParseError, match="maximum buffer capacity"):
        p.next_record()


def test_synthetic_generator_deterministic():
    b1 = bt.generate_synthetic_fastq_buffer(500, 50, 150, 2, 40, "sanger")
    b2 = bt.generate_synthetic_fastq_buffer(500, 50, 150, 2, 40, "sanger")
    assert bytes(b1) == bytes(b2)
    # writer variant produces identical bytes (reference parity test)
    w = bt.buffered_writer_for_memory()
    bt.generate_synthetic_fastq_to_writer(w, 500, 50, 150, 2, 40, "sanger")
    w.flush()
    assert w._backend.getvalue() == bytes(b1)


def test_synthetic_generator_model():
    """Length formula and header format follow the reference model."""
    buf = bytes(bt.generate_synthetic_fastq_buffer(10, 30, 50, 2, 40, "sanger"))
    recs = list(bt.FastqParser(bt.MemoryReader(buf)).records())
    assert [r.id() for r in recs] == ["read_%d" % i for i in range(10)]
    for i, r in enumerate(recs):
        assert len(r) == 30 + ((i * 31 + 7) % 21)
    # quality bytes within sanger schema bounds
    for r in recs:
        q = r.quality_bytes()
        assert min(q) >= 33 and max(q) <= 126


def test_count_matches_iteration():
    buf = bt.generate_synthetic_fastq_buffer(300, 10, 80, 2, 40, "generic")
    records, bases = bt.FastqParser(bt.MemoryReader(buf)).count()
    recs = list(bt.FastqParser(bt.MemoryReader(buf)).records())
    assert records == len(recs) == 300
    assert bases == sum(len(r) for r in recs)


def test_compute_num_reads_for_size():
    n = bt.compute_num_reads_for_size(1_000_000, 100, 100)
    assert n > 0
    buf = bt.generate_synthetic_fastq_buffer(n, 100, 100, 2, 40, "sanger")
    assert abs(len(buf) - 1_000_000) / 1_000_000 < 0.05


def test_unknown_schema_falls_back(capsys):
    p = _parser()
    import blazeseq_tpu.fastq.quality as q

    assert q.parse_schema("bogus") == q.GENERIC_SCHEMA
    assert "Unknown quality schema" in capsys.readouterr().out


def test_empty_record_zero_length():
    p = _parser(b"@r1\n\n+\n\n")
    r = p.next_record()
    assert len(r) == 0 and r.id() == "r1"


# ---------------------------------------------------------------------------
# bucketed padded batches (mixed-length TPU layout)
# ---------------------------------------------------------------------------

def test_bucketed_padded_batches_content_and_buckets():
    import numpy as np
    import random
    rng = random.Random(7)
    recs = []
    for i in range(500):
        L = rng.choice([30, 100, 180, 400])
        seq = bytes(rng.choice(b"ACGT") for _ in range(L))
        recs.append((b"r%d" % i, seq))
    buf = b"".join(b"@%s\n%s\n+\n%s\n" % (i, s, b"I" * len(s))
                   for i, s in recs)
    golden = {s: True for _, s in recs}
    p = bt.FastqParser(bt.MemoryReader(buf))
    seen = 0
    for width, pb in p.bucketed_padded_batches(buckets=(64, 128, 256),
                                               max_records=64):
        assert width in (64, 128, 256)
        lens = np.asarray(pb.lengths[: pb.n_records])
        # every record landed in the smallest bucket that fits (long reads
        # clamp to the largest bucket)
        if width == 64:
            assert (lens <= 64).all()
        elif width == 128:
            assert ((lens > 64) & (lens <= 128)).all()
        else:
            assert (lens > 128).all()
        for i in range(pb.n_records):
            L = min(int(lens[i]), width)
            s = bytes(np.asarray(pb.seq[i, :L]).tobytes())
            # clamped rows: compare the stored prefix
            assert any(g.startswith(s) for g in golden if len(g) == lens[i])
            # padding is zero
            assert not np.asarray(pb.seq[i, L:]).any()
        seen += pb.n_records
    assert seen == 500


def test_bucketed_padding_waste_below_uniform():
    import numpy as np
    buf = bytes(bt.generate_synthetic_fastq_buffer(2000, 30, 400, 2, 40,
                                                   "sanger"))
    p = bt.FastqParser(bt.MemoryReader(buf))
    padded_cells = 0
    used_cells = 0
    for width, pb in p.bucketed_padded_batches(buckets=(64, 128, 256, 512),
                                               max_records=256):
        padded_cells += pb.n_records * width
        used_cells += int(np.asarray(pb.lengths[: pb.n_records]).sum())
    uniform_cells = 2000 * 512  # single 512-wide layout
    assert padded_cells < uniform_cells * 0.7
    assert used_cells == sum(
        len(r) for r in bt.FastqParser(bt.MemoryReader(buf)).records())


# ------------------------------------------------------------------ reuse views

def test_views_reuse_parity_and_identity():
    """views(reuse=True) yields the same record stream as views(); with the
    C extension, every iteration returns ONE mutated shell (the documented
    invalidate-on-next contract made literal)."""
    import blazeseq_tpu.native as native

    buf = bt.generate_synthetic_fastq_buffer(500, 20, 80, 2, 40, "sanger")
    p1 = bt.FastqParser(bt.MemoryReader(buf))
    p2 = bt.FastqParser(bt.MemoryReader(buf))
    got1 = [(bytes(v.id_bytes()), bytes(v.sequence_bytes()),
             bytes(v.quality_bytes())) for v in p1.views()]
    got2 = []
    shells = set()
    for v in p2.views(reuse=True):
        shells.add(id(v))
        got2.append((bytes(v.id_bytes()), bytes(v.sequence_bytes()),
                     bytes(v.quality_bytes())))
    assert got1 == got2 and len(got2) == 500
    if native.records_ext() is not None:
        assert len(shells) == 1


def test_views_reuse_validation_still_raises():
    bad = b"@r1\nACGT\n+\nII\xffI\n"
    cfg = bt.ParserConfig(check_ascii=True)
    p = bt.FastqParser(bt.MemoryReader(bad), config=cfg)
    with pytest.raises(bt.FastxError):
        for _v in p.views(reuse=True):
            pass


def test_views_reuse_across_refills():
    """Shell must re-anchor its keep-alive owner when the parser window
    moves (chunked stream: many refills)."""
    buf = bt.generate_synthetic_fastq_buffer(300, 50, 120, 2, 40, "sanger")
    p = _parser(bytes(buf), chunk=1024)
    n = 0
    total = 0
    for v in p.views(reuse=True):
        n += 1
        total += len(v)
    p2 = bt.FastqParser(bt.MemoryReader(buf))
    r, b = p2.count()
    assert (n, total) == (r, b)
