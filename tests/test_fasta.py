"""FASTA parser tests (port of tests/fasta/test_fasta_parser*.mojo: multiline
normalization, CRLF, blank lines, id trimming, empty-seq errors,
chunk-boundary stress, corpus counts, roundtrip with wrapping)."""

import glob
import os

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import FastxEOFError, ParseError
from blazeseq_tpu.fasta import FastaParser, FastaParserConfig, FastaRecord

DATA = os.path.join(os.path.dirname(__file__), "data", "fasta_parser")


def _parser(data, chunk=None, **cfg):
    config = FastaParserConfig(**cfg) if cfg else None
    return FastaParser(bt.MemoryReader(data), config=config,
                       chunk_size=chunk)


def test_basic_two_records():
    p = _parser(b">r1 desc\nACGT\nGGTT\n>r2\nTTTT\n")
    r1 = p.next_record()
    assert r1.id() == "r1 desc" and r1.sequence() == "ACGTGGTT"
    r2 = p.next_record()
    assert r2.id() == "r2" and r2.sequence() == "TTTT"
    with pytest.raises(FastxEOFError):
        p.next_record()


def test_multiline_normalization_and_crlf():
    p = _parser(b">r1\r\nACGT\r\nGG TT\r\n")
    r = p.next_record()
    # CR trimmed per line; interior spaces retained; ends stripped
    assert r.sequence() == "ACGTGG TT"


def test_blank_lines_and_id_trimming():
    p = _parser(b"\n\n>  r1  \nACGT\n\nGGGG\n\n>r2\nAA\n")
    r1 = p.next_record()
    assert r1.id() == "r1"
    assert r1.sequence() == "ACGTGGGG"
    assert p.next_record().id() == "r2"


def test_missing_gt_raises():
    p = _parser(b"ACGT\n>r1\nACGT\n")
    with pytest.raises(ParseError, match="does not start with '>'"):
        p.next_record()


def test_empty_sequence_raises():
    p = _parser(b">r1\n>r2\nACGT\n")
    with pytest.raises(ParseError, match="empty sequence"):
        p.next_record()


def test_empty_sequence_at_eof_raises():
    p = _parser(b">r1\nACGT\n>r2\n")
    assert p.next_record().sequence() == "ACGT"
    with pytest.raises(ParseError, match="empty sequence"):
        p.next_record()


def test_no_trailing_newline():
    p = _parser(b">r1\nACGT\nGG")
    assert p.next_record().sequence() == "ACGTGG"


def test_ascii_validation():
    p = _parser(">r1\nAC\xc9T\n".encode("latin-1"), check_ascii=True)
    with pytest.raises(Exception, match="Non ASCII"):
        p.next_record()
    # off by default
    p = _parser(">r1\nAC\xc9T\n".encode("latin-1"))
    assert len(p.next_record()) == 4


@pytest.mark.parametrize("chunk", [5, 17, 64, 1024])
def test_chunk_boundary_stress(chunk):
    buf = bytes(bt.generate_synthetic_fasta_buffer(60, 10, 300, line_width=50))
    ref = [(r.id_bytes(), r.sequence_bytes())
           for r in FastaParser(bt.MemoryReader(buf)).records()]
    got = [(r.id_bytes(), r.sequence_bytes())
           for r in _parser(buf, chunk=chunk).records()]
    assert got == ref and len(got) == 60


def test_synthetic_fasta_model():
    buf = bytes(bt.generate_synthetic_fasta_buffer(10, 30, 80, line_width=25))
    recs = list(FastaParser(bt.MemoryReader(buf)).records())
    assert [r.id() for r in recs] == ["read_%d" % i for i in range(10)]
    for i, r in enumerate(recs):
        assert len(r) == 30 + ((i * 31 + 7) % 51)


def test_roundtrip_with_wrapping():
    buf = bytes(bt.generate_synthetic_fasta_buffer(20, 50, 200, line_width=60))
    recs = list(FastaParser(bt.MemoryReader(buf)).records())
    w = bt.buffered_writer_for_memory()
    for r in recs:
        r.write(w, line_width=60)
    w.flush()
    recs2 = list(FastaParser(bt.MemoryReader(w._backend.getvalue())).records())
    assert [(r.id_bytes(), r.sequence_bytes()) for r in recs] == \
        [(r.id_bytes(), r.sequence_bytes()) for r in recs2]


def test_record_write_width_zero():
    r = FastaRecord("x", "ACGTACGT")
    assert r.to_bytes(line_width=0) == b">x\nACGTACGT\n"
    assert r.to_bytes(line_width=3) == b">x\nACG\nTAC\nGT\n"


def test_count_and_batches():
    buf = bytes(bt.generate_synthetic_fasta_buffer(40, 20, 100))
    records, bases = FastaParser(bt.MemoryReader(buf)).count()
    recs = list(FastaParser(bt.MemoryReader(buf)).records())
    assert records == 40 and bases == sum(len(r) for r in recs)
    p = FastaParser(bt.MemoryReader(buf))
    batches = list(p.batches(16))
    assert [len(b) for b in batches] == [16, 16, 8]
    flat = [r for b in batches for r in b.to_records()]
    assert [(r.id_bytes(), r.sequence_bytes()) for r in flat] == \
        [(r.id_bytes(), r.sequence_bytes()) for r in recs]


def test_count_fast_tier_differential_fuzz():
    # the 256-byte clean-group counting tier (scan.cpp bs_count_fasta) must
    # agree with the exact record parse on inputs that straddle group
    # boundaries with whitespace quirks: trailing spaces at line ends,
    # descriptions, CRLF, blank lines, and headers landing at every
    # alignment. Counts must equal the records() accounting byte-for-byte.
    import random

    rng = random.Random(42)
    for trial in range(30):
        parts = []
        for i in range(rng.randrange(1, 40)):
            desc = rng.choice(["", " desc here", "\tx", "  "])
            parts.append((">r%d%s\n" % (i, desc)).encode())
            n_lines = rng.randrange(1, 5)
            for _ in range(n_lines):
                line = "ACGT" * rng.randrange(1, 40)
                tail = rng.choice(["", " ", "\r", "  "])
                parts.append((line + tail + "\n").encode())
            if rng.random() < 0.3:
                parts.append(b"\n")  # blank line between records
        # random leading pad shifts every group/block boundary
        buf = b"\n" * rng.randrange(0, 3) + b"".join(parts)
        recs = list(FastaParser(bt.MemoryReader(buf)).records())
        records, bases = FastaParser(bt.MemoryReader(buf)).count()
        assert records == len(recs), trial
        assert bases == sum(len(r) for r in recs), trial


def test_batch_to_padded():
    import numpy as np

    buf = bytes(bt.generate_synthetic_fasta_buffer(8, 10, 40))
    b = FastaParser(bt.MemoryReader(buf)).next_batch(8)
    padded, lens = b.to_padded()
    recs = b.to_records()
    for i, r in enumerate(recs):
        assert lens[i] == len(r)
        assert bytes(np.asarray(padded)[i, : lens[i]]) == r.sequence_bytes()


# -- Biopython FASTA corpus -------------------------------------------------

CORPUS_COUNTS = {}  # filled lazily via biopython-independent golden parse


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(DATA, "*"))))
def test_corpus_file_parses(path):
    if os.path.isdir(path) or path.endswith(".md"):
        pytest.skip("not a FASTA file")
    if os.path.basename(path) in ("aster_blast.pro", "aster_pearson.pro"):
        # leading-comment files: excluded by the reference suite
        # (test_fasta_parser_correctness.mojo:98); must raise cleanly here
        with pytest.raises(ParseError, match="does not start with '>'"):
            list(FastaParser(bt.FileReader(path)).records())
        return
    p = FastaParser(bt.FileReader(path))
    n = 0
    total = 0
    for rec in p.records():
        assert len(rec.id_bytes()) >= 0
        n += 1
        total += len(rec)
    # golden twin: minimal independent python parse
    with open(path, "rb") as f:
        raw = f.read()
    golden = _golden_fasta(raw)
    got = [(r.id_bytes(), r.sequence_bytes())
           for r in FastaParser(bt.MemoryReader(raw)).records()]
    assert got == golden
    assert n == len(golden)


def _golden_fasta(raw: bytes):
    """Straight-line reference implementation used only as a test oracle."""
    ws = b" \t\n\v\f\r\x1c\x1d\x1e"
    out = []
    cur_id = None
    cur = []
    for line in raw.split(b"\n"):
        s = line.strip(ws)
        if not s:
            continue
        if s.startswith(b">"):
            if cur_id is not None and b"".join(cur):
                out.append((cur_id, b"".join(cur)))
            cur_id = s[1:].strip(ws)
            cur = []
        elif cur_id is not None:
            cur.append(s)
    if cur_id is not None and b"".join(cur):
        out.append((cur_id, b"".join(cur)))
    return out


def test_fasta_over_parallel_gzip(tmp_path):
    import gzip
    fa = b">a desc\nACGTACGT\nAC\n>b\nGGTT\n"
    p = tmp_path / "t.fasta.gz"
    p.write_bytes(gzip.compress(fa))
    parser = FastaParser(bt.open_reader(str(p)))
    recs = [(r.id(), r.sequence()) for r in parser.records()]
    assert recs == [("a desc", "ACGTACGTAC"), ("b", "GGTT")]


def test_fasta_padded_batches_stream():
    import numpy as np
    fa = b"".join(b">r%d\n%s\n" % (i, b"ACGT" * (i + 1)) for i in range(40))
    p = FastaParser(bt.MemoryReader(fa))
    n = 0
    for seq2d, lengths in p.padded_batches(16, max_len=64):
        assert seq2d.shape[0] == len(lengths)
        for i in range(len(lengths)):
            L = int(lengths[i])
            row = bytes(np.asarray(seq2d[i, :L]).tobytes())
            assert row == (b"ACGT" * 64)[:L]
            assert not np.asarray(seq2d[i, L:]).any()
        n += len(lengths)
    assert n == 40
