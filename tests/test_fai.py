"""FAI + DelimitedReader tests (port of tests/fai/test_fai_parser.mojo and
tests/io/test_delimited.mojo)."""

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import FastxEOFError, ParseError
from blazeseq_tpu.fai import FaiParser, FaiRecord, build_fai, write_fai
from blazeseq_tpu.io.delimited import (
    DelimitedReader,
    DefaultLinePolicy,
    LineAction,
)

# samtools faidx documentation example (unix offsets)
FAI_FASTA = (b"xx:yy|zz-1\t100\t11\t60\t61\n"
             b"another_seq\t350\t136\t60\t61\n")
FAI_FASTQ = b"fqseq\t100\t7\t100\t101\t109\n"


def test_fai_basic_rows():
    p = FaiParser(bt.MemoryReader(FAI_FASTA))
    r1 = p.next_record()
    assert r1.name() == "xx:yy|zz-1"
    assert (r1.Length, r1.Offset, r1.LineBases, r1.LineWidth) == (100, 11, 60, 61)
    assert r1.QualOffset is None
    assert len(r1) == 100
    r2 = p.next_record()
    assert r2.name() == "another_seq" and r2.Offset == 136
    with pytest.raises(FastxEOFError):
        p.next_record()


def test_fai_six_column_fastq():
    p = FaiParser(bt.MemoryReader(FAI_FASTQ))
    r = p.next_record()
    assert r.QualOffset == 109


def test_fai_windows_line_endings():
    data = FAI_FASTA.replace(b"\n", b"\r\n")
    recs = FaiParser(bt.MemoryReader(data)).collect()
    assert len(recs) == 2 and recs[1].Length == 350


def test_fai_collect():
    recs = FaiParser(bt.MemoryReader(FAI_FASTA + FAI_FASTA)).collect()
    assert len(recs) == 4


def test_fai_malformed_column_count():
    p = FaiParser(bt.MemoryReader(b"name\t100\t11\n"))
    with pytest.raises(ParseError, match="5 or 6 TAB-delimited columns"):
        p.next_record()


def test_fai_malformed_int():
    p = FaiParser(bt.MemoryReader(b"name\t1x0\t11\t60\t61\n"))
    with pytest.raises(ParseError, match="invalid byte in integer field"):
        p.next_record()
    p = FaiParser(bt.MemoryReader(b"name\t\t11\t60\t61\n"))
    with pytest.raises(ParseError, match="integer field is empty"):
        p.next_record()


def test_fai_roundtrip_write():
    for blob in (FAI_FASTA, FAI_FASTQ):
        recs = FaiParser(bt.MemoryReader(blob)).collect()
        w = bt.buffered_writer_for_memory()
        write_fai(recs, w)
        w.flush()
        assert FaiParser(bt.MemoryReader(w._backend.getvalue())).collect() == recs
        assert w._backend.getvalue() == blob


def test_build_fai_matches_faidx_layout():
    """Index built from FASTA bytes has faidx-compatible offsets
    (BASELINE config: '.fai index parse with per-contig length/offset
    verification vs faidx')."""
    fasta = (b">chr1 some description\n"
             b"ACGTACGTAC\nGGGGTTTTAA\nACG\n"
             b">chr2\nTTTT\n")
    idx = build_fai(bt.MemoryReader(fasta))
    assert idx[0] == FaiRecord(b"chr1", 23, 23, 10, 11)
    assert idx[1] == FaiRecord(b"chr2", 4, 55, 4, 5)
    # spot-check offsets point at the first base
    assert fasta[23:24] == b"A" and fasta[55:56] == b"T"


def test_build_fai_from_synthetic_and_reparse():
    buf = bytes(bt.generate_synthetic_fasta_buffer(25, 30, 200, line_width=60))
    idx = build_fai(bt.MemoryReader(buf))
    from blazeseq_tpu.fasta import FastaParser

    recs = list(FastaParser(bt.MemoryReader(buf)).records())
    assert len(idx) == 25
    for fai, rec in zip(idx, recs):
        assert fai.Name == rec.definition().Id
        assert fai.Length == len(rec)
        # extract the sequence using the index (random access semantics)
        n_full = fai.Length // fai.LineBases
        rem = fai.Length % fai.LineBases
        size = n_full * fai.LineWidth + (rem + 1 if rem else 0)
        raw = buf[fai.Offset : fai.Offset + size]
        assert raw.replace(b"\n", b"") == rec.sequence_bytes()


def test_build_fai_ragged_raises():
    fasta = b">c1\nACGTACGT\nAC\nGGGG\n"
    with pytest.raises(ParseError, match="ragged"):
        build_fai(bt.MemoryReader(fasta))


# -- DelimitedReader ---------------------------------------------------------


def test_delimited_basic():
    dr = DelimitedReader(bt.MemoryReader(b"a\tb\tc\n1\t2\t3\n"))
    v = dr.next_view()
    assert v.num_fields() == 3 and v.get_bytes(1) == b"b"
    r = dr.next_record()
    assert r.to_bytes() == b"1\t2\t3"


def test_delimited_trailing_delimiter_empty_field():
    # reference parity: a trailing delimiter yields TWO empty tail fields
    # (_fill_offsets pushes the final empty span in the loop and once more in
    # the trailing-delimiter branch, delimited.mojo:121-143)
    dr = DelimitedReader(bt.MemoryReader(b"a\tb\t\n" b"c\td\t\n"))
    v = dr.next_view()
    assert v.num_fields() == 4
    assert v.get_bytes(2) == b"" and v.get_bytes(3) == b""


def test_delimited_inconsistent_field_count():
    dr = DelimitedReader(bt.MemoryReader(b"a\tb\n1\t2\t3\n"))
    dr.next_view()
    with pytest.raises(ParseError, match="inconsistent number of fields"):
        dr.next_view()


def test_delimited_header():
    dr = DelimitedReader(bt.MemoryReader(b"col1\tcol2\nx\ty\n"), has_header=True)
    assert dr.header().get_bytes(0) == b"col1"
    assert dr.next_view().get_bytes(0) == b"x"


def test_delimited_policy_stop():
    class StopAtHash(DefaultLinePolicy):
        def classify(self, line):
            if line.startswith(b"#STOP"):
                return LineAction.STOP
            return super().classify(line)

    dr = DelimitedReader(bt.MemoryReader(b"a\tb\n#STOP\nc\td\n"),
                         policy=StopAtHash())
    assert dr.next_view().get_bytes(0) == b"a"
    with pytest.raises(FastxEOFError):
        dr.next_view()
    assert not dr.has_more()


def test_delimited_blank_lines_skipped():
    dr = DelimitedReader(bt.MemoryReader(b"\n\na\tb\n\nc\td\n"))
    assert [v.get_bytes(0) for v in dr.views()] == [b"a", b"c"]


def test_indexed_fasta_fetch(tmp_path):
    """faidx-style random access: wrapped lines, CRLF, multi-record."""
    fa = (b">chr1 desc\n" + b"ACGTACGTAC\n" * 5  # 50 bases, width 10
          + b">chr2\n" + b"GG\r\nTT\r\n")         # CRLF wrapping, 4 bases
    p = tmp_path / "ref.fa"
    p.write_bytes(fa)
    ix = bt.IndexedFasta(str(p))
    assert sorted(ix.names()) == ["chr1", "chr2"]
    assert ix.length("chr1") == 50
    assert ix.fetch("chr1") == b"ACGTACGTAC" * 5
    assert ix.fetch("chr1", 8, 12) == b"ACAC"      # crosses a line wrap
    assert ix.fetch("chr1", 49, 50) == b"C"
    assert ix.fetch("chr1", 10, 10) == b""
    assert ix.fetch("chr2") == b"GGTT"
    assert ix.fetch("chr2", 1, 3) == b"GT"
    with pytest.raises(KeyError):
        ix.fetch("nope")
    ix.close()


def test_indexed_fasta_uses_existing_fai(tmp_path):
    fa = b">s\nAAACCC\nGGGTTT\n"
    p = tmp_path / "r.fa"
    p.write_bytes(fa)
    # build + persist the index, then reopen (parses the .fai instead)
    from blazeseq_tpu.io.writers import BufferedWriter, FileWriter
    recs = bt.build_fai(bt.FileReader(str(p)))
    w = BufferedWriter(FileWriter(str(p) + ".fai"))
    bt.write_fai(recs, w)
    w.close()
    ix = bt.IndexedFasta(str(p))
    assert ix.fetch("s", 3, 9) == b"CCCGGG"
