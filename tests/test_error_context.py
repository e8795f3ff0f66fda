"""Error-context completeness (reference: tests/test_error_context.mojo —
record number / line number / file position / snippet must be present and
correct in ParseError/ValidationError)."""

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import FastxErrorCode, ParseError, ValidationError


def test_structure_error_context_fields():
    bad = b"@r0\nACGT\n+\nIIII\n@r1\nACGT\nX\nIIII\n"
    p = bt.FastqParser(bt.MemoryReader(bad))
    with pytest.raises(ParseError) as ei:
        for _ in p.views():
            pass
    e = ei.value
    assert e.code == FastxErrorCode.SEP_NO_PLUS
    msg = str(e)
    assert "Record number: 2" in msg
    assert "Line number: 5" in msg
    assert "File position: 16" in msg  # byte offset of record 2's start
    assert "@r1" in msg  # snippet shows the offending record


def test_id_no_at_error_context():
    bad = b"@ok\nAC\n+\nII\nnot_at\nAC\n+\nII\n"
    p = bt.FastqParser(bt.MemoryReader(bad))
    with pytest.raises(ParseError) as ei:
        for _ in p.records():
            pass
    assert ei.value.code == FastxErrorCode.ID_NO_AT
    assert "Record number: 2" in str(ei.value)


def test_len_mismatch_error_context():
    bad = b"@a\nACGT\n+\nIII\n"
    p = bt.FastqParser(bt.MemoryReader(bad))
    with pytest.raises(ParseError) as ei:
        p.next_view()
    assert ei.value.code == FastxErrorCode.SEQ_QUAL_LEN_MISMATCH
    assert "Record number: 1" in str(ei.value)


def test_validation_error_context_and_snippet():
    cfg = bt.ParserConfig(check_quality=True, quality_schema="sanger")
    bad = b"@r0\nAC\n+\nII\n@r1\nAC\n+\n I\n"  # ' ' below sanger lower bound
    p = bt.FastqParser(bt.MemoryReader(bad), config=cfg)
    served = 0
    with pytest.raises(ValidationError) as ei:
        for _ in p.views():
            served += 1
    assert served == 1
    msg = str(ei.value)
    assert "Record number: 2" in msg
    assert "quality" in msg
    assert "r1" in msg  # snippet carries the record id


def test_ascii_error_context():
    cfg = bt.ParserConfig(check_ascii=True)
    bad = b"@a\nAC\xffT\n+\nIIII\n"
    p = bt.FastqParser(bt.MemoryReader(bad), config=cfg)
    with pytest.raises(ValidationError) as ei:
        p.next_view()
    assert "Record number: 1" in str(ei.value)


def test_context_correct_after_many_records():
    """Counters must survive window refills and queue rescans."""
    good = b"".join(b"@g%d\nACGT\n+\nIIII\n" % i for i in range(1000))
    bad = good + b"@bad\nACGT\n+\nIII\n"
    p = bt.FastqParser(bt.MemoryReader(bad))
    n = 0
    with pytest.raises(ParseError) as ei:
        for _ in p.views():
            n += 1
    assert n == 1000
    msg = str(ei.value)
    assert "Record number: 1001" in msg
    assert "Line number: 4001" in msg
    assert "File position: %d" % len(good) in msg


def test_fasta_error_context():
    bad = b">a\nACGT\nnoheader_after_blank\n\n>b\n\n>c\nAC\n"
    p = bt.FastaParser(bt.MemoryReader(bad))
    with pytest.raises(ParseError) as ei:
        for _ in p.records():
            pass
    assert "empty sequence" in str(ei.value).lower()
