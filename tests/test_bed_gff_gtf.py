"""BED / GFF3 / GTF parser tests (ports of tests/bed/, tests/gff/ incl. the
AGAT fixture sweep with the reference's success/fail expectation table)."""

import glob
import os

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.bed import BedParser, BedRecord, BedWriter, ItemRgb, Strand
from blazeseq_tpu.errors import FastxEOFError, ParseError
from blazeseq_tpu.gff import (
    Gff3Parser,
    Gff3Strand,
    parse_gff3_attributes,
    parse_target_attribute,
)
from blazeseq_tpu.gtf import GtfParser, parse_gtf_attributes

DATA = os.path.join(os.path.dirname(__file__), "data")
BED_DIR = os.path.join(DATA, "bed_parser")
AGAT = os.path.join(DATA, "agat")


# ---------------------------------------------------------------------------
# BED
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [3, 4, 5, 6, 7, 8, 9, 12])
def test_bed_fixture_files(n):
    path = os.path.join(BED_DIR, "bed%d.bed" % n)
    recs = list(BedParser(bt.FileReader(path)).records())
    assert len(recs) >= 1
    for r in recs:
        assert r.num_fields == n
        assert r.ChromStart <= r.ChromEnd


def test_bed12_fields():
    recs = list(BedParser(bt.FileReader(os.path.join(BED_DIR, "bed12.bed"))).records())
    r = recs[0]
    assert r.chrom() == "chr22"
    assert (r.ChromStart, r.ChromEnd) == (1000, 5000)
    assert r.name() == "mRNA1"
    assert r.Score == 960
    assert r.Strand_ == Strand.Plus
    assert (r.ThickStart, r.ThickEnd) == (1200, 4900)
    assert r.ItemRgb_ == ItemRgb(255, 0, 0)
    assert r.BlockCount == 2
    assert r.BlockSizes == [567, 488]
    assert r.BlockStarts == [0, 3512]
    assert recs[1].Strand_ == Strand.Minus
    assert recs[1].ItemRgb_ == ItemRgb(0, 255, 0)


def test_bed_skips_track_browser_comments():
    data = (b"# comment\ntrack name=x\nbrowser position chr1\n"
            b"chr1\t10\t20\n\nchr2\t5\t9\n")
    recs = list(BedParser(bt.MemoryReader(data)).records())
    assert [(r.chrom(), r.ChromStart) for r in recs] == [("chr1", 10), ("chr2", 5)]


def test_bed_interval_conversion():
    r = list(BedParser(bt.MemoryReader(b"chr1\t10\t20\n")).records())[0]
    iv = r.interval()
    assert iv.start().get() == 11 and iv.end().get() == 20
    assert len(r) == 10


def test_bed_errors():
    with pytest.raises(ParseError, match="at least 3 fields"):
        BedParser(bt.MemoryReader(b"chr1\t10\n")).next_record()
    with pytest.raises(ParseError, match="chromStart must be <= chromEnd"):
        BedParser(bt.MemoryReader(b"chr1\t30\t20\n")).next_record()
    with pytest.raises(ParseError, match="invalid byte in integer"):
        BedParser(bt.MemoryReader(b"chr1\t1x\t20\n")).next_record()
    with pytest.raises(ParseError, match="score must be in"):
        BedParser(bt.MemoryReader(b"chr1\t1\t2\tn\t2000\n")).next_record()
    with pytest.raises(ParseError, match="strand must be"):
        BedParser(bt.MemoryReader(b"chr1\t1\t2\tn\t0\tx\n")).next_record()
    with pytest.raises(ParseError, match="itemRgb must be"):
        BedParser(bt.MemoryReader(
            b"chr1\t1\t2\tn\t0\t+\t1\t2\t1,2\n")).next_record()
    with pytest.raises(ParseError, match="components must be 0-255"):
        BedParser(bt.MemoryReader(
            b"chr1\t1\t2\tn\t0\t+\t1\t2\t300,0,0\n")).next_record()


def test_bed_writer_roundtrip():
    for n in (3, 6, 12):
        path = os.path.join(BED_DIR, "bed%d.bed" % n)
        recs = list(BedParser(bt.FileReader(path)).records())
        w = bt.buffered_writer_for_memory()
        bw = BedWriter(w)
        for r in recs:
            bw.write_record(r)
        w.flush()
        recs2 = list(BedParser(bt.MemoryReader(w._backend.getvalue())).records())
        assert [(r.Chrom, r.ChromStart, r.ChromEnd, r.Name, r.Score, r.Strand_)
                for r in recs] == \
            [(r.Chrom, r.ChromStart, r.ChromEnd, r.Name, r.Score, r.Strand_)
             for r in recs2]


def test_bed_other_fields_bed10():
    data = b"chr1\t1\t2\tn\t0\t+\t1\t2\t0\textraA\n"
    r = BedParser(bt.MemoryReader(data)).next_record()
    assert r.OtherFields == [b"extraA"]
    assert r.BlockCount is None


# ---------------------------------------------------------------------------
# GFF3
# ---------------------------------------------------------------------------

GFF_BASIC = (b"##gff-version 3\n"
             b"##sequence-region ctg123 1 1497228\n"
             b"ctg123\t.\tgene\t1000\t9000\t.\t+\t.\tID=gene00001;Name=EDEN\n"
             b"ctg123\t.\tmRNA\t1050\t9000\t6.2\t+\t.\tID=mRNA1;Parent=gene00001\n"
             b"ctg123\t.\tCDS\t1201\t1500\t.\t+\t0\tID=cds1;Parent=mRNA1\n")


def test_gff3_basic():
    p = Gff3Parser(bt.MemoryReader(GFF_BASIC))
    recs = list(p.records())
    assert len(recs) == 3
    g = recs[0]
    assert g.seqid() == "ctg123" and g.type() == "gene"
    assert (g.Start, g.End) == (1000, 9000)
    assert g.Score is None and g.Strand_ == Gff3Strand.Plus and g.Phase is None
    assert g.attributes().id() == b"gene00001"
    assert g.attributes().name() == b"EDEN"
    assert recs[1].Score == 6.2
    assert recs[1].attributes().parent() == [b"gene00001"]
    assert recs[2].Phase == 0
    regions = p.sequence_regions()
    assert len(regions) == 1
    assert regions[0].seqid == b"ctg123"
    assert regions[0].region.end().get() == 1497228


def test_gff3_multivalue_and_percent_decoding():
    attrs = parse_gff3_attributes(b"ID=x%3By;Dbxref=DB:1,DB:2;Note=a%2Cb")
    assert attrs.id() == b"x;y"
    assert attrs.dbxref() == [b"DB:1", b"DB:2"]
    assert attrs.note() == b"a,b"
    assert parse_gff3_attributes(b".").items() == []


def test_gff3_target_attribute():
    t = parse_target_attribute(b"EST23 1 21 +")
    assert t.target_id == b"EST23" and (t.start, t.end) == (1, 21)
    assert t.strand == Gff3Strand.Plus
    t2 = parse_target_attribute(b"EST9 5 10")
    assert t2.strand is None


def test_gff3_fasta_stop():
    data = GFF_BASIC + b"##FASTA\n>ctg123\nACGT\n"
    p = Gff3Parser(bt.MemoryReader(data))
    assert len(list(p.records())) == 3


def test_gff3_version_check():
    p = Gff3Parser(bt.MemoryReader(b"##gff-version 2\nctg\t.\tg\t1\t2\t.\t+\t.\tID=1\n"))
    with pytest.raises(ParseError, match="gff-version must be 3"):
        list(p.records())
    p = Gff3Parser(bt.MemoryReader(b"##gff-version 31\nctg\t.\tg\t1\t2\t.\t+\t.\tID=1\n"))
    with pytest.raises(ParseError, match="gff-version must be 3"):
        list(p.records())
    p = Gff3Parser(bt.MemoryReader(b"##gff-version 3.1.26\nctg\t.\tg\t1\t2\t.\t+\t.\tID=1\n"))
    assert len(list(p.records())) == 1


def test_gff3_errors():
    with pytest.raises(ParseError, match="exactly 9 fields"):
        Gff3Parser(bt.MemoryReader(b"a\tb\tc\n")).next_record()
    with pytest.raises(ParseError, match="coordinate must be >= 1"):
        Gff3Parser(bt.MemoryReader(b"a\tb\tg\t0\t5\t.\t+\t.\t.\n")).next_record()
    with pytest.raises(ParseError, match="start must be <= end"):
        Gff3Parser(bt.MemoryReader(b"a\tb\tg\t9\t5\t.\t+\t.\t.\n")).next_record()
    with pytest.raises(ParseError, match="strand must be"):
        Gff3Parser(bt.MemoryReader(b"a\tb\tg\t1\t5\t.\tx\t.\t.\n")).next_record()
    with pytest.raises(ParseError, match="phase must be"):
        Gff3Parser(bt.MemoryReader(b"a\tb\tg\t1\t5\t.\t+\t7\t.\n")).next_record()
    with pytest.raises(ParseError, match="CDS feature requires phase"):
        Gff3Parser(bt.MemoryReader(b"a\tb\tCDS\t1\t5\t.\t+\t.\t.\n")).next_record()


# ---------------------------------------------------------------------------
# GTF
# ---------------------------------------------------------------------------

GTF_LINE = (b'chr1\thavana\tgene\t11869\t14409\t.\t+\t.\t'
            b'gene_id "ENSG0001"; transcript_id "ENST0001"; '
            b'gene_name "DDX11L1"; exon_number 3;\n')


def test_gtf_basic():
    p = GtfParser(bt.MemoryReader(GTF_LINE))
    r = p.next_record()
    assert r.seqname() == "chr1" and r.feature() == "gene"
    assert r.Attributes.gene_id == b"ENSG0001"
    assert r.Attributes.transcript_id == b"ENST0001"
    assert r.Attributes.get("gene_name") == b"DDX11L1"
    assert r.Attributes.get("exon_number") == b"3"  # unquoted value


def test_gtf_escaped_quotes():
    attrs = parse_gtf_attributes(
        b'gene_id "g;1"; transcript_id "t\\"x"; note "a\\\\b";')
    assert attrs.gene_id == b"g;1"
    assert attrs.transcript_id == b't"x'
    assert attrs.get("note") == b"a\\b"


def test_gtf_missing_mandatory():
    data = b'chr1\ts\tgene\t1\t5\t.\t+\t.\tgene_name "x";\n'
    with pytest.raises(ParseError, match="gene_id attribute is missing"):
        GtfParser(bt.MemoryReader(data)).next_record()
    # non-strict: accepted
    p = GtfParser(bt.MemoryReader(data), strict_mandatory_attrs=False)
    assert p.next_view().Attributes.get("gene_name") == b"x"


def test_gtf_comments_skipped():
    data = b"#!genome-build x\n" + GTF_LINE
    assert len(list(GtfParser(bt.MemoryReader(data)).records())) == 1


# ---------------------------------------------------------------------------
# AGAT fixture sweep (expectation table from tests/gff/test_agat_fixtures.mojo)
# ---------------------------------------------------------------------------

AGAT_GFF_FAIL = {12, 28, 41, 43, 44, 47}

AGAT_OTHER = [
    ("gff_other/in/decode_gff3urlescape.gff", "gff3", True),
    ("gff_other/in/issue329.gff", "gff3", True),
    ("gff_other/in/issue368.gff", "gff3", True),
    ("gff_other/in/issue389.gff", "gff3", False),
    ("gff_other/in/issue441.gtf", "gtf", True),
    ("gff_other/in/issue448.gtf", "gtf", True),
    ("gff_other/in/issue457.gff", "gff3", True),
    ("script_sp/in/test_kraken.gtf", "gtf", True),
]


def _expected_data_lines(path):
    with open(path, "rb") as f:
        content = f.read()
    n = 0
    for line in content.split(b"\n"):
        s = line.strip()
        if not s:
            continue
        if s.startswith(b"##FASTA"):
            break
        if s.startswith(b"#"):
            continue
        n += 1
    return n


def _parse_counts(path, fmt):
    reader = bt.FileReader(path)
    parser = (Gff3Parser(reader) if fmt == "gff3"
              else GtfParser(reader, strict_mandatory_attrs=False))
    return sum(1 for _ in parser.views())


@pytest.mark.parametrize("i", range(48))
def test_agat_gff_syntax(i):
    path = os.path.join(AGAT, "gff_syntax", "in", "%d_test.gff" % i)
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    expected = _expected_data_lines(path)
    if i in AGAT_GFF_FAIL:
        try:
            n = _parse_counts(path, "gff3")
        except Exception:
            return  # parse error = expected failure
        assert n != expected, "expected failure but parsed all %d lines" % n
    else:
        assert _parse_counts(path, "gff3") == expected


@pytest.mark.parametrize("rel,fmt,ok", AGAT_OTHER)
def test_agat_other(rel, fmt, ok):
    path = os.path.join(AGAT, rel)
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    expected = _expected_data_lines(path)
    if ok:
        assert _parse_counts(path, fmt) == expected
    else:
        try:
            n = _parse_counts(path, fmt)
        except Exception:
            return
        assert n != expected
