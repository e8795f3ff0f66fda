"""FASTQ corpus correctness: every valid/invalid file in tests/data/fastq_parser
exercised via records(), views(), and batches() paths.

Port of the reference suite tests/fastq/test_fastq_parser_correctness.mojo
(140 tests over the BioJava/Biopython/BioPerl shared corpus). The same files,
schemas, and expected error classes are used.
"""

import os

import pytest

import blazeseq_tpu as bt

DATA = os.path.join(os.path.dirname(__file__), "data", "fastq_parser")

CORRUPT_QUAL = "Corrupt quality score according to provided schema"
COR_LEN = "Quality and sequence line do not match in length"
COR_SEQ_HED = "Sequence id line does not start with '@'"
SEP_LINE_START = "Separator line does not start with '+'"

VALID_FILES = [
    ("example.fastq", "generic"),
    ("example_dos.fastq", "generic"),
    ("illumina_example.fastq", "illumina_1.3"),
    ("illumina_faked.fastq", "illumina_1.3"),
    ("illumina_full_range_as_illumina.fastq", "illumina_1.3"),
    ("illumina_full_range_as_sanger.fastq", "sanger"),
    ("illumina_full_range_as_solexa.fastq", "solexa"),
    ("illumina_full_range_original_illumina.fastq", "illumina_1.3"),
    ("longreads_as_illumina.fastq", "illumina_1.3"),
    ("longreads_as_sanger.fastq", "sanger"),
    ("longreads_as_solexa.fastq", "solexa"),
    ("misc_dna_as_illumina.fastq", "illumina_1.3"),
    ("misc_dna_as_sanger.fastq", "sanger"),
    ("misc_dna_as_solexa.fastq", "solexa"),
    ("misc_dna_original_sanger.fastq", "sanger"),
    ("misc_rna_as_illumina.fastq", "illumina_1.3"),
    ("misc_rna_as_sanger.fastq", "sanger"),
    ("misc_rna_as_solexa.fastq", "solexa"),
    ("misc_rna_original_sanger.fastq", "sanger"),
    ("sanger_93.fastq", "sanger"),
    ("sanger_faked.fastq", "sanger"),
    ("sanger_full_range_as_illumina.fastq", "illumina_1.3"),
    ("sanger_full_range_as_sanger.fastq", "sanger"),
    ("sanger_full_range_as_solexa.fastq", "solexa"),
    ("sanger_full_range_original_sanger.fastq", "sanger"),
    ("solexa_example.fastq", "solexa"),
    ("solexa_faked.fastq", "solexa"),
    ("solexa_full_range_as_illumina.fastq", "illumina_1.3"),
    ("solexa_full_range_as_sanger.fastq", "sanger"),
    ("solexa_full_range_as_solexa.fastq", "solexa"),
    ("solexa_full_range_original_solexa.fastq", "solexa"),
    ("test1_sanger.fastq", "sanger"),
    ("test2_solexa.fastq", "solexa"),
    ("test3_illumina.fastq", "illumina_1.3"),
    ("wrapping_as_illumina.fastq", "illumina_1.3"),
    ("wrapping_as_sanger.fastq", "sanger"),
    ("wrapping_as_solexa.fastq", "solexa"),
]

# (file, expected message fragment). The reference accepts any structure-error
# class or EOF as alternates (test_fastq_parser_correctness.mojo:21-56); we
# assert the same acceptance set.
INVALID_FILES = [
    ("empty.fastq", "EOF"),
    ("error_diff_ids.fastq", "EOF"),
    ("error_long_qual.fastq", COR_LEN),
    ("error_no_qual.fastq", COR_LEN),
    ("error_trunc_in_plus.fastq", COR_LEN),
    ("error_trunc_at_qual.fastq", COR_LEN),
    ("error_double_qual.fastq", COR_SEQ_HED),
    ("error_trunc_at_seq.fastq", COR_LEN),
    ("error_trunc_in_seq.fastq", COR_LEN),
    ("error_trunc_in_title.fastq", COR_LEN),
    ("error_double_seq.fastq", COR_LEN),
    ("error_trunc_at_plus.fastq", COR_LEN),
    ("error_qual_null.fastq", CORRUPT_QUAL),
    ("error_qual_space.fastq", CORRUPT_QUAL),
    ("error_spaces.fastq", CORRUPT_QUAL),
    ("error_qual_vtab.fastq", CORRUPT_QUAL),
    ("error_tabs.fastq", CORRUPT_QUAL),
    ("error_qual_tab.fastq", CORRUPT_QUAL),
    ("error_qual_del.fastq", CORRUPT_QUAL),
    ("error_qual_escape.fastq", CORRUPT_QUAL),
    ("solexa-invalid-description.fastq", COR_SEQ_HED),
    ("solexa-invalid-repeat-description.fastq", "EOF"),
    ("sanger-invalid-description.fastq", COR_SEQ_HED),
    ("sanger-invalid-repeat-description.fastq", "EOF"),
    ("illumina-invalid-description.fastq", COR_SEQ_HED),
    ("illumina-invalid-repeat-description.fastq", "EOF"),
    ("error_qual_unit_sep.fastq", CORRUPT_QUAL),
    ("error_short_qual.fastq", COR_LEN),
    ("error_trunc_in_qual.fastq", COR_LEN),
    ("zero_length.fastq", COR_LEN),
]

GZ_FILES = [
    ("example.fastq.gz", "generic"),
    ("example.fastq.bgz", "generic"),
    ("example_dos.fastq.bgz", "generic"),
]

_ACCEPTED = (COR_LEN, COR_SEQ_HED, SEP_LINE_START,
             "Plus line does not start with '+'", "EOF")


def _validated_parser(path):
    cfg = bt.ParserConfig(check_ascii=True, check_quality=True)
    return bt.FastqParser(bt.FileReader(path), config=cfg)


@pytest.mark.parametrize("fname,schema", VALID_FILES)
def test_valid_records(fname, schema):
    p = bt.FastqParser(bt.FileReader(os.path.join(DATA, fname)), schema)
    n = 0
    for rec in p.records():
        assert len(rec.sequence_bytes()) == len(rec.quality_bytes())
        n += 1
    assert n > 0


@pytest.mark.parametrize("fname,schema", VALID_FILES)
def test_valid_views(fname, schema):
    p = bt.FastqParser(bt.FileReader(os.path.join(DATA, fname)), schema)
    n = 0
    for view in p.views():
        _ = view.id()
        _ = view.sequence()
        _ = view.quality()
        n += 1
    assert n > 0


@pytest.mark.parametrize("fname,schema", VALID_FILES)
def test_valid_batches(fname, schema):
    p = bt.FastqParser(bt.FileReader(os.path.join(DATA, fname)), schema)
    total = sum(len(b) for b in p.batches(7))
    p2 = bt.FastqParser(bt.FileReader(os.path.join(DATA, fname)), schema)
    assert total == sum(1 for _ in p2.records())


@pytest.mark.parametrize("fname,schema", VALID_FILES)
def test_valid_padded(fname, schema):
    """Padded device-layout mode agrees with views record-for-record."""
    import numpy as np
    golden = []
    p = bt.FastqParser(bt.FileReader(os.path.join(DATA, fname)), schema)
    for v in p.views():
        golden.append((bytes(v.sequence_bytes()), bytes(v.quality_bytes())))
    p2 = bt.FastqParser(bt.FileReader(os.path.join(DATA, fname)), schema)
    k = 0
    for pb in p2.padded_batches(5, max_len=4096):
        for i in range(pb.n_records):
            L = int(pb.lengths[i])
            seq, qual = golden[k]
            assert bytes(np.asarray(pb.seq[i, :min(L, 4096)]).tobytes()) \
                == seq[:4096]
            assert bytes(np.asarray(pb.qual[i, :min(L, 4096)]).tobytes()) \
                == qual[:4096]
            assert L == len(seq)
            k += 1
    assert k == len(golden)


@pytest.mark.parametrize("fname,msg", INVALID_FILES)
def test_invalid_records(fname, msg):
    p = _validated_parser(os.path.join(DATA, fname))
    with pytest.raises(Exception) as ei:
        while True:
            p.next_record()
    err = str(ei.value)
    assert any(m in err for m in (msg,) + _ACCEPTED), err


@pytest.mark.parametrize("fname,msg", INVALID_FILES)
def test_invalid_views(fname, msg):
    cfg = bt.ParserConfig(check_ascii=True, check_quality=True,
                          buffer_capacity=1024 * 1024,
                          buffer_growth_enabled=True,
                          buffer_max_capacity=1024 * 1024)
    p = bt.FastqParser(bt.FileReader(os.path.join(DATA, fname)), config=cfg)
    with pytest.raises(Exception) as ei:
        while True:
            p.next_view()
    err = str(ei.value)
    assert any(m in err for m in (msg,) + _ACCEPTED), err


@pytest.mark.parametrize("fname,msg", INVALID_FILES)
def test_invalid_count_mode(fname, msg):
    """count() must surface the same first error as record iteration.

    Files whose only 'error' is exhaustion (expected EOF) simply finish:
    count() folds the EOF into its return instead of raising."""
    p2 = _validated_parser(os.path.join(DATA, fname))
    n = 0
    ends_in_eof = False
    try:
        while True:
            p2.next_record()
            n += 1
    except bt.FastxEOFError:
        ends_in_eof = True
    except Exception:
        pass
    p = _validated_parser(os.path.join(DATA, fname))
    if ends_in_eof:
        records, _ = p.count()
        assert records == n
        return
    with pytest.raises(Exception) as ei:
        p.count()
    err = str(ei.value)
    assert any(m in err for m in (msg,) + _ACCEPTED), err


@pytest.mark.parametrize("fname,schema", GZ_FILES)
def test_valid_gz_records(fname, schema):
    p = bt.FastqParser(bt.ParallelGzipReader(os.path.join(DATA, fname)), schema)
    assert sum(1 for _ in p.records()) > 0


@pytest.mark.parametrize("fname,schema", GZ_FILES)
def test_valid_gz_views(fname, schema):
    p = bt.FastqParser(bt.ParallelGzipReader(os.path.join(DATA, fname)), schema)
    assert sum(1 for _ in p.views()) > 0


@pytest.mark.parametrize("fname,schema", GZ_FILES)
def test_gz_matches_plain(fname, schema):
    plain = fname.rsplit(".", 1)[0]
    p1 = bt.FastqParser(bt.ParallelGzipReader(os.path.join(DATA, fname)), schema)
    p2 = bt.FastqParser(bt.FileReader(os.path.join(DATA, plain)), schema)
    r1 = [(r.id_bytes(), r.sequence_bytes(), r.quality_bytes())
          for r in p1.records()]
    r2 = [(r.id_bytes(), r.sequence_bytes(), r.quality_bytes())
          for r in p2.records()]
    assert r1 == r2


def test_gzfile_reader_matches():
    p1 = bt.FastqParser(bt.GZFile(os.path.join(DATA, "example.fastq.gz")))
    p2 = bt.FastqParser(bt.FileReader(os.path.join(DATA, "example.fastq")))
    assert [r.id() for r in p1.records()] == [r.id() for r in p2.records()]
