"""Quality-schema autodetection (the FastQC min-byte heuristic) — beyond
the reference, which requires an explicit schema name."""

import gzip

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu import detect_quality_schema, detect_quality_schema_file


def _corpus(qual_lo, qual_hi, n=200, L=50):
    rng = np.random.default_rng(qual_lo * 1000 + qual_hi)
    recs = []
    for i in range(n):
        q = rng.integers(qual_lo, qual_hi + 1, L).astype(np.uint8)
        recs.append(b"@r%d\n%s\n+\n%s\n"
                    % (i, b"A" * L, q.tobytes()))
    return b"".join(recs)


@pytest.mark.parametrize("lo,hi,name", [
    (33, 73, "Sanger"),        # classic phred+33
    (35, 105, "Sanger"),       # wide phred+33 with high scores
    (59, 104, "Solexa"),       # solexa bytes start at ';'
    (64, 104, "Illumina v1.3"),
    (66, 104, "Illumina v1.5"),
])
def test_detect_ranges(lo, hi, name):
    assert detect_quality_schema(_corpus(lo, hi)).SCHEMA == name


def test_detect_early_exit_and_errors():
    # one low byte early: detection can stop before max_records
    buf = _corpus(66, 80, n=5) + _corpus(34, 40, n=1) + _corpus(66, 80, n=5)
    assert detect_quality_schema(buf).SCHEMA == "Sanger"
    # record-less input falls back to generic (every explicit-schema entry
    # point handles empty files gracefully, so "auto" must too) ...
    assert detect_quality_schema(b"").SCHEMA == "Generic"
    with pytest.raises(ValueError):
        detect_quality_schema(b"", default=None)
    # ... but structurally invalid bytes still raise
    with pytest.raises(Exception):
        detect_quality_schema(b"not fastq at all\n")


def test_auto_schema_on_empty_file(tmp_path, capsys):
    from blazeseq_tpu.__main__ import main

    p = tmp_path / "empty.fastq"
    p.write_bytes(b"")
    parser = bt.parser(str(p), quality_schema="auto")
    assert parser.count() == (0, 0)
    rc = main(["stats", "--schema", "auto", "--json", str(p)])
    assert rc == 0
    import json

    assert json.loads(capsys.readouterr().out)["reads"] == 0


def test_qc_model_auto_rejects_parser_entry_too():
    from blazeseq_tpu.models import QCModel

    m = QCModel(quality_schema="auto")
    parser = bt.FastqParser(bt.MemoryReader(_corpus(33, 73, n=4)))
    with pytest.raises(ValueError):
        m.run_parser(parser)


def test_detect_file_plain_and_gz(tmp_path):
    buf = _corpus(64, 104)
    p = tmp_path / "q.fastq"
    p.write_bytes(buf)
    assert detect_quality_schema_file(str(p)).SCHEMA == "Illumina v1.3"
    pz = tmp_path / "q.fastq.gz"
    pz.write_bytes(gzip.compress(buf, 1))
    assert detect_quality_schema_file(str(pz)).SCHEMA == "Illumina v1.3"


def test_parser_auto_schema(tmp_path):
    buf = _corpus(66, 100)
    p = tmp_path / "auto.fastq"
    p.write_bytes(buf)
    parser = bt.parser(str(p), quality_schema="auto", validate=True)
    assert parser.quality_schema.SCHEMA == "Illumina v1.5"
    n, _bases = parser.count()  # validates under the detected schema
    assert n == 200


def test_qc_model_auto_schema(tmp_path):
    from blazeseq_tpu.models import QCModel

    buf = _corpus(64, 100)
    p = tmp_path / "auto.fastq"
    p.write_bytes(buf)
    m = QCModel(quality_schema="auto", max_read_len=128)
    rep = m.run_file(str(p))
    assert m.schema.SCHEMA == "Illumina v1.3"
    assert rep.reads == 200
    # device path resolves too, and matches the explicit-schema run
    m2 = QCModel(quality_schema="auto", max_read_len=128)
    dev = m2.run_file_device(str(p), chunk_mb=1)
    exp = QCModel(quality_schema="illumina_1.3",
                  max_read_len=128).run_file(str(p))
    assert dev.to_dict() == exp.to_dict()
    # reader-based entry cannot peek twice
    m3 = QCModel(quality_schema="auto")
    with pytest.raises(ValueError):
        m3.run_reader(bt.MemoryReader(buf))


def test_stats_cli_schema_auto(tmp_path, capsys):
    from blazeseq_tpu.__main__ import main

    buf = _corpus(66, 100, n=60)
    p = tmp_path / "auto_cli.fastq"
    p.write_bytes(buf)
    rc = main(["stats", "--schema", "auto", "--json", str(p)])
    assert rc == 0
    import json

    rep = json.loads(capsys.readouterr().out)
    assert rep["reads"] == 60
    assert rep["error_reads"] == 0  # validated under the detected schema
