"""End-to-end model tests: QCModel streaming pipeline + NWAligner."""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.models import NWAligner, QCModel


def test_qc_model_end_to_end():
    n = 300
    buf = bytes(bt.generate_synthetic_fastq_buffer(n, 30, 120, 2, 40, "sanger"))
    model = QCModel(quality_schema="sanger", batch_size=128, max_read_len=128)
    report = model.run_reader(bt.MemoryReader(buf))
    # cross-check against the host count path
    records, bases = bt.FastqParser(bt.MemoryReader(buf)).count()
    assert report.reads == records == n
    assert report.bases == bases
    assert report.error_reads == 0
    assert 0.3 < report.gc_fraction < 0.7
    assert report.mean_quality > 0
    assert int(report.base_counts.sum()) == bases
    assert int(report.qual_hist.sum()) == bases


def test_qc_model_counts_error_reads():
    good = bytes(bt.generate_synthetic_fastq_buffer(10, 20, 30, 2, 40, "sanger"))
    bad = b"@bad\nACGT\n+\n\x01\x01\x01\x01\n"
    model = QCModel(quality_schema="sanger", batch_size=64)
    report = model.run_reader(bt.MemoryReader(good + bad))
    assert report.reads == 11
    assert report.error_reads == 1


def test_qc_model_with_alignment():
    buf = bytes(bt.generate_synthetic_fastq_buffer(20, 20, 40, 2, 40, "sanger"))
    ref = b"ACGTACGTACGTACGTACGT"
    model = QCModel(quality_schema="sanger", batch_size=32, align_to=ref)
    report = model.run_reader(bt.MemoryReader(buf))
    assert report.nw_scores is not None and len(report.nw_scores) == 20
    aligner = NWAligner(ref)
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(20)
    assert report.nw_scores.tolist() == aligner.score_cpu(batch).tolist()


def test_nw_aligner_verify_batch():
    """Device-vs-CPU score equality, the reference example's acceptance test
    (examples/nw_gpu/main.mojo:72-87)."""
    buf = bytes(bt.generate_synthetic_fastq_buffer(50, 20, 60, 2, 40, "sanger"))
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(50)
    aligner = NWAligner(b"GATTACA" * 8)
    assert aligner.verify_batch(batch)


def test_qc_model_adapter_panel():
    """adapters= runs the FastQC-style adapter scan alongside QC."""
    ad = b"AGATCGGAAGAG"
    recs = []
    for i in range(30):
        s = b"ACGT" * 10
        if i % 2 == 0:
            s = s[:12] + ad + s[12 + len(ad):]  # plant adapter at column 12
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
    buf = b"".join(recs)
    report = QCModel(quality_schema="sanger",
                     adapters=[ad]).run_parser(
        bt.FastqParser(bt.MemoryReader(buf)))
    st = report.adapter_stats[ad]
    assert int(st.reads_scanned) == 30
    assert int(st.reads_with_adapter) == 15
    assert int(st.first_occurrence[12]) == 15
    assert st.cumulative_fraction()[-1] == 0.5


def test_qc_report_to_dict_json_round_trip():
    import json

    ad = b"AGATCGGAAGAG"
    buf = bytes(bt.generate_synthetic_fastq_buffer(100, 40, 60, 2, 40,
                                                   "sanger"))
    report = QCModel(quality_schema="sanger", adapters=[ad],
                     track_duplicates=True).run_parser(
        bt.FastqParser(bt.MemoryReader(buf)))
    d = json.loads(json.dumps(report.to_dict()))  # must be JSON-serializable
    assert d["reads"] == 100
    assert sum(d["base_counts"].values()) == d["bases"]
    assert sum(d["length_hist"]) == 100
    assert d["adapters"]["AGATCGGAAGAG"]["reads_scanned"] == 100
    assert sum(d["duplication_levels"]) > 0
    assert "unique=" in str(report)


def test_qc_model_duplication_panel():
    """track_duplicates profiles exact duplicate levels over the sample."""
    uniq = [b"@u%d\n%s\n+\n%s\n" % (i, b"ACGT" * 5 + bytes([65 + i % 26] * 4),
                                    b"I" * 24) for i in range(20)]
    dup = [b"@d%d\nTTTTGGGGCCCCAAAATTTTGGGG\n+\n%s\n" % (i, b"I" * 24)
           for i in range(5)]
    report = QCModel(quality_schema="sanger",
                     track_duplicates=True).run_parser(
        bt.FastqParser(bt.MemoryReader(b"".join(uniq + dup))))
    lv = report.duplication_levels
    assert lv[5] == 1  # the one sequence seen 5 times
    assert lv[1] >= 18  # most of the unique pool
    assert 0 < report.frac_unique_reads < 1
    # the 5x sequence is > 0.1% of 25 reads -> overrepresented, count 5
    assert report.overrepresented[0] == (b"TTTTGGGGCCCCAAAATTTTGGGG", 5)


def test_nw_aligner_local_mode():
    """mode="local" runs Smith-Waterman; verify_batch checks device == twin."""
    buf = bytes(bt.generate_synthetic_fastq_buffer(40, 20, 60, 2, 40, "sanger"))
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(40)
    aligner = NWAligner(b"GATTACA" * 8, mode="local")
    assert aligner.verify_batch(batch)
    assert (aligner.score_batch(batch) >= 0).all()  # local scores never negative
    with pytest.raises(ValueError):
        NWAligner(b"ACGT", mode="overlap")


def test_padded_clamps_copy_but_keeps_true_length():
    """Reads longer than max_len: bytes clamped to the row, lengths exact
    (so bases counters stay correct)."""
    long = b"@r1\n" + b"A" * 300 + b"\n+\n" + b"I" * 300 + b"\n"
    p = bt.FastqParser(bt.MemoryReader(long + b"@r2\nACGT\n+\nIIII\n"))
    pb = p.next_padded(4, max_len=128)
    assert pb.n_records == 2
    assert np.asarray(pb.lengths)[:2].tolist() == [300, 4]
    assert bytes(np.asarray(pb.seq)[0]) == b"A" * 128
    # QC over this batch still counts the true base total
    from blazeseq_tpu.ops.stats import qc_stats

    st = qc_stats(np.asarray(pb.seq), np.asarray(pb.qual),
                  np.asarray(pb.lengths), np.int32(33),
                  n_records=np.int32(2))
    assert int(st.bases) == 304


def test_parser_padded_batches_roundtrip():
    buf = bytes(bt.generate_synthetic_fastq_buffer(100, 10, 50, 2, 40, "sanger"))
    p = bt.FastqParser(bt.MemoryReader(buf))
    pbs = list(p.padded_batches(40, max_len=64))
    assert [pb.n_records for pb in pbs] == [40, 40, 20]
    recs = list(bt.FastqParser(bt.MemoryReader(buf)).records())
    i = 0
    for pb in pbs:
        seq = np.asarray(pb.seq)
        qual = np.asarray(pb.qual)
        lens = np.asarray(pb.lengths)
        for k in range(pb.n_records):
            r = recs[i]
            assert lens[k] == len(r)
            assert bytes(seq[k, : lens[k]]) == r.sequence_bytes()
            assert bytes(qual[k, : lens[k]]) == r.quality_bytes()
            i += 1
    assert i == 100


def test_nw_aligner_affine_modes():
    """gap_open switches both modes to affine (Gotoh) gaps; device == twin
    on random batches, and affine with gap_open == gap_extend degenerates
    to the linear model exactly."""
    buf = bytes(bt.generate_synthetic_fastq_buffer(30, 20, 50, 2, 40,
                                                   "sanger"))
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(30)
    for mode in ("global", "local"):
        a = NWAligner(b"GATTACA" * 6, mode=mode, gap_open=-4, gap_extend=-1)
        assert a.verify_batch(batch)
        # degenerate affine == linear
        lin = NWAligner(b"GATTACA" * 6, mode=mode, prefer_pallas=False)
        deg = NWAligner(b"GATTACA" * 6, mode=mode, gap_open=-1,
                        gap_extend=-1)
        import numpy as np
        assert np.array_equal(lin.score_batch(batch), deg.score_batch(batch))


def test_affine_twin_known_cases():
    """Hand-checked Gotoh scores: one long gap must beat two short ones
    under affine scoring and not under linear."""
    from blazeseq_tpu.ops.nw import (needleman_wunsch_affine_cpu,
                                     needleman_wunsch_cpu)

    # query = ref with a 4-base block deleted: global affine score
    # = matches + one gap of length 4
    ref = b"ACGTACGTACGT"
    query = b"ACGTACGT"  # 4-base suffix... deletion of 4 ref bases
    aff = needleman_wunsch_affine_cpu(query, ref, gap_open=-3, gap_extend=-1)
    assert aff == 8 * 1 + (-3 + 3 * -1)  # 8 matches + length-4 gap = 2
    lin = needleman_wunsch_cpu(query, ref)
    assert lin == 8 - 4  # linear: 4 gap bases at -1
    # empty query: pure gap
    assert needleman_wunsch_affine_cpu(b"", b"ACG",
                                       gap_open=-3, gap_extend=-1) == -5
    assert needleman_wunsch_affine_cpu(b"", b"") == 0


def test_nw_aligner_semiglobal_mode():
    """mode="semiglobal": full query, free reference end-gaps; a query
    embedded in the reference scores a full match, and device == twin
    (linear AND affine)."""
    import numpy as np

    buf = bytes(bt.generate_synthetic_fastq_buffer(25, 20, 50, 2, 40,
                                                   "sanger"))
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(25)
    for kw in ({}, {"gap_open": -4, "gap_extend": -1}):
        a = NWAligner(b"GATTACA" * 10, mode="semiglobal", **kw)
        assert a.verify_batch(batch)
    # embedded query -> perfect score despite ref being longer
    emb = bt.FastqParser(bt.MemoryReader(
        b"@e\nGATTACA\n+\nIIIIIII\n")).next_batch(1)
    a = NWAligner(b"CCCC" + b"GATTACA" + b"TTTT", mode="semiglobal")
    assert a.score_batch(emb)[0] == 7


def test_qc_model_quartiles_panel():
    """track_quartiles=True: the per-position distribution must reproduce the
    existing exact panels (1-D hist, per-position sum) and its percentiles
    must match numpy oracles computed from the raw reads."""
    n = 400
    buf = bytes(bt.generate_synthetic_fastq_buffer(n, 40, 80, 2, 40,
                                                   "sanger"))
    base = QCModel(quality_schema="sanger", batch_size=128, max_read_len=128)
    plain = base.run_reader(bt.MemoryReader(buf))
    model = QCModel(quality_schema="sanger", batch_size=128,
                    max_read_len=128, track_quartiles=True)
    rep = model.run_reader(bt.MemoryReader(buf))

    # derived-identity: the 2-D hist collapses to the exact 1-D panels
    assert rep.reads == plain.reads and rep.bases == plain.bases
    assert np.array_equal(rep.qual_hist, plain.qual_hist)
    assert np.allclose(rep.per_position_mean_quality,
                       plain.per_position_mean_quality)
    h = np.asarray(rep.per_pos_qual_hist)
    assert h.ndim == 2 and h.shape[0] == 64
    assert int(h.sum()) == rep.bases
    assert np.array_equal(h.sum(axis=1)[: len(plain.qual_hist)],
                          np.asarray(plain.qual_hist)[: h.shape[0]])

    # percentile oracle from the raw reads
    reads = [r.quality_bytes() for r in
             bt.FastqParser(bt.MemoryReader(buf)).records()]
    width = max(len(q) for q in reads)
    qq = np.asarray(rep.quality_quartiles)
    assert qq.shape == (5, h.shape[1])
    for pos in [0, 1, width // 2, width - 1]:
        vals = np.sort([q[pos] - 33 for q in reads if len(q) > pos])
        if not vals.size:
            continue
        for row, p in zip(qq, (0.10, 0.25, 0.50, 0.75, 0.90)):
            k = max(int(np.ceil(p * vals.size)), 1) - 1
            assert row[pos] == vals[k], (pos, p)

    # to_dict carries the panel; the plain report does not
    d = rep.to_dict()
    assert set(d["quality_quartiles"]) == {"p10", "q1", "median", "q3",
                                           "p90"}
    assert "quality_quartiles" not in plain.to_dict()

    # device pipeline gates the knob with a clear error
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".fastq", delete=False) as f:
        f.write(buf)
    try:
        with pytest.raises(ValueError, match="quartiles"):
            model.run_file_device(f.name)
    finally:
        os.unlink(f.name)


def test_quartiles_html_panel(tmp_path):
    from blazeseq_tpu.report import render_html

    buf = bytes(bt.generate_synthetic_fastq_buffer(100, 30, 50, 2, 40,
                                                   "sanger"))
    rep = QCModel(quality_schema="sanger",
                  track_quartiles=True).run_reader(bt.MemoryReader(buf))
    html = render_html(rep)
    assert "Per-position quality (percentiles)" in html
    assert "median" in html
