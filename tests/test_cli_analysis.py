"""CLI coverage for the analysis subcommands (trim / merge / tiles).

These run in-process through blazeseq_tpu.__main__.main on the CPU
backend (conftest forces JAX_PLATFORMS=cpu), mirroring
tests/test_demux_merge.py::test_demux_cli_splits_files.
"""

import blazeseq_tpu as bt
from blazeseq_tpu.__main__ import main


def _fastq(recs):
    out = []
    for rid, seq, qual in recs:
        out.append(b"@%s\n%s\n+\n%s\n" % (rid, seq, qual))
    return b"".join(out)


def _read_fastq(path):
    recs = []
    p = bt.FastqParser(bt.open_reader(str(path)))
    for r in p.records():
        recs.append((r.id_bytes(), r.sequence_bytes(), r.quality_bytes()))
    return recs


def test_trim_cli_window(tmp_path, capsys):
    # 10 high-quality bases then 10 low-quality ones: SLIDINGWINDOW:4:q
    # keeps the good prefix and drops the bad tail.
    src = tmp_path / "in.fastq"
    src.write_bytes(_fastq([
        (b"r0", b"ACGTACGTAC" + b"TTTTTTTTTT", b"I" * 10 + b"#" * 10),
        (b"r1", b"GGGG", b"IIII"),
        (b"r2", b"CCCC", b"####"),  # all-bad: dropped entirely
    ]))
    out = tmp_path / "out.fastq"
    rc = main(["trim", "--mode", "window", "--q", "20",
               "--out", str(out), str(src)])
    assert rc == 0
    got = _read_fastq(out)
    assert [r[0] for r in got] == [b"r0", b"r1"]
    # windows of 4 starting at 0..8 have mean Q >= 20 (the window at 8
    # spans I,I,#,# = 21); the window at 9 drops to 11.5 -> cut at 9.
    assert got[0][1] == b"ACGTACGTA"
    assert got[0][2] == b"I" * 9
    assert got[1][1] == b"GGGG"
    text = capsys.readouterr().out
    assert "reads 3 -> kept 2" in text


def test_trim_cli_ends(tmp_path):
    # LEADING/TRAILING clip of quality <= threshold from both ends.
    src = tmp_path / "in.fastq"
    src.write_bytes(_fastq([(b"r0", b"AACGTACGTT", b"##IIIIII##")]))
    out = tmp_path / "out.fastq"
    rc = main(["trim", "--mode", "ends", "--q", "5",
               "--out", str(out), str(src)])
    assert rc == 0
    ((rid, seq, qual),) = _read_fastq(out)
    assert (rid, seq, qual) == (b"r0", b"CGTACG", b"IIIIII")


def test_merge_cli(tmp_path, capsys):
    # R1 suffix overlaps rc(R2) prefix by 12 bases.
    r1s = b"ACGTACGTACGTAAAACCCC"
    rc2 = b"ACGTAAAACCCCGGTTGGTT"  # starts at r1s offset 8 -> overlap 12
    comp = dict(zip(b"ACGT", b"TGCA"))
    r2s = bytes(comp[b] for b in reversed(rc2))
    src1 = tmp_path / "r1.fastq"
    src2 = tmp_path / "r2.fastq"
    src1.write_bytes(_fastq([(b"p0/1", r1s, b"I" * len(r1s))]))
    src2.write_bytes(_fastq([(b"p0/2", r2s, b"I" * len(r2s))]))
    out = tmp_path / "m.fastq"
    rc = main(["merge", "--min-overlap", "10", "--out", str(out),
               str(src1), str(src2)])
    assert rc == 0
    ((rid, seq, qual),) = _read_fastq(out)
    assert rid == b"p0/1"
    assert seq == r1s[:8] + rc2
    assert len(qual) == len(seq)
    text = capsys.readouterr().out
    assert "pairs 1" in text and "merged 1" in text


def test_merge_cli_unequal_counts(tmp_path, capsys):
    src1 = tmp_path / "r1.fastq"
    src2 = tmp_path / "r2.fastq"
    src1.write_bytes(_fastq([(b"a", b"ACGT", b"IIII"),
                             (b"b", b"ACGT", b"IIII")]))
    src2.write_bytes(_fastq([(b"a", b"ACGT", b"IIII")]))
    try:
        rc = main(["merge", str(src1), str(src2)])
    except SystemExit as e:
        rc = e.code
    assert rc == 1


def test_tiles_cli(tmp_path, capsys):
    recs = []
    for tile, q in ((2101, b"I"), (2102, b"5")):
        for i in range(3):
            rid = b"M00001:1:FC:1:%d:%d:%d" % (tile, 1000 + i, 2000 + i)
            recs.append((rid, b"ACGTACGT", q * 8))
    src = tmp_path / "in.fastq"
    src.write_bytes(_fastq(recs))
    rc = main(["tiles", str(src)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "tile 2101" in text and "tile 2102" in text
    # sanger 'I' = Q40, '5' = Q20
    assert "meanQ 40.00" in text
    assert "meanQ 20.00" in text


def test_tiles_cli_non_illumina(tmp_path, capsys):
    src = tmp_path / "in.fastq"
    src.write_bytes(_fastq([(b"read_0", b"ACGT", b"IIII")]))
    rc = main(["tiles", str(src)])
    assert rc == 0
    assert "no Illumina coordinate ids" in capsys.readouterr().out


def test_merge_cli_interleaved(tmp_path, capsys):
    r1s = b"ACGTACGTACGTAAAACCCC"
    rc2 = b"ACGTAAAACCCCGGTTGGTT"
    comp = dict(zip(b"ACGT", b"TGCA"))
    r2s = bytes(comp[b] for b in reversed(rc2))
    src = tmp_path / "il.fastq"
    src.write_bytes(_fastq([(b"p0/1", r1s, b"I" * len(r1s)),
                            (b"p0/2", r2s, b"I" * len(r2s))]))
    out = tmp_path / "m.fastq"
    rc = main(["merge", "--interleaved", "--min-overlap", "10",
               "--out", str(out), str(src)])
    assert rc == 0
    ((rid, seq, qual),) = _read_fastq(out)
    assert rid == b"p0/1"
    assert seq == r1s[:8] + rc2
    text = capsys.readouterr().out
    assert "pairs 1" in text and "merged 1" in text


def test_serialize_fastq_soa_round_trip():
    """The bulk serializers must reproduce the input byte-for-byte
    (full records) and agree with per-record slicing (trimmed)."""
    import numpy as np

    from blazeseq_tpu.fastq.batch import (serialize_fastq_rows,
                                          serialize_fastq_soa)

    buf = bytes(bt.generate_synthetic_fastq_buffer(500, 10, 80, 2, 40,
                                                   "sanger"))
    b = bt.FastqParser(bt.MemoryReader(buf)).next_batch(500)
    b._finalize()
    out = serialize_fastq_soa(b._id_bytes, b._id_ends, b._sequence_bytes,
                              b._quality_bytes, b._ends)
    assert out == buf  # fixed-width generator ids: byte-exact round trip

    # trimmed sub-slices: compare against a scalar reference
    rng = np.random.default_rng(0)
    lens = np.diff(b._ends, prepend=0)
    sub_start = rng.integers(0, np.maximum(lens // 2, 1))
    sub_len = rng.integers(0, np.maximum(lens - sub_start, 1))
    out2 = serialize_fastq_soa(b._id_bytes, b._id_ends, b._sequence_bytes,
                               b._quality_bytes, b._ends,
                               sub_start=sub_start, sub_len=sub_len)
    expect = []
    recs = list(bt.FastqParser(bt.MemoryReader(buf)).records())
    for k, r in enumerate(recs):
        a, ln = int(sub_start[k]), int(sub_len[k])
        if ln <= 0:
            continue
        expect.append(b"@%s\n%s\n+\n%s\n" % (
            r.id_bytes(), r.sequence_bytes()[a:a + ln],
            r.quality_bytes()[a:a + ln]))
    assert out2 == b"".join(expect)

    # padded-rows variant agrees with the SoA variant
    pb = b.to_padded()
    out3 = serialize_fastq_rows(b._id_bytes, b._id_ends,
                                pb.seq[: pb.n_records],
                                pb.qual[: pb.n_records],
                                lens)
    assert out3 == buf


def test_filter_cli(tmp_path, capsys):
    import numpy as np

    from blazeseq_tpu.__main__ import main

    recs = [
        (b"short", b"ACG", b"III"),                 # len 3
        (b"long", b"A" * 30, b"I" * 30),            # len 30, high Q
        (b"lowq", b"ACGTACGT", b"####$$$$"),        # mean Q ~2.5
        (b"good", b"ACGTACGTAC", b"I" * 10),        # len 10, Q40
    ]
    src = tmp_path / "f.fastq"
    src.write_bytes(_fastq(recs))
    out = tmp_path / "out.fastq"
    rc = main(["filter", "--min-len", "5", "--max-len", "20",
               "--min-q", "20", "--out", str(out), str(src)])
    assert rc == 0
    got = _read_fastq(out)
    assert [r[0] for r in got] == [b"good"]
    assert "reads 4 -> kept 1" in capsys.readouterr().out

    # subsample: deterministic under a seed, roughly the right rate
    big = tmp_path / "big.fastq"
    big.write_bytes(_fastq([(b"r%d" % i, b"ACGTACGT", b"IIIIIIII")
                            for i in range(2000)]))
    o1 = tmp_path / "s1.fastq"
    o2 = tmp_path / "s2.fastq"
    main(["filter", "--fraction", "0.25", "--seed", "7",
          "--out", str(o1), str(big)])
    main(["filter", "--fraction", "0.25", "--seed", "7",
          "--out", str(o2), str(big)])
    assert o1.read_bytes() == o2.read_bytes()
    n = o1.read_bytes().count(b"@r")
    assert 380 < n < 620
