"""Device demultiplexing (ops/demux.py) and paired-end overlap merging
(ops/merge.py) vs their scalar host twins."""

import random

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.ops.demux import (demux_assign, demux_assign_host,
                                    demultiplex_counts,
                                    demultiplex_to_writers)
from blazeseq_tpu.ops.merge import (merge_pairs, merge_pairs_host,
                                    _revcomp_b)


def _pad(seqs, L):
    n = len(seqs)
    out = np.zeros((n, L), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    return out, lens


BARCODES = [b"ACGTAC", b"TTGGCA", b"ACGTAN", b"GGGGGG"]


def test_demux_matches_host_twin():
    rng = random.Random(7)
    seqs = []
    for _ in range(300):
        k = rng.randrange(len(BARCODES) + 1)
        if k < len(BARCODES):
            bc = bytearray(BARCODES[k].replace(b"N", b"A"))
            for _ in range(rng.randrange(0, 3)):  # up to 2 errors
                bc[rng.randrange(len(bc))] = rng.choice(b"ACGT")
            prefix = bytes(bc)
        else:
            prefix = bytes(rng.choice(b"ACGT") for _ in range(6))
        tail = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(4, 40)))
        seqs.append(prefix + tail)
    seq, lens = _pad(seqs, 64)
    got = np.asarray(demux_assign(seq, lens, BARCODES, 1)[0])
    want = demux_assign_host(seqs, BARCODES, 1)
    assert got.tolist() == want


def test_demux_wildcard_and_short_reads():
    seqs = [b"ACGTAAXXXX", b"ACGT", b"TTGGCAYYYY"]
    seq, lens = _pad(seqs, 32)
    a = np.asarray(demux_assign(seq, lens, BARCODES, 0)[0])
    # ACGTAA: exact for ACGTAN (wildcard) but 1-mm for ACGTAC -> with 0 mm
    # only the wildcard barcode matches -> index 2
    assert a[0] == 2
    assert a[1] == -1  # shorter than the barcode
    assert a[2] == 1


def test_demux_counts_and_writer_split(tmp_path):
    recs = []
    for i, bc in enumerate(BARCODES):
        for j in range(3):
            s = bc.replace(b"N", b"G") + b"ACGTACGT"
            recs.append(b"@r%d_%d\n%s\n+\n%s\n" % (i, j, s, b"I" * len(s)))
    recs.append(b"@junk\nCCCCCCCCCCCCCC\n+\nIIIIIIIIIIIIII\n")
    buf = b"".join(recs)
    parser = bt.FastqParser(bt.MemoryReader(buf))
    outs = [bt.BufferedWriter(bt.MemoryWriter()) for _ in BARCODES]
    un = bt.BufferedWriter(bt.MemoryWriter())
    totals = demultiplex_to_writers(parser, BARCODES, outs,
                                    unassigned_writer=un, max_mismatches=1)
    # ACGTAG matches both ACGTAC (1mm) and ACGTAN (0mm): unique best ->
    # sample 2; so sample 0 gets nothing from its own reads
    assert sum(totals) == 13
    assert totals[-1] >= 1
    for w in outs + [un]:
        w.flush()


def test_merge_matches_host_twin():
    rng = random.Random(11)
    r1 = []
    r2 = []
    for _ in range(120):
        frag_len = rng.randrange(40, 90)
        frag = bytes(rng.choice(b"ACGT") for _ in range(frag_len))
        rl = rng.randrange(30, 60)
        s1 = frag[:rl]
        s2 = _revcomp_b(frag[max(0, frag_len - rl):])
        q1 = bytes(rng.randrange(35, 74) for _ in range(len(s1)))
        q2 = bytes(rng.randrange(35, 74) for _ in range(len(s2)))
        r1.append((s1, q1))
        r2.append((s2, q2))
    L = 64
    seq1, len1 = _pad([a for a, _ in r1], L)
    qual1, _ = _pad([b for _, b in r1], L)
    seq2, len2 = _pad([a for a, _ in r2], L)
    qual2, _ = _pad([b for _, b in r2], L)
    res = merge_pairs(seq1, qual1, len1, seq2, qual2, len2, min_overlap=10)
    host = merge_pairs_host(r1, r2, min_overlap=10)
    n_merged = 0
    for i, (o, ms, mq) in enumerate(host):
        assert int(res.overlap[i]) == o, i
        if o:
            n_merged += 1
            ml = int(res.merged_len[i])
            assert ml == len(ms)
            assert bytes(np.asarray(res.seq[i, :ml])) == ms, i
            assert bytes(np.asarray(res.qual[i, :ml])) == mq, i
    assert n_merged > 60  # most constructed pairs genuinely overlap


def test_merge_mismatch_consensus_prefers_higher_quality():
    # non-repetitive fragment so only the true 8-base overlap aligns
    rng = random.Random(3)
    frag = bytes(rng.choice(b"ACGT") for _ in range(24))
    s1 = frag[:16]
    s2 = _revcomp_b(frag[8:])
    # corrupt R1 inside the overlap with a LOW quality base
    wrong = b"A" if s1[10:11] != b"A" else b"C"
    s1 = s1[:10] + wrong + s1[11:]
    q1 = bytes([70] * 10 + [35] + [70] * 5)
    q2 = bytes([70] * len(s2))
    host = merge_pairs_host([(s1, q1)], [(s2, q2)], min_overlap=4)
    assert host[0][0] == 8
    assert host[0][1] == frag  # R2's higher quality outvotes the corruption
    seq1, len1 = _pad([s1], 32)
    qual1, _ = _pad([q1], 32)
    seq2, len2 = _pad([s2], 32)
    qual2, _ = _pad([q2], 32)
    res = merge_pairs(seq1, qual1, len1, seq2, qual2, len2, min_overlap=4)
    assert int(res.overlap[0]) == 8
    ml = int(res.merged_len[0])
    assert bytes(np.asarray(res.seq[0, :ml])) == frag


def test_merge_rejects_non_overlapping():
    s1 = b"AAAAAAAAAAAAAAAAAAAA"
    s2 = b"CCCCCCCCCCCCCCCCCCCC"
    q = b"I" * 20
    seq1, len1 = _pad([s1], 32)
    qual1, _ = _pad([q], 32)
    seq2, len2 = _pad([s2], 32)
    qual2, _ = _pad([q], 32)
    res = merge_pairs(seq1, qual1, len1, seq2, qual2, len2, min_overlap=10)
    assert int(res.overlap[0]) == 0
    assert int(res.merged_len[0]) == 0


def test_demux_cli_splits_files(tmp_path):
    from blazeseq_tpu.__main__ import main

    recs = []
    for i, bc in enumerate([b"ACGTAC", b"TTGGCA"]):
        for j in range(3):
            s = bc + b"ACGTACGTAC"
            recs.append(b"@c%d_%d\n%s\n+\n%s\n" % (i, j, s, b"I" * len(s)))
    recs.append(b"@junk\nCCCCCCCCCCCCCCCC\n+\nIIIIIIIIIIIIIIII\n")
    src = tmp_path / "in.fastq"
    src.write_bytes(b"".join(recs))
    out = tmp_path / "out"
    rc = main(["demux", "--barcode", "s1=ACGTAC", "--barcode", "s2=TTGGCA",
               "--out", str(out), str(src)])
    assert rc == 0
    assert (out / "s1.fastq").read_bytes().count(b"@c0_") == 3
    assert (out / "s2.fastq").read_bytes().count(b"@c1_") == 3
    assert b"@junk" in (out / "unassigned.fastq").read_bytes()
