"""Device kernel tests (run on CPU backend with interpret-mode Pallas;
the same code compiles natively on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.fastq.quality import SANGER_SCHEMA
from blazeseq_tpu.ops import nw, scan, stats, validate


def _padded_batch(n=50, lo=10, hi=40):
    buf = bt.generate_synthetic_fastq_buffer(n, lo, hi, 2, 40, "sanger")
    p = bt.FastqParser(bt.MemoryReader(buf))
    batch = p.next_batch(n)
    return batch, batch.to_padded()


def test_validate_decode_xla_clean():
    batch, pb = _padded_batch()
    codes, phred = validate.validate_decode(
        pb.seq, pb.qual, pb.lengths, SANGER_SCHEMA, prefer_pallas=False)
    assert int(np.sum(np.asarray(codes))) == 0
    # phred values match host decode record-for-record
    for i in range(len(batch)):
        r = batch.get_record(i)
        got = np.asarray(phred)[i, : len(r)]
        assert got.tolist() == r.phred_scores().tolist()


def test_validate_decode_pallas_matches_xla():
    _, pb = _padded_batch()
    c1, p1 = validate.validate_decode(
        pb.seq, pb.qual, pb.lengths, SANGER_SCHEMA, prefer_pallas=False)
    c2, p2 = validate.validate_decode(
        pb.seq, pb.qual, pb.lengths, SANGER_SCHEMA, prefer_pallas=True)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_validate_detects_bad_quality():
    _, pb = _padded_batch()
    qual = np.asarray(pb.qual).copy()
    qual[3, 0] = 1  # below sanger lower bound
    codes, _ = validate.validate_decode(
        pb.seq, qual, pb.lengths, SANGER_SCHEMA, prefer_pallas=False)
    codes = np.asarray(codes)
    assert codes[3] == 5 and np.sum(codes != 0) == 1


def test_validate_detects_non_ascii():
    _, pb = _padded_batch()
    seq = np.asarray(pb.seq).copy()
    seq[7, 2] = 0xC3
    codes, _ = validate.validate_decode(
        seq, pb.qual, pb.lengths, SANGER_SCHEMA, prefer_pallas=False)
    assert np.asarray(codes)[7] == 4


def test_qc_stats_counts():
    batch, pb = _padded_batch(n=64)
    st = stats.qc_stats(pb.seq, pb.qual, pb.lengths,
                        np.int32(33), n_records=np.int32(pb.n_records))
    assert int(st.reads) == 64
    assert int(st.bases) == batch.seq_len()
    bc = np.asarray(st.base_counts)
    assert int(bc.sum()) == batch.seq_len()
    # cross-check GC against host bytes
    seq_bytes = batch._sequence_bytes
    host_gc = int(np.sum((seq_bytes == ord("G")) | (seq_bytes == ord("C"))))
    assert int(st.gc_count) == host_gc
    # quality histogram covers every base
    assert int(np.asarray(st.qual_hist).sum()) == batch.seq_len()


def test_qc_accumulator_merges():
    acc = stats.QCAccumulator()
    b1, pb1 = _padded_batch(n=32, lo=10, hi=20)
    b2, pb2 = _padded_batch(n=16, lo=30, hi=60)
    for b, pb in [(b1, pb1), (b2, pb2)]:
        acc.add(stats.qc_stats(pb.seq, pb.qual, pb.lengths, np.int32(33),
                               n_records=np.int32(pb.n_records)))
    assert int(acc.total.reads) == 48
    assert int(acc.total.bases) == b1.seq_len() + b2.seq_len()
    assert 0.0 < acc.gc_fraction() < 1.0
    assert acc.mean_quality() > 0


def test_structural_bitmaps():
    data = b"@r1\nACGT\n+\nIIII\n" * 8
    chunk = np.frombuffer(data, dtype=np.uint8)
    nl, at, plus, counts = scan.structural_bitmaps(scan._pad_lane(chunk))
    total_nl = int(np.asarray(counts).sum())
    assert total_nl == data.count(b"\n")
    # reconstruct newline positions from the packed bitmap
    words = np.asarray(nl).reshape(-1)
    positions = []
    for w_idx, w in enumerate(words):
        for bit in range(32):
            if (int(w) >> bit) & 1:
                positions.append(w_idx * 32 + bit)
    expected = [i for i, b in enumerate(data) if b == ord("\n")]
    assert positions == expected


def test_newline_positions_device():
    data = b"@r\nAC\n+\nII\n@r2\nACGT\n+\nIIII\n"
    chunk = np.frombuffer(data, dtype=np.uint8)
    pos, count = scan.newline_positions_device(chunk, max_count=16)
    expected = [i for i, b in enumerate(data) if b == ord("\n")]
    assert int(count) == len(expected)
    assert np.asarray(pos)[: len(expected)].tolist() == expected


def test_record_offsets_device_matches_host():
    buf = bytes(bt.generate_synthetic_fastq_buffer(20, 10, 30, 2, 40, "sanger"))
    chunk = np.frombuffer(buf, dtype=np.uint8)
    offsets, n_rec, codes = scan.record_offsets_device(chunk, max_records=32)
    assert int(n_rec) == 20
    assert int(np.asarray(codes).sum()) == 0
    from blazeseq_tpu import native

    host = native.scan_fastq(chunk)
    assert np.array_equal(np.asarray(offsets)[:20], host.offsets)


def test_record_offsets_device_detects_structure_errors():
    data = b"@r1\nACGT\n+\nIIII\nX2\nGG\n+\nII\n@r3\nAC\n+\nIIII\n"
    chunk = np.frombuffer(data, dtype=np.uint8)
    _, n_rec, codes = scan.record_offsets_device(chunk, max_records=8)
    codes = np.asarray(codes)
    assert int(n_rec) == 3
    assert codes[0] == 0 and codes[1] == 1 and codes[2] == 3


def test_gather_padded_device():
    buf = bytes(bt.generate_synthetic_fastq_buffer(10, 5, 20, 2, 40, "sanger"))
    chunk = np.frombuffer(buf, dtype=np.uint8)
    offsets, n_rec, _ = scan.record_offsets_device(chunk, max_records=16)
    seq, qual, lengths = scan.gather_padded_device(chunk, offsets, 16, 32)
    p = bt.FastqParser(bt.MemoryReader(buf))
    for i, rec in enumerate(p.records()):
        L = int(np.asarray(lengths)[i])
        assert L == len(rec)
        assert bytes(np.asarray(seq)[i, :L]) == rec.sequence_bytes()
        assert bytes(np.asarray(qual)[i, :L]) == rec.quality_bytes()


def test_parse_fastq_device_end_to_end():
    """Raw bytes -> padded batch entirely on device, parity with host parse."""
    buf = bytes(bt.generate_synthetic_fastq_buffer(15, 8, 25, 2, 40, "sanger"))
    chunk = np.frombuffer(buf, dtype=np.uint8)
    seq, qual, lengths, n_rec, codes = scan.parse_fastq_device(
        chunk, max_records=16, max_len=32)
    assert int(n_rec) == 15
    assert int(np.asarray(codes).sum()) == 0
    host = list(bt.FastqParser(bt.MemoryReader(buf)).records())
    for i, r in enumerate(host):
        L = int(np.asarray(lengths)[i])
        assert L == len(r)
        assert bytes(np.asarray(seq)[i, :L]) == r.sequence_bytes()
        assert bytes(np.asarray(qual)[i, :L]) == r.quality_bytes()


# ---------------------------------------------------------------------------
# Needleman-Wunsch
# ---------------------------------------------------------------------------


def test_nw_cpu_known_scores():
    assert nw.needleman_wunsch_cpu(b"ACGT", b"ACGT") == 4
    assert nw.needleman_wunsch_cpu(b"ACGT", b"ACGA") == 2  # 3 match - 1 mismatch
    assert nw.needleman_wunsch_cpu(b"ACGT", b"") == -4
    assert nw.needleman_wunsch_cpu(b"", b"ACG") == -3
    assert nw.needleman_wunsch_cpu(b"AAAA", b"TTTT") == -4
    assert nw.needleman_wunsch_cpu(b"ACGT", b"AGT") == 2  # one gap


def test_nw_xla_matches_cpu():
    rng = np.random.default_rng(0)
    ref = bytes(rng.choice(list(b"ACGT"), size=37).astype(np.uint8))
    B, Lq = 23, 29
    lens = rng.integers(0, Lq + 1, size=B)
    seq = np.zeros((B, Lq), dtype=np.uint8)
    queries = []
    for i in range(B):
        q = bytes(rng.choice(list(b"ACGT"), size=int(lens[i])).astype(np.uint8))
        queries.append(q)
        seq[i, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    got = np.asarray(nw.nw_scores_xla(seq, lens.astype(np.int32),
                                      np.frombuffer(ref, dtype=np.uint8)))
    want = [nw.needleman_wunsch_cpu(q, ref) for q in queries]
    assert got.tolist() == want


def test_nw_pallas_matches_xla():
    rng = np.random.default_rng(1)
    ref = bytes(rng.choice(list(b"ACGT"), size=40).astype(np.uint8))
    B, Lq = 17, 33
    lens = rng.integers(1, Lq + 1, size=B).astype(np.int32)
    seq = np.zeros((B, Lq), dtype=np.uint8)
    for i in range(B):
        seq[i, : lens[i]] = rng.choice(list(b"ACGT"), size=int(lens[i]))
    a = np.asarray(nw.nw_scores_xla(seq, lens, np.frombuffer(ref, np.uint8)))
    b = np.asarray(nw.nw_scores_pallas(seq, lens, np.frombuffer(ref, np.uint8),
                                       block_records=32))
    assert a.tolist() == b.tolist()


def test_nw_batch_e2e_like_reference_example():
    """parse -> SoA -> device -> NW -> verify vs CPU twin
    (≡ examples/nw_gpu/main.mojo:72-87 score-equality assertion)."""
    buf = bt.generate_synthetic_fastq_buffer(64, 20, 40, 2, 40, "sanger")
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(64)
    pb = batch.to_padded()
    ref = b"GATTACAGATTACAGATTACAGATTACAGATTACAGATTA"
    scores = np.asarray(nw.nw_scores(pb.seq, pb.lengths,
                                     np.frombuffer(ref, np.uint8),
                                     prefer_pallas=False))
    for i in range(len(batch)):
        want = nw.needleman_wunsch_cpu(batch.get_record(i).sequence_bytes(), ref)
        assert scores[i] == want


# ---------------------------------------------------------------------------
# Smith-Waterman (local alignment, beyond reference)
# ---------------------------------------------------------------------------


def test_sw_cpu_known_scores():
    assert nw.smith_waterman_cpu(b"ACGT", b"ACGT") == 4
    assert nw.smith_waterman_cpu(b"ACGT", b"") == 0        # local: never negative
    assert nw.smith_waterman_cpu(b"", b"ACG") == 0
    assert nw.smith_waterman_cpu(b"AAAA", b"TTTT") == 0
    # best local hit is the embedded ACGT, penalties outside don't count
    assert nw.smith_waterman_cpu(b"TTACGTTT", b"GGACGTGG") == 4
    # one internal gap: ACG-T vs ACGAT -> 4 match - 1 gap
    assert nw.smith_waterman_cpu(b"ACGT", b"ACGAT") == 3


def test_sw_xla_matches_cpu():
    rng = np.random.default_rng(5)
    ref = bytes(rng.choice(list(b"ACGT"), size=37).astype(np.uint8))
    B, Lq = 23, 29
    lens = rng.integers(0, Lq + 1, size=B)
    seq = np.zeros((B, Lq), dtype=np.uint8)
    queries = []
    for i in range(B):
        q = bytes(rng.choice(list(b"ACGT"), size=int(lens[i])).astype(np.uint8))
        queries.append(q)
        seq[i, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    got = np.asarray(nw.sw_scores_xla(seq, lens.astype(np.int32),
                                      np.frombuffer(ref, dtype=np.uint8)))
    want = [nw.smith_waterman_cpu(q, ref) for q in queries]
    assert got.tolist() == want


def test_sw_xla_custom_penalties_match_cpu():
    rng = np.random.default_rng(6)
    ref = bytes(rng.choice(list(b"ACGT"), size=21).astype(np.uint8))
    B, Lq = 11, 17
    lens = rng.integers(1, Lq + 1, size=B)
    seq = np.zeros((B, Lq), dtype=np.uint8)
    queries = []
    for i in range(B):
        q = bytes(rng.choice(list(b"ACGT"), size=int(lens[i])).astype(np.uint8))
        queries.append(q)
        seq[i, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    got = np.asarray(nw.sw_scores_xla(seq, lens.astype(np.int32),
                                      np.frombuffer(ref, dtype=np.uint8),
                                      match=2, mismatch=-3, gap=-2))
    want = [nw.smith_waterman_cpu(q, ref, match=2, mismatch=-3, gap=-2)
            for q in queries]
    assert got.tolist() == want


def test_sw_padding_does_not_leak():
    # zero padding bytes beyond `lengths` must not contribute to the score
    ref = np.frombuffer(b"ACGT", np.uint8)
    seq = np.zeros((2, 8), np.uint8)
    seq[0, :4] = np.frombuffer(b"ACGT", np.uint8)
    seq[1, :8] = np.frombuffer(b"ACGTACGT", np.uint8)
    lens = np.array([4, 4], np.int32)  # row 1 truncated to its first 4 bytes
    got = np.asarray(nw.sw_scores_xla(seq, lens, ref))
    assert got.tolist() == [4, 4]


# ---------------------------------------------------------------------------
# Per-read distribution panels (FastQC-style, beyond reference)
# ---------------------------------------------------------------------------


def test_qc_row_histograms_match_numpy_twin():
    from blazeseq_tpu.ops.stats import GC_BINS, LEN_BINS, MAX_PHRED, qc_stats

    rng = np.random.default_rng(3)
    n, L = 37, 64
    lens = rng.integers(0, 80, n).astype(np.int32)  # some exceed L (clamped)
    seq = np.zeros((n, L), np.uint8)
    qual = np.zeros((n, L), np.uint8)
    for i in range(n):
        k = min(int(lens[i]), L)
        seq[i, :k] = rng.choice(list(b"ACGTN"), k)
        qual[i, :k] = rng.integers(33, 33 + 40, k)
    n_rec = 30  # rows >= n_rec are padding
    st = qc_stats(jnp.asarray(seq), jnp.asarray(qual), jnp.asarray(lens),
                  jnp.int32(33), n_records=jnp.int32(n_rec))

    len_h = np.zeros(LEN_BINS, np.int64)
    gc_h = np.zeros(GC_BINS, np.int64)
    mq_h = np.zeros(MAX_PHRED, np.int64)
    for i in range(n_rec):
        len_h[min(int(lens[i]), LEN_BINS - 1)] += 1
        k = min(int(lens[i]), L)
        if k == 0:
            continue
        row = seq[i, :k] & 0xDF
        gc = int((row == ord("C")).sum() + (row == ord("G")).sum())
        gc_h[(200 * gc + k) // (2 * k)] += 1
        qs = int(np.minimum(qual[i, :k].astype(int) - 33,
                            MAX_PHRED - 1).clip(0).sum())
        mq_h[min((2 * qs + k) // (2 * k), MAX_PHRED - 1)] += 1
    assert np.array_equal(np.asarray(st.length_hist), len_h)
    assert np.array_equal(np.asarray(st.gc_hist), gc_h)
    assert np.array_equal(np.asarray(st.mean_qual_hist), mq_h)
    # each panel counts every (non-empty, for gc/meanQ) read exactly once
    assert int(st.length_hist.sum()) == n_rec


def test_qc_row_partials_split_merge_equals_full():
    """Column-split partials psum'd (as under 'sp' sharding) bin to the same
    panels as the full-row computation."""
    from blazeseq_tpu.ops.stats import qc_stats, row_histograms, row_partials

    rng = np.random.default_rng(9)
    n, L = 16, 32
    lens = rng.integers(0, L + 1, n).astype(np.int32)
    seq = np.zeros((n, L), np.uint8)
    qual = np.zeros((n, L), np.uint8)
    for i in range(n):
        k = int(lens[i])
        seq[i, :k] = rng.choice(list(b"ACGT"), k)
        qual[i, :k] = rng.integers(33, 73, k)
    full = qc_stats(jnp.asarray(seq), jnp.asarray(qual), jnp.asarray(lens),
                    jnp.int32(33))
    h = L // 2
    parts = [row_partials(jnp.asarray(seq[:, c:c + h]),
                          jnp.asarray(qual[:, c:c + h]), jnp.asarray(lens),
                          jnp.int32(33), col_offset=jnp.int32(c))
             for c in (0, h)]
    gc = parts[0][0] + parts[1][0]
    qs = parts[0][1] + parts[1][1]
    cnt = parts[0][2] + parts[1][2]
    len_h, gc_h, mq_h = row_histograms(gc, qs, cnt, jnp.asarray(lens),
                                       jnp.int32(n))
    assert np.array_equal(np.asarray(len_h), np.asarray(full.length_hist))
    assert np.array_equal(np.asarray(gc_h), np.asarray(full.gc_hist))
    assert np.array_equal(np.asarray(mq_h), np.asarray(full.mean_qual_hist))


def test_adapter_content_matches_cpu_twin():
    from blazeseq_tpu.ops.adapter import adapter_content, adapter_content_cpu

    rng = np.random.default_rng(11)
    n, L = 60, 64
    ad = b"AGATCGGAAGAG"  # Illumina TruSeq prefix
    lens = rng.integers(0, L + 1, n).astype(np.int32)
    seq = np.zeros((n, L), np.uint8)
    reads = []
    for i in range(n):
        k = int(lens[i])
        r = rng.choice(list(b"ACGT"), k).astype(np.uint8)
        if k >= len(ad) and i % 3 == 0:  # plant the adapter in a third
            p = int(rng.integers(0, k - len(ad) + 1))
            r[p:p + len(ad)] = np.frombuffer(ad, np.uint8)
        seq[i, :k] = r
        reads.append(r.tobytes())
    st = adapter_content(jnp.asarray(seq), jnp.asarray(lens), jnp.int32(n),
                         adapter_host=ad)
    first, with_hit = adapter_content_cpu(reads, ad, max_len=L)
    assert np.asarray(st.first_occurrence).tolist() == first
    assert int(st.reads_with_adapter) == with_hit
    assert int(st.reads_scanned) == n
    # cumulative curve ends at the overall hit fraction
    assert abs(st.cumulative_fraction()[-1] - with_hit / n) < 1e-12


def test_adapter_content_case_and_padding():
    from blazeseq_tpu.ops.adapter import adapter_content

    seq = np.zeros((2, 16), np.uint8)
    seq[0, :8] = np.frombuffer(b"ccacgtcc", np.uint8)  # lowercase read
    seq[1, :8] = np.frombuffer(b"ACGTACGT", np.uint8)
    lens = np.array([8, 4], np.int32)  # row 1: hit at 4 is OUTSIDE true length
    st = adapter_content(jnp.asarray(seq), jnp.asarray(lens), jnp.int32(2),
                         adapter_host=b"acgt")
    first = np.asarray(st.first_occurrence)
    assert first[2] == 1 and first[0] == 1 and first.sum() == 2
    assert int(st.reads_with_adapter) == 2


def test_read_hashes_match_cpu_twin_and_dedup_levels():
    from blazeseq_tpu.ops.dedup import (duplication_levels, read_hashes,
                                        read_hashes_cpu)

    rng = np.random.default_rng(13)
    n, L = 50, 48
    # 20 distinct reads; some repeated 1x, 3x, and 12x (tests the >=10 bin)
    pool = [bytes(rng.choice(list(b"ACGT"), int(k)).astype(np.uint8))
            for k in rng.integers(10, L + 1, 20)]
    reads = pool[:15] + [pool[15]] * 3 + [pool[16]] * 12 \
        + [pool[17]] * 2 + pool[18:]
    reads = reads[:n] + pool[:max(0, n - len(reads))]
    reads = reads[:n]
    seq = np.zeros((n, L), np.uint8)
    lens = np.zeros(n, np.int32)
    for i, r in enumerate(reads):
        seq[i, :len(r)] = np.frombuffer(r, np.uint8)
        lens[i] = len(r)
    got = np.asarray(read_hashes(jnp.asarray(seq), jnp.asarray(lens),
                                 jnp.int32(n)))
    want = read_hashes_cpu(reads)
    assert np.array_equal(got, want)

    levels, frac_unique = duplication_levels(got)
    # exact truth from the byte strings themselves
    from collections import Counter
    truth = Counter(Counter(reads).values())
    want_levels = np.zeros(11, np.int64)
    for c, m in truth.items():
        want_levels[min(c, 10)] += m
    assert levels.tolist() == want_levels.tolist()
    n_unique_once = truth.get(1, 0)
    assert abs(frac_unique - n_unique_once / n) < 1e-12


def test_read_hashes_padding_rows_are_sentinel():
    from blazeseq_tpu.ops.dedup import read_hashes

    seq = np.zeros((4, 16), np.uint8)
    seq[0, :4] = np.frombuffer(b"ACGT", np.uint8)
    lens = np.array([4, 0, 0, 0], np.int32)
    h = np.asarray(read_hashes(jnp.asarray(seq), jnp.asarray(lens),
                               jnp.int32(1)))
    assert (h[1:] == 0xFFFFFFFF).all()
    assert (h[0] != 0xFFFFFFFF).any()


# ---------------------------------------------------------------------------
# Quality trimming (zero-copy, lengths-only; beyond reference)
# ---------------------------------------------------------------------------


def _random_qual_batch(seed, n=40, L=64, offset=33):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, L + 1, n).astype(np.int32)
    qual = np.zeros((n, L), np.uint8)
    quals = []
    for i in range(n):
        k = int(lens[i])
        q = rng.integers(offset, offset + 41, k).astype(np.uint8)
        qual[i, :k] = q
        quals.append(q.tobytes())
    return qual, lens, quals


def test_clip_ends_matches_cpu_twin():
    from blazeseq_tpu.ops.trim import clip_ends, clip_ends_cpu

    qual, lens, quals = _random_qual_batch(21)
    start, new_len = clip_ends(jnp.asarray(qual), jnp.asarray(lens),
                               jnp.int32(33), jnp.int32(10), jnp.int32(12))
    for i, q in enumerate(quals):
        s, m = clip_ends_cpu(q, 33, leading=10, trailing=12)
        assert (int(start[i]), int(new_len[i])) == (s, m), i


def test_sliding_window_trim_matches_cpu_twin():
    from blazeseq_tpu.ops.trim import (sliding_window_trim,
                                       sliding_window_trim_cpu)

    qual, lens, quals = _random_qual_batch(22)
    got = np.asarray(sliding_window_trim(jnp.asarray(qual), jnp.asarray(lens),
                                         jnp.int32(33), jnp.int32(25),
                                         window=4))
    for i, q in enumerate(quals):
        assert int(got[i]) == sliding_window_trim_cpu(q, 33, 25, 4), i


def test_bwa_trim_matches_cpu_twin():
    from blazeseq_tpu.ops.trim import bwa_trim, bwa_trim_cpu

    qual, lens, quals = _random_qual_batch(23)
    got = np.asarray(bwa_trim(jnp.asarray(qual), jnp.asarray(lens),
                              jnp.int32(33), jnp.int32(20)))
    for i, q in enumerate(quals):
        assert int(got[i]) == bwa_trim_cpu(q, 33, 20), i


def test_trim_known_cases():
    from blazeseq_tpu.ops.trim import bwa_trim, clip_ends, sliding_window_trim

    # qualities: 2 2 30 30 30 30 2 2 (offset 0 for readability)
    qual = np.array([[2, 2, 30, 30, 30, 30, 2, 2]], np.uint8)
    lens = np.array([8], np.int32)
    s, m = clip_ends(jnp.asarray(qual), jnp.asarray(lens), jnp.int32(0),
                     jnp.int32(3), jnp.int32(3))
    assert (int(s[0]), int(m[0])) == (2, 4)
    cut = sliding_window_trim(jnp.asarray(qual), jnp.asarray(lens),
                              jnp.int32(0), jnp.int32(20), window=4)
    assert int(cut[0]) == 0  # first window mean (2+2+30+30)/4 = 16 < 20
    cut = bwa_trim(jnp.asarray(qual), jnp.asarray(lens), jnp.int32(0),
                   jnp.int32(10))
    assert int(cut[0]) == 6  # drops the trailing two q=2 bases


def test_kmer_counts_match_cpu_twin():
    from blazeseq_tpu.ops.kmer import kmer_counts, kmer_counts_cpu

    rng = np.random.default_rng(31)
    n, L = 40, 48
    lens = rng.integers(0, L + 1, n).astype(np.int32)
    seq = np.zeros((n, L), np.uint8)
    reads = []
    for i in range(n):
        k = int(lens[i])
        r = rng.choice(list(b"ACGTNacgt"), k).astype(np.uint8)  # mixed case + N
        seq[i, :k] = r
        reads.append(r.tobytes())
    for k in (1, 3, 5):
        got = np.asarray(kmer_counts(jnp.asarray(seq), jnp.asarray(lens),
                                     jnp.int32(n), k=k))
        want = kmer_counts_cpu(reads, k=k)
        assert got.tolist() == want.tolist(), k


def test_kmer_counts_padding_and_rows_excluded():
    from blazeseq_tpu.ops.kmer import kmer_counts

    seq = np.zeros((2, 16), np.uint8)
    seq[0, :6] = np.frombuffer(b"ACGTAC", np.uint8)
    seq[1, :6] = np.frombuffer(b"GGGGGG", np.uint8)
    lens = np.array([6, 6], np.int32)
    # only the first row counts (n_records=1); 3 windows of k=4
    got = np.asarray(kmer_counts(jnp.asarray(seq), jnp.asarray(lens),
                                 jnp.int32(1), k=4))
    assert int(got.sum()) == 3
    acgt = (0 << 6) | (1 << 4) | (2 << 2) | 3
    assert got[acgt] == 1


def test_affine_wavefront_matches_twin_randomized():
    """Gotoh wavefront kernels (global + local) vs the scalar twins over
    random sequences, lengths, and penalty settings."""
    import random

    from blazeseq_tpu.ops.nw import (needleman_wunsch_affine_cpu,
                                     nw_affine_scores_xla,
                                     smith_waterman_affine_cpu,
                                     sw_affine_scores_xla)

    rng = random.Random(42)
    rand = lambda n: bytes(rng.choice(b"ACGT") for _ in range(n))
    for trial in range(3):
        Lr = rng.randint(1, 48)
        ref = rand(Lr)
        B, Lq = 10, 40
        seqs = [rand(rng.randint(0, Lq)) for _ in range(B)]
        lens = np.array([len(s) for s in seqs], np.int32)
        pad = np.zeros((B, Lq), np.uint8)
        for k, s in enumerate(seqs):
            pad[k, : len(s)] = np.frombuffer(s, np.uint8)
        go, ge = rng.choice([(-3, -1), (-5, -2), (-2, -2)])
        refj = jnp.asarray(np.frombuffer(ref, np.uint8))
        dev = np.asarray(nw_affine_scores_xla(
            jnp.asarray(pad), jnp.asarray(lens), refj,
            gap_open=go, gap_extend=ge))
        cpu = [needleman_wunsch_affine_cpu(s, ref, gap_open=go,
                                           gap_extend=ge) for s in seqs]
        assert list(dev) == cpu, (trial, go, ge)
        devl = np.asarray(sw_affine_scores_xla(
            jnp.asarray(pad), jnp.asarray(lens), refj,
            gap_open=go, gap_extend=ge))
        cpul = [smith_waterman_affine_cpu(s, ref, gap_open=go,
                                          gap_extend=ge) for s in seqs]
        assert list(devl) == cpul, (trial, go, ge)


def test_semiglobal_wavefront_matches_twin_randomized():
    import random

    from blazeseq_tpu.ops.nw import (nw_semiglobal_affine_scores_xla,
                                     nw_semiglobal_scores_xla,
                                     semiglobal_affine_cpu, semiglobal_cpu)

    rng = random.Random(11)
    rand = lambda n: bytes(rng.choice(b"ACGT") for _ in range(n))
    for trial in range(3):
        Lr = rng.randint(1, 48)
        ref = rand(Lr)
        B, Lq = 8, 36
        seqs = [rand(rng.randint(0, Lq)) for _ in range(B)]
        lens = np.array([len(s) for s in seqs], np.int32)
        pad = np.zeros((B, Lq), np.uint8)
        for k, s in enumerate(seqs):
            pad[k, : len(s)] = np.frombuffer(s, np.uint8)
        refj = jnp.asarray(np.frombuffer(ref, np.uint8))
        dev = np.asarray(nw_semiglobal_scores_xla(
            jnp.asarray(pad), jnp.asarray(lens), refj))
        assert list(dev) == [semiglobal_cpu(s, ref) for s in seqs]
        deva = np.asarray(nw_semiglobal_affine_scores_xla(
            jnp.asarray(pad), jnp.asarray(lens), refj,
            gap_open=-4, gap_extend=-1))
        assert list(deva) == [semiglobal_affine_cpu(s, ref, gap_open=-4,
                                                    gap_extend=-1)
                              for s in seqs]
