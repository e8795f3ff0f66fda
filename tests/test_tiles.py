"""Per-tile quality panel (ops/tiles.py) vs a scalar host reference."""

import random

import numpy as np

import blazeseq_tpu as bt
from blazeseq_tpu.ops.tiles import (PerTileAccumulator,
                                    parse_illumina_tiles,
                                    per_tile_qual_sums)


def _mk_corpus(n=400, L=50, tiles=(1101, 1102, 2201)):
    rng = random.Random(5)
    recs = []
    want = []
    for i in range(n):
        t = rng.choice(tiles)
        ident = b"SIM:1:FCX:1:%d:%d:%d 1:N:0:5" % (t, i, i * 7)
        seq = bytes(rng.choice(b"ACGT") for _ in range(L))
        qual = bytes(rng.randrange(35, 74) for _ in range(L))
        recs.append(b"@" + ident + b"\n" + seq + b"\n+\n" + qual + b"\n")
        want.append((t, qual))
    return b"".join(recs), want


def test_tile_parsing_from_batch():
    buf, want = _mk_corpus()
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(1000)
    tiles = parse_illumina_tiles(batch._id_bytes, batch._id_ends)
    assert tiles.tolist() == [t for t, _ in want]


def test_tile_parsing_rejects_non_illumina():
    buf = b"@read_1\nAC\n+\nII\n@x:y\nGG\n+\nII\n"
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(10)
    tiles = parse_illumina_tiles(batch._id_bytes, batch._id_ends)
    assert tiles.tolist() == [-1, -1]


def test_per_tile_means_match_scalar_reference():
    buf, want = _mk_corpus()
    p = bt.FastqParser(bt.MemoryReader(buf))
    acc = PerTileAccumulator()
    for batch in p.batches(128):
        pb = batch.to_padded(max_len=64)
        tiles = parse_illumina_tiles(batch._id_bytes, batch._id_ends)
        acc.add_batch(tiles, pb.seq * 0 + pb.qual, pb.lengths, 33,
                      n_records=pb.n_records)
    ts, mean = acc.mean()

    # scalar reference (panel width = padded width, lane-rounded)
    ref_s = {}
    ref_c = {}
    L = mean.shape[1]
    for t, qual in want:
        s = ref_s.setdefault(t, np.zeros(L))
        c = ref_c.setdefault(t, np.zeros(L))
        for j, q in enumerate(qual):
            s[j] += q - 33
            c[j] += 1
    assert ts.tolist() == sorted(ref_s)
    for k, t in enumerate(ts.tolist()):
        with np.errstate(invalid="ignore", divide="ignore"):
            ref = ref_s[t] / ref_c[t]
        got = mean[k]
        m = ~np.isnan(ref)
        np.testing.assert_allclose(got[m], ref[m], rtol=0, atol=1e-9)
        assert np.isnan(got[~m]).all()


def test_deviation_sums_to_zero_weighted():
    buf, _ = _mk_corpus(n=200)
    p = bt.FastqParser(bt.MemoryReader(buf))
    batch = p.next_batch(1000)
    pb = batch.to_padded(max_len=64)
    tiles = parse_illumina_tiles(batch._id_bytes, batch._id_ends)
    acc = PerTileAccumulator()
    acc.add_batch(tiles, pb.qual, pb.lengths, 33, n_records=pb.n_records)
    ts, dev = acc.deviation()
    # count-weighted deviations cancel at every position with data
    counts = np.stack([acc._counts[t] for t in ts]).astype(np.float64)
    m = counts.sum(axis=0) > 0
    w = np.nansum(dev * counts, axis=0)[m]
    np.testing.assert_allclose(w, 0, atol=1e-6)
