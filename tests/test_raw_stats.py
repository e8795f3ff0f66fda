"""Raw-stream device QC (ops/raw_stats.py) vs the host parser, on the
8-device-CPU jax configured by conftest."""

import numpy as np
import pytest

import blazeseq_tpu as bt


def _golden(buf: bytes):
    import collections
    p = bt.FastqParser(bt.MemoryReader(buf))
    reads = bases = 0
    comp = collections.Counter()
    qsum = 0
    for v in p.views():
        reads += 1
        s = bytes(v.sequence_bytes())
        bases += len(s)
        for ch in s.upper():
            comp["ACGT"[("ACGT".index(chr(ch)))] if chr(ch) in "ACGT"
                 else "other"] += 1
        for qb in bytes(v.quality_bytes()):
            qsum += max(0, min(qb - 33, 63))
    return reads, bases, comp, qsum


@pytest.mark.parametrize("kind", ["uniform", "mixed", "dos", "tail"])
def test_raw_stream_qc_matches_host(kind):
    import jax.numpy as jnp
    from blazeseq_tpu.ops.raw_stats import raw_stream_qc

    if kind == "uniform":
        buf = bytes(bt.generate_synthetic_fastq_buffer(300, 80, 80, 2, 40,
                                                       "sanger"))
    elif kind == "mixed":
        buf = bytes(bt.generate_synthetic_fastq_buffer(300, 20, 200, 2, 40,
                                                       "sanger"))
    elif kind == "dos":
        buf = b"@a\r\nACGT\r\n+\r\nIIII\r\n@b\r\nGG\r\n+\r\nII\r\n"
    else:  # trailing partial record
        buf = b"@a\nACGT\n+\nIIII\n@b\nGG\n+"

    complete = buf
    if kind == "tail":
        complete = buf[: buf.rindex(b"@b")]
    reads, bases, comp, qsum = _golden(complete)

    r = raw_stream_qc(jnp.asarray(np.frombuffer(buf, np.uint8)),
                      jnp.int32(33), jnp.int32(126), jnp.int32(33))
    assert int(r.reads) == reads
    assert int(r.bases) == bases
    got = np.asarray(r.base_counts)
    assert got[0] == comp["A"] and got[1] == comp["C"]
    assert got[2] == comp["G"] and got[3] == comp["T"]
    assert got[4] == comp["other"]  # CR bytes in DOS files land here
    assert r.mean_q_sum() == qsum
    assert int(np.asarray(r.qual_hist).sum()) == bases
    assert not bool(r.bad_structure)
    assert not bool(r.seq_qual_mismatch)
    # DOS quality lines retain the '\r' (13), which is below the sanger
    # lower bound — the host Validator flags those too (CR retention
    # semantics), so the device flag must match
    assert bool(r.bad_quality) == (kind == "dos")
    if kind == "tail":
        assert int(r.tail_start) == len(complete)


def test_raw_stream_qc_flags():
    import jax.numpy as jnp
    from blazeseq_tpu.ops.raw_stats import raw_stream_qc

    def run(buf, lower=33, upper=126):
        return raw_stream_qc(jnp.asarray(np.frombuffer(buf, np.uint8)),
                             jnp.int32(lower), jnp.int32(upper),
                             jnp.int32(33))

    ok = b"@a\nAC\n+\nII\n"
    r = run(ok)
    assert not bool(r.bad_structure) and not bool(r.bad_ascii)

    r = run(b"Xa\nAC\n+\nII\n")
    assert bool(r.bad_structure)          # header without '@'
    r = run(b"@a\nAC\nx\nII\n")
    assert bool(r.bad_structure)          # separator without '+'
    r = run(b"@a\nAC\xff\n+\nII\xff\n")
    assert bool(r.bad_ascii)
    r = run(b"@a\nAC\n+\n I\n", lower=35)  # ' ' below lower bound
    assert bool(r.bad_quality)
    r = run(b"@a\nACG\n+\nII\n")
    assert bool(r.seq_qual_mismatch)


def test_mean_q_sum_no_overflow():
    """Phred sums exceed int32 at ~60 MB of quality data; the histogram
    route (int64 host-side) must stay exact."""
    from blazeseq_tpu.ops.raw_stats import RawStreamQC
    hist = np.zeros(64, dtype=np.int32)
    hist[40] = 2_000_000_000  # 40 * 2e9 = 8e10 >> 2^31
    qc = RawStreamQC(np.int32(0), np.int32(0), np.zeros(5, np.int32), hist,
                     False, False, False, False, np.int32(0))
    assert qc.mean_q_sum() == 40 * 2_000_000_000


def test_empty_chunk_returns_zero_stats():
    import jax.numpy as jnp
    from blazeseq_tpu.ops.raw_stats import raw_stream_qc
    r = raw_stream_qc(jnp.zeros(0, jnp.uint8), jnp.int32(33), jnp.int32(126),
                      jnp.int32(33))
    assert int(r.reads) == 0 and int(r.bases) == 0
    assert int(r.tail_start) == 0 and not bool(r.bad_structure)
