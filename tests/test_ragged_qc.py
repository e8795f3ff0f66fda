"""Parity oracle for the general (ragged-layout) device QC engine.

ops/ragged_qc.py must produce bit-identical QCStats to the host engine
(FastqParser.padded_batches + ops/stats.qc_stats) on every in-tier corpus,
flag every invalid corpus, and report `fallback` for layouts outside its
proven tier. Model-level tests hold run_file_device == run_file over
multi-chunk streaming with device-reported record-boundary tails.
"""

import gzip
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

import blazeseq_tpu as bt
from blazeseq_tpu.fastq.quality import parse_schema
from blazeseq_tpu.ops.ragged_qc import ragged_qc
from blazeseq_tpu.ops.stats import QCAccumulator, qc_stats


def gen(n_reads, min_len=80, max_len=110, seed=0, schema="sanger"):
    return bytes(bt.generate_variable_id_fastq_buffer(
        n_reads, min_len, max_len, 2, 40, schema, seed=seed))


def host_stats(buf, width, schema="sanger", check=True):
    cfg = bt.ParserConfig(check_ascii=check, check_quality=check,
                          quality_schema=schema)
    parser = bt.FastqParser(bt.MemoryReader(buf), config=cfg)
    acc = QCAccumulator()
    sch = parse_schema(schema)
    for pb in parser.padded_batches(1024, max_len=width,
                                    pad_records_to=1024):
        acc.add(qc_stats(jnp.asarray(pb.seq), jnp.asarray(pb.qual),
                         jnp.asarray(pb.lengths, dtype=jnp.int32),
                         jnp.int32(sch.OFFSET),
                         n_records=jnp.int32(pb.n_records)))
    return acc.total


def dev_qc(buf, width, schema="sanger", check=True):
    sch = parse_schema(schema)
    K = 2 * ((width + 127) // 128) * 128
    n = max((len(buf) + K - 1) // K, 1) * K
    arr = np.zeros(n, np.uint8)
    arr[: len(buf)] = np.frombuffer(buf, np.uint8)
    return ragged_qc(jnp.asarray(arr), jnp.int32(len(buf)), width=width,
                     q_lo=int(sch.LOWER), q_hi=int(sch.UPPER),
                     offset=int(sch.OFFSET), check_ascii=check,
                     check_quality=check)


def assert_stats_equal(h, d):
    for name in h._fields:
        va, vb = getattr(h, name), getattr(d, name)
        if va is None or vb is None:
            assert va is None and vb is None, name
            continue
        a = np.asarray(va, dtype=np.int64)
        b = np.asarray(vb, dtype=np.int64)
        assert np.array_equal(a, b), (name, a, b)


@pytest.mark.parametrize("width", [128, 256])
def test_parity_variable_ids_mixed_lengths(width):
    buf = gen(1200, 80, 120)
    r = dev_qc(buf, width)
    assert bool(r.ok) and not bool(r.fallback)
    assert int(r.tail_start) == len(buf)
    assert_stats_equal(host_stats(buf, width), r.stats)


def test_parity_uniform_corpus_also_in_tier():
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        800, 100, 100, 2, 40, "sanger"))
    r = dev_qc(buf, 128)
    assert bool(r.ok) and not bool(r.fallback)
    assert_stats_equal(host_stats(buf, 128), r.stats)


def test_parity_other_schema_and_lowercase():
    buf = bytearray(gen(400, 90, 100, seed=3, schema="illumina_1.3"))
    # lowercase some sequence bytes: find a seq line and twiddle case
    buf[buf.index(b"\n") + 1] |= 0x20
    buf = bytes(buf)
    r = dev_qc(buf, 128, schema="illumina_1.3")
    assert bool(r.ok) and not bool(r.fallback)
    assert_stats_equal(host_stats(buf, 128, schema="illumina_1.3"), r.stats)


def test_parity_checks_off():
    buf = gen(300, 64, 90, seed=5)
    r = dev_qc(buf, 128, check=False)
    assert bool(r.ok) and not bool(r.fallback)
    assert_stats_equal(host_stats(buf, 128, check=False), r.stats)


def test_tail_partial_record_excluded():
    buf = gen(100, 80, 100, seed=7)
    cut = buf[: len(buf) - 37]  # chop inside the final record
    r = dev_qc(cut, 128)
    assert bool(r.ok) and not bool(r.fallback)
    tail = int(r.tail_start)
    assert 0 < tail < len(cut)
    assert_stats_equal(host_stats(buf[:tail], 128), r.stats)


def test_invalid_quality_and_ascii_flagged():
    buf = bytearray(gen(50, 80, 100))
    buf[-2] = 200  # corrupt the last quality byte (non-ascii + out of range)
    assert not bool(dev_qc(bytes(buf), 128).ok)
    buf[-2] = 10  # schema-invalid but ascii: premature newline
    assert not bool(dev_qc(bytes(buf), 128).ok)


def test_invalid_markers_flagged():
    buf = bytearray(gen(50, 80, 100, seed=9))
    buf[0] = ord("X")  # header must start with '@'
    assert not bool(dev_qc(bytes(buf), 128).ok)

    buf = bytearray(gen(50, 80, 100, seed=9))
    plus = buf.index(b"\n+\n") + 1
    buf[plus] = ord("-")  # separator must start with '+'
    assert not bool(dev_qc(bytes(buf), 128).ok)


def test_per_record_len_mismatch_flagged_even_when_totals_match():
    # two records: seq lens (90, 92) but qual lens (92, 90) — global
    # seq/qual totals agree, so only a PER-RECORD check catches it
    sch = parse_schema("sanger")
    q = chr(sch.OFFSET + 30).encode()
    rec = b"@r1 x:1\n" + b"A" * 90 + b"\n+\n" + q * 92 + b"\n" \
        + b"@r2 xx:22\n" + b"C" * 92 + b"\n+\n" + q * 90 + b"\n"
    r = dev_qc(rec, 128)
    assert not bool(r.ok)


def test_fallback_small_records():
    tiny = gen(200, 10, 20, seed=11)  # records far below width bytes
    assert bool(dev_qc(tiny, 128).fallback)


@pytest.mark.parametrize("width", [128, 384])
def test_long_reads_on_device(width):
    """Reads longer than `width` stay in tier with the host engine's exact
    truncation semantics (bases/length_hist true; panels windowed)."""
    longr = gen(50, 200, 300, seed=12)
    r = dev_qc(longr, width)
    assert not bool(r.fallback) and bool(r.ok)
    assert_stats_equal(host_stats(longr, width), r.stats)


def test_very_long_reads_multi_tile_lines():
    """Lines spanning several compaction tiles (tiles with zero newlines)."""
    longr = gen(12, 900, 1600, seed=13)
    r = dev_qc(longr, 128)
    assert not bool(r.fallback) and bool(r.ok)
    assert_stats_equal(host_stats(longr, 128), r.stats)


def test_long_reads_mixed_with_width_sized(width=256):
    """Mix of ~width reads and far-longer reads: min_gap >= width holds as
    long as every record spans >= width bytes."""
    a = gen(40, 230, 260, seed=14)
    b = gen(10, 700, 900, seed=15)
    buf = a + b
    r = dev_qc(buf, width)
    assert not bool(r.fallback) and bool(r.ok)
    assert_stats_equal(host_stats(buf, width), r.stats)


def test_empty_chunk():
    r = dev_qc(b"", 128)
    assert int(r.stats.reads) == 0 and int(r.tail_start) == 0


def _reports_equal(a, b):
    da, db = a.to_dict(), b.to_dict()
    assert set(da) == set(db)
    for k in da:
        va, vb = da[k], db[k]
        if isinstance(va, float):
            assert va == pytest.approx(vb, rel=1e-12), k
        elif isinstance(va, list):
            assert np.allclose(np.asarray(va), np.asarray(vb)), k
        else:
            assert va == vb, k


def test_model_run_file_device_matches_host_multichunk(tmp_path):
    # ~2.6 MB over 1 MB chunks: several device chunks, tails carried at
    # device-reported record boundaries
    buf = gen(9000, 80, 120, seed=21)
    p = tmp_path / "var.fastq"
    p.write_bytes(buf)
    mk = lambda: bt.models.QCModel(quality_schema="sanger",
                                   max_read_len=128)
    _reports_equal(mk().run_file_device(str(p), chunk_mb=1),
                   mk().run_file(str(p)))


def test_model_run_file_device_invalid_midfile_counts_errors(tmp_path):
    buf = bytearray(gen(3000, 80, 120, seed=23))
    buf[len(buf) // 2 - (len(buf) // 2 % 1)] = 200  # corrupt one byte
    p = tmp_path / "bad.fastq"
    p.write_bytes(bytes(buf))
    mk = lambda: bt.models.QCModel(quality_schema="sanger",
                                   max_read_len=128)
    _reports_equal(mk().run_file_device(str(p), chunk_mb=1),
                   mk().run_file(str(p)))


def test_model_run_file_device_gzip_ragged(tmp_path):
    buf = gen(4000, 80, 120, seed=25)
    p = tmp_path / "var.fastq.gz"
    p.write_bytes(gzip.compress(buf, 1))
    mk = lambda: bt.models.QCModel(quality_schema="sanger",
                                   max_read_len=128)
    _reports_equal(mk().run_file_device(str(p), chunk_mb=1),
                   mk().run_file(str(p)))


def test_model_long_reads_stay_on_device(tmp_path):
    """Reads longer than max_read_len run the full device pipeline with
    ZERO host-fallback chunks (round-4: device truncation semantics +
    uniform-fail -> ragged chaining), and the report matches run_file."""
    buf = gen(500, 200, 300, seed=27)
    p = tmp_path / "long.fastq"
    p.write_bytes(buf)
    pgz = tmp_path / "long.fastq.gz"
    pgz.write_bytes(gzip.compress(buf, 1))
    mk = lambda: bt.models.QCModel(quality_schema="sanger",
                                   max_read_len=128)
    from blazeseq_tpu.models.qc import QCModel

    hc = []
    orig = QCModel._host_consume
    try:
        QCModel._host_consume = lambda self, parser, acc: hc.append(1) \
            or orig(self, parser, acc)
        dev = mk().run_file_device(str(p), chunk_mb=1)
        dev_gz = mk().run_file_device(str(pgz), chunk_mb=1)
        assert hc == [], "long reads must not drop to the host engine"
    finally:
        QCModel._host_consume = orig
    _reports_equal(dev, mk().run_file(str(p)))
    _reports_equal(dev_gz, mk().run_file(str(pgz)))


# --------------------------------- adaptive slot capacity (short records)

def test_short_records_in_tier_with_raised_slot_cap():
    """Records far below `width` bytes overflow the default 12 slots/tile;
    a raised static slot_cap brings them into the device tier with exact
    parity (round-3 tier extension)."""
    from blazeseq_tpu.fastq.quality import parse_schema
    from blazeseq_tpu.ops.ragged_qc import ragged_qc as rqc

    tiny = gen(400, 10, 20, seed=11)
    sch = parse_schema("sanger")
    K = 256
    n = max((len(tiny) + K - 1) // K, 1) * K
    arr = np.zeros(n, np.uint8)
    arr[: len(tiny)] = np.frombuffer(tiny, np.uint8)
    r = rqc(jnp.asarray(arr), jnp.int32(len(tiny)), width=128,
            q_lo=int(sch.LOWER), q_hi=int(sch.UPPER),
            offset=int(sch.OFFSET), slot_cap=40)
    assert not bool(r.fallback) and bool(r.ok)
    assert int(r.tail_start) == len(tiny)
    assert_stats_equal(host_stats(tiny, 128), r.stats)


def test_model_peeks_slot_cap_and_keeps_short_records_on_device(tmp_path):
    from blazeseq_tpu.models.qc import QCModel

    buf = gen(2000, 10, 20, seed=27)
    cap = QCModel._peek_ragged_slot_cap(
        np.frombuffer(buf, np.uint8), 128)
    assert cap > 12
    # the adaptive cap must make the device engine accept the corpus
    from blazeseq_tpu.fastq.quality import parse_schema
    from blazeseq_tpu.ops.ragged_qc import ragged_qc as rqc

    sch = parse_schema("sanger")
    K = 256
    n = max((len(buf) + K - 1) // K, 1) * K
    arr = np.zeros(n, np.uint8)
    arr[: len(buf)] = np.frombuffer(buf, np.uint8)
    r = rqc(jnp.asarray(arr), jnp.int32(len(buf)), width=128,
            q_lo=int(sch.LOWER), q_hi=int(sch.UPPER),
            offset=int(sch.OFFSET), slot_cap=cap)
    assert not bool(r.fallback) and bool(r.ok)
    # and end-to-end parity still holds through the model
    p = tmp_path / "tiny2.fastq"
    p.write_bytes(buf)
    mk = lambda: bt.models.QCModel(quality_schema="sanger",
                                   max_read_len=128)
    _reports_equal(mk().run_file_device(str(p), chunk_mb=1),
                   mk().run_file(str(p)))


def test_sharded_ragged_qc_matches_host(tmp_path):
    """build_ragged_qc_step over a dp mesh: record-boundary file shards,
    per-shard device parse + masked psum, host re-parse of a rejected
    shard — exact equality with the host engine. Clean subprocess (the
    axon harness binds the real single TPU at interpreter start)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    code = """
import numpy as np, jax, jax.numpy as jnp
import blazeseq_tpu as bt
from blazeseq_tpu.fastq.quality import parse_schema
from blazeseq_tpu.ops.stats import QCAccumulator, qc_stats
from blazeseq_tpu.parallel.mesh import make_mesh
from blazeseq_tpu.parallel.pipeline import build_ragged_qc_step
from blazeseq_tpu.parallel.sharding import find_record_boundary
import tempfile, os

n_dev = 4
mesh = make_mesh(n_dev)
schema = parse_schema("sanger")
buf = bytes(bt.generate_variable_id_fastq_buffer(
    2000, 80, 120, 2, 40, "sanger", seed=5))
bad = bytearray(buf)
bad[len(buf) // 2 - 100] = 200  # one invalid byte -> owning shard rejects
buf = bytes(bad)
path = os.path.join(tempfile.mkdtemp(), "v.fastq")
open(path, "wb").write(buf)

K = 256
target = len(buf) // n_dev
bounds = [0]
for d in range(1, n_dev):
    bounds.append(find_record_boundary(path, d * target))
bounds.append(len(buf))
S = max(-(-(b - a) // K) * K for a, b in zip(bounds, bounds[1:]))
arr = np.zeros(n_dev * S, np.uint8)
nv = np.zeros(n_dev, np.int32)
data = np.frombuffer(buf, np.uint8)
for d, (a, b) in enumerate(zip(bounds, bounds[1:])):
    arr[d * S : d * S + (b - a)] = data[a:b]
    nv[d] = b - a

step = build_ragged_qc_step(mesh, schema, width=128)
good, fb, tail, st = step(jnp.asarray(arr), jnp.asarray(nv))
good = np.asarray(good); tail = np.asarray(tail)
assert good.sum() == n_dev - 1, good       # exactly the corrupted shard fails
assert not np.asarray(fb).any()            # in tier everywhere
for d in range(n_dev):                     # shards end at record boundaries
    if good[d]:
        assert tail[d] == nv[d]

# host engine over good shards must equal the masked psum; the bad shard
# merges via the exact host path like the single-chip fallback
def host_stats(b):
    cfg = bt.ParserConfig(check_ascii=True, check_quality=True,
                          quality_schema="sanger")
    p = bt.FastqParser(bt.MemoryReader(b), config=cfg)
    acc = QCAccumulator()
    for pb in p.padded_batches(1024, max_len=128, pad_records_to=1024):
        acc.add(qc_stats(jnp.asarray(pb.seq), jnp.asarray(pb.qual),
                         jnp.asarray(pb.lengths, jnp.int32),
                         jnp.int32(schema.OFFSET),
                         n_records=jnp.int32(pb.n_records)))
    return acc.total

expect = None
for d, (a, b) in enumerate(zip(bounds, bounds[1:])):
    if good[d]:
        h = host_stats(buf[a:b])
        expect = h if expect is None else jax.tree.map(
            lambda x, y: np.asarray(x) + np.asarray(y), expect, h)
for name, x, y in zip(st._fields, st, expect):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                  err_msg=name)
print("SHARDED-RAGGED-OK")
"""
    r = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
    assert "SHARDED-RAGGED-OK" in r.stdout


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_ragged_tier_shapes(seed):
    """Differential fuzz: random (min_len, max_len, slot_cap) draws; every
    in-tier result must equal the host engine exactly, and every out-of-
    tier corpus must say `fallback` (never silently wrong). slot_cap draws
    from two values per seed to bound XLA compile count."""
    import random

    rng = random.Random(seed * 7919 + 3)
    from blazeseq_tpu.fastq.quality import parse_schema
    from blazeseq_tpu.ops.ragged_qc import ragged_qc as rqc

    sch = parse_schema("sanger")
    caps = ([12, 40], [16, 64])[seed % 2]
    for _ in range(5):
        lo = rng.randint(5, 120)
        hi = rng.randint(lo, min(lo + rng.randint(0, 60), 127))
        n = rng.randint(1, 300)
        slot_cap = rng.choice(caps)
        buf = gen(n, lo, hi, seed=rng.randint(0, 1 << 30))
        K = 256
        nn = max((len(buf) + K - 1) // K, 1) * K
        arr = np.zeros(nn, np.uint8)
        arr[: len(buf)] = np.frombuffer(buf, np.uint8)
        r = rqc(jnp.asarray(arr), jnp.int32(len(buf)), width=128,
                q_lo=int(sch.LOWER), q_hi=int(sch.UPPER),
                offset=int(sch.OFFSET), slot_cap=slot_cap)
        if bool(r.fallback):
            continue  # out of tier at this cap: allowed, host handles it
        assert bool(r.ok)
        tail = int(r.tail_start)
        assert tail == len(buf)
        assert_stats_equal(host_stats(buf, 128), r.stats)


def test_model_gzip_short_records_stay_on_device(tmp_path):
    """The gz streaming path must apply the adaptive slot_cap too: a
    short-record gz corpus parses on device (verified via the direct op)
    with end-to-end model parity."""
    buf = gen(3000, 10, 20, seed=31)
    p = tmp_path / "tiny.fastq.gz"
    p.write_bytes(gzip.compress(buf, 1))
    mk = lambda: bt.models.QCModel(quality_schema="sanger",
                                   max_read_len=128)
    _reports_equal(mk().run_file_device(str(p), chunk_mb=1),
                   mk().run_file(str(p)))


def test_model_truncated_ragged_file_raises_like_host(tmp_path):
    """Overlapped ragged mmap path: a file chopped mid-record must behave
    exactly like the host engine (device stats for the complete prefix,
    then the host tail raises on the truncated record)."""
    buf = gen(3000, 80, 120, seed=33)
    cut = buf[: len(buf) - 51]
    p = tmp_path / "trunc.fastq"
    p.write_bytes(cut)
    mk = lambda: bt.models.QCModel(quality_schema="sanger",
                                   max_read_len=128)
    host_exc = dev_exc = None
    try:
        mk().run_file(str(p))
    except Exception as e:
        host_exc = e
    try:
        mk().run_file_device(str(p), chunk_mb=1)
    except Exception as e:
        dev_exc = e
    assert (host_exc is None) == (dev_exc is None)
    if host_exc is not None:
        assert type(dev_exc) is type(host_exc)


@pytest.mark.parametrize("members", [("slots",), ("rhist",),
                                     ("slots", "vals", "hist")])
def test_ablation_members_run_and_zero_their_engine(members):
    # _ablate is diagnostic-only: each member must compile, run, and zero
    # exactly the panels its engine owns (benchmark/scripts/ab_ragged_qc
    # attributes step time by subtraction, so the members must stay wired)
    buf = gen(300, seed=5)
    sch = parse_schema("sanger")
    width = 128
    K = 2 * ((width + 127) // 128) * 128
    n = max((len(buf) + K - 1) // K, 1) * K
    arr = np.zeros(n, np.uint8)
    arr[: len(buf)] = np.frombuffer(buf, np.uint8)
    r = ragged_qc(jnp.asarray(arr), jnp.int32(len(buf)), width=width,
                  q_lo=int(sch.LOWER), q_hi=int(sch.UPPER),
                  offset=int(sch.OFFSET), _ablate=frozenset(members))
    full = dev_qc(buf, width)
    assert not bool(r.fallback)
    assert int(r.tail_start) == int(full.tail_start)
    s = r.stats
    assert int(np.asarray(s.length_hist).sum()) == 0
    assert int(np.asarray(s.gc_hist).sum()) == 0
    assert int(np.asarray(s.mean_qual_hist).sum()) == 0
    if "slots" in members:
        assert int(s.reads) == 0 and int(s.bases) == 0
    else:
        assert int(s.reads) == int(full.stats.reads)
        assert int(s.bases) == int(full.stats.bases)
    # engines outside the members stay intact
    if "hist" not in members:
        got = np.asarray(s.qual_hist)
        want = np.asarray(full.stats.qual_hist)
        if "slots" in members:  # qual_bytes (bin-0 anchor) is slot-derived
            assert np.array_equal(got[1:], want[1:])
        else:
            assert np.array_equal(got, want)
    assert np.array_equal(np.asarray(s.per_pos_count),
                          np.asarray(full.stats.per_pos_count))
