#!/bin/bash
# Sanitizer sweep of the native layer: rebuild scan.cpp / pinflate.cpp /
# records_ext.c with ASan+UBSan and run the host-native test set against
# them (the jit-compiling test files are excluded: prebuilt jaxlib throws
# C++ exceptions that ASan's interceptor cannot see past LD_PRELOAD —
# a harness artifact, not a code path we own).
#
# Usage: bash benchmark/scripts/run_asan.sh
set -e
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
OUT=/tmp/bs_asan
mkdir -p "$OUT"
INC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
SFX=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
FLAGS="-O1 -g -march=native -shared -fPIC -fsanitize=address,undefined -fno-sanitize-recover=undefined"
g++ $FLAGS "$REPO/blazeseq_tpu/native/scan.cpp" -o "$OUT/libblazeseq_scan.so"
g++ $FLAGS "$REPO/blazeseq_tpu/native/pinflate.cpp" -o "$OUT/libblazeseq_pinflate.so"
gcc $FLAGS -I"$INC" "$REPO/blazeseq_tpu/native/records_ext.c" -o "$OUT/_records$SFX"

cat > /tmp/asan_patch.py <<'EOF'
def pytest_configure(config):
    import blazeseq_tpu.native as nat

    def patched(src, lib_name, extra_flags=()):
        yield "/tmp/bs_asan/" + lib_name

    nat._shared_candidates = patched
EOF

LIBASAN=$(gcc -print-file-name=libasan.so)
cd "$REPO"
LD_PRELOAD="$LIBASAN" \
ASAN_OPTIONS=detect_leaks=0 \
UBSAN_OPTIONS=print_stacktrace=1 \
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/tmp \
python -m pytest -p asan_patch -q \
    tests/test_fastq_corpus.py tests/test_io_layer.py \
    tests/test_io_integration.py tests/test_pugz.py tests/test_fasta.py \
    tests/test_fai.py tests/test_bed_gff_gtf.py tests/test_error_context.py \
    tests/test_differential_fuzz.py tests/test_paired.py \
    tests/test_fastq_parser.py tests/test_scan_fuzz.py \
    tests/test_mixed_mode_stress.py tests/test_line_iterator_api.py \
    --deselect tests/test_pugz.py::test_per_core_decode_not_slower_than_zlib
# (the deselected test is a perf assertion; sanitized builds are slower by design)

# serializer churn (not in the test list above: its test file imports jax
# jit paths that the preloaded ASan runtime cannot unwind through)
LD_PRELOAD="$LIBASAN" ASAN_OPTIONS=detect_leaks=0 \
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/tmp \
python - <<'PYEOF'
import sys
sys.path.insert(0, '/root/repo')
import blazeseq_tpu.native as nat
def patched(src, lib_name, extra_flags=()):
    yield "/tmp/bs_asan/" + lib_name
nat._shared_candidates = patched
import numpy as np, random
import blazeseq_tpu as bt
from blazeseq_tpu.fastq.batch import serialize_fastq_rows, serialize_fastq_soa
rng = random.Random(0)
for trial in range(6):
    n = rng.randint(1, 3000)
    lo = rng.randint(0, 50)
    hi = max(lo, rng.randint(lo, 200))
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        n, max(lo, 1), max(hi, 1), 2, 40, "sanger"))
    b = bt.FastqParser(bt.MemoryReader(buf)).next_batch(n)
    b._finalize()
    assert serialize_fastq_soa(b._id_bytes, b._id_ends, b._sequence_bytes,
                               b._quality_bytes, b._ends) == buf
    lens = np.diff(b._ends, prepend=0)
    ss = np.array([rng.randint(0, max(int(l) // 2, 1)) for l in lens],
                  np.int64)
    sl = np.array([rng.randint(0, max(int(l) - int(s), 1))
                   for l, s in zip(lens, ss)], np.int64)
    serialize_fastq_soa(b._id_bytes, b._id_ends, b._sequence_bytes,
                        b._quality_bytes, b._ends, sub_start=ss, sub_len=sl)
    pb = b.to_padded()
    assert serialize_fastq_rows(b._id_bytes, b._id_ends,
                                pb.seq[: pb.n_records],
                                pb.qual[: pb.n_records], lens) == buf
print("serializer ASan churn OK")
PYEOF

# semi-uniform id-normalizer churn (round 5): adversarial + generated
# shapes through bs_normalize_semi_uniform under ASan+UBSan, native vs
# numpy-twin equality asserted on the well-formed cases
LD_PRELOAD="$LIBASAN" ASAN_OPTIONS=detect_leaks=0 \
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/tmp \
python - <<'PYEOF'
import sys
sys.path.insert(0, '/root/repo')
import blazeseq_tpu.native as nat
def patched(src, lib_name, extra_flags=()):
    yield "/tmp/bs_asan/" + lib_name
nat._shared_candidates = patched
import numpy as np
import blazeseq_tpu as bt
rng = np.random.default_rng(0)
cases = 0
for seed in range(12):
    n_r = int(rng.integers(1, 200))
    lo = int(rng.integers(1, 150)); hi = int(rng.integers(lo, 151))
    raw = np.frombuffer(bytes(bt.generate_variable_id_fastq_buffer(
        n_r, lo, hi, 2, 40, 'sanger', seed=seed)), np.uint8)
    for cut in (len(raw), int(rng.integers(0, len(raw) + 1))):
        buf = raw[:cut].copy()
        for idw in (0, 1, 64, 200):
            for L in (0, 1, lo, hi, 151):
                rs = idw + 2 * L + 6
                out_a = np.zeros(max((n_r + 2) * rs, 1), np.uint8)
                out_b = out_a.copy()
                na, ca = nat.normalize_semi_uniform(buf, 0, out_a, idw, L)
                nb, cb = nat._normalize_semi_uniform_np(buf, 0, out_b,
                                                        idw, L)
                assert (na, ca) == (nb, cb), (seed, idw, L, na, ca, nb, cb)
                assert np.array_equal(out_a[: na * rs], out_b[: na * rs])
                cases += 1
for seed in range(10):
    buf = rng.integers(0, 256, size=int(rng.integers(1, 5000)),
                       dtype=np.uint8).astype(np.uint8)
    buf[rng.random(len(buf)) < 0.2] = 10
    buf[rng.random(len(buf)) < 0.1] = ord('@')
    out = np.zeros(8192, np.uint8)
    for idw in (0, 3, 64):
        for L in (0, 2, 100):
            nat.normalize_semi_uniform(buf, 0, out, idw, L)
            cases += 1
print("normalizer ASan churn OK,", cases, "cases")
PYEOF
