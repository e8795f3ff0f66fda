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
