#!/usr/bin/env python
"""The adaptive eq-mode histogram on modern (quality-binned) data.

NovaSeq-class instruments emit only ~4 distinct quality values, while the
fused device kernel's dominant pass — the Phred histogram — costs one
reduction per possible bin. QCModel peeks the corpus head's DISTINCT
phred set and compiles one equality reduction per observed value plus a
remainder bin; if any later byte falls outside the set, the remainder is
nonzero and the model re-runs once with full bins, so the report is exact
either way (93.8-126.6 GB/s measured on v5e for the 4-level corpus vs
~40 full-range; bench.py stage B3).

Usage: python examples/binned_quality.py [file.fastq]
Without a file, a demo corpus is generated and its qualities remapped to
the NovaSeq-style levels {2, 12, 23, 37}.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import blazeseq_tpu as bt
from blazeseq_tpu.models import QCModel
from blazeseq_tpu.ops.uniform_parse import detect_uniform_layout


def demo_corpus(path, n=200000, read_len=100):
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        n, read_len, read_len, 2, 40, "sanger"))
    lay = detect_uniform_layout(buf)
    arr = np.frombuffer(buf, np.uint8).reshape(-1, lay.rs).copy()
    q = arr[:, lay.o3 + 1:lay.rs - 1].astype(np.int32) - 33
    lut, edges = np.array([2, 12, 23, 37]), np.array([7, 18, 30])
    arr[:, lay.o3 + 1:lay.rs - 1] = (lut[np.searchsorted(edges, q)]
                                     + 33).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(arr.tobytes())
    return path


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else demo_corpus(
        "/tmp/blazeseq_binned_demo.fastq")
    model = QCModel(quality_schema="sanger", max_read_len=128)
    report = model.run_file_device(path)
    hist = report.qual_hist
    observed = [int(v) for v in np.flatnonzero(hist)]
    print(report)
    print("distinct phred values:", observed)
    sets = getattr(model, "_hist_his", set())
    if sets:
        print("eq-mode histogram sets used:",
              sorted(sets, key=len))
    else:
        print("eq-mode not engaged (full-range quality or quality "
              "validation off)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
