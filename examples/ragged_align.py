#!/usr/bin/env python
"""Round-3 surfaces end-to-end: the GENERAL device parse engine and the
alignment mode/gap-model matrix.

  1. A realistic variable-id, mixed-length corpus (coordinate-bearing
     Illumina-style headers — the uniform template can never accept it)
     runs through `QCModel.run_file_device`: the ragged engine
     (ops/ragged_qc.py) parses it ON DEVICE with overlapped ingest, and
     the report must equal the host engine byte-for-byte.
  2. A short-read corpus (24 bp) exercises the adaptive slot_cap tier.
  3. The same reads score against a reference under all three alignment
     modes (global / semiglobal / local), each with linear AND affine
     (Gotoh) gaps, device == scalar twin.

Usage: python examples/ragged_align.py [num_reads]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import blazeseq_tpu as bt
from blazeseq_tpu.models import NWAligner, QCModel


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

    # 1. variable-id, mixed-length corpus on the ragged device engine
    buf = bytes(bt.generate_variable_id_fastq_buffer(
        n, 80, 120, 2, 40, "sanger", seed=1))
    path = "/tmp/ragged_align_example.fastq"
    with open(path, "wb") as f:
        f.write(buf)
    t0 = time.perf_counter()
    dev = QCModel(quality_schema="sanger", max_read_len=128) \
        .run_file_device(path)
    t_dev = time.perf_counter() - t0
    host = QCModel(quality_schema="sanger", max_read_len=128).run_file(path)
    assert dev.to_dict() == host.to_dict()
    print("ragged device parse: %d reads %d bases in %.2fs — report "
          "matches host exactly" % (dev.reads, dev.bases, t_dev))

    # 2. short reads (24 bp): the adaptive slot_cap keeps them on device
    tiny = bytes(bt.generate_variable_id_fastq_buffer(
        n, 24, 24, 2, 40, "sanger", seed=2))
    tpath = "/tmp/ragged_align_tiny.fastq"
    with open(tpath, "wb") as f:
        f.write(tiny)
    dev_t = QCModel(quality_schema="sanger", max_read_len=128) \
        .run_file_device(tpath)
    host_t = QCModel(quality_schema="sanger", max_read_len=128) \
        .run_file(tpath)
    assert dev_t.to_dict() == host_t.to_dict()
    print("short-read tier: %d reads of 24 bp — report matches host"
          % dev_t.reads)

    # 3. alignment mode x gap-model matrix
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(512)
    ref = b"GATTACAGATTACA" * 6
    for mode in ("global", "semiglobal", "local"):
        for kw, gaps in (({}, "linear"),
                         ({"gap_open": -4, "gap_extend": -1}, "affine")):
            a = NWAligner(ref, mode=mode, **kw)
            ok = a.verify_batch(batch)
            s = a.score_batch(batch)
            assert ok
            print("align %-10s %-6s gaps: device == twin, "
                  "scores [%d, %d]" % (mode, gaps, s.min(), s.max()))


if __name__ == "__main__":
    main()
