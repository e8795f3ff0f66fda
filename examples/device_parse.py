#!/usr/bin/env python
"""Pipeline B end-to-end: the TPU parses raw FASTQ bytes itself.

Generates a synthetic corpus (or takes a path), then:
  1. `QCModel.run_file_device` — raw bytes -> HBM -> uniform-template
     proof -> parse + validate + QC on device (13-17 GB/s/chip), with
     byte-exact host fallback for anything the proof rejects.
  2. The same file through the host pipeline (`run_file`) — reports must
     match exactly.
  3. The sharded variant (`build_uniform_qc_step` over a dp mesh) when
     more than one device is attached.

Usage: python examples/device_parse.py [FILE.fastq[.gz]] [reads] [len]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import blazeseq_tpu as bt
from blazeseq_tpu.models import QCModel


def main():
    args = sys.argv[1:]
    if args and os.path.exists(args[0]):
        path = args[0]
    else:
        n = int(args[0]) if args else 200_000
        L = int(args[1]) if len(args) > 1 else 100
        buf = bytes(bt.generate_synthetic_fastq_buffer(n, L, L, 2, 40,
                                                       "sanger"))
        path = "/tmp/device_parse_example.fastq"
        with open(path, "wb") as f:
            f.write(buf)
        print("generated %s (%d reads, %.1f MB)"
              % (path, n, len(buf) / 1e6))

    size = os.path.getsize(path)
    m = QCModel(quality_schema="sanger", check_ascii=True,
                check_quality=True, max_read_len=256)

    t0 = time.perf_counter()
    dev = m.run_file_device(path)
    dt_dev = time.perf_counter() - t0
    print("device : %s  (%.2f GB/s wall)" % (dev, size / dt_dev / 1e9))

    t0 = time.perf_counter()
    host = m.run_file(path)
    dt_host = time.perf_counter() - t0
    print("host   : %s  (%.2f GB/s wall)" % (host, size / dt_host / 1e9))

    assert dev.to_dict() == host.to_dict(), "device/host reports diverge!"
    print("reports identical; device parse path verified")

    import jax

    if len(jax.devices()) > 1:
        import jax.numpy as jnp
        import numpy as np

        from blazeseq_tpu.fastq.quality import parse_schema
        from blazeseq_tpu.ops.uniform_parse import detect_uniform_layout
        from blazeseq_tpu.parallel.mesh import make_mesh
        from blazeseq_tpu.parallel.pipeline import build_uniform_qc_step

        data = open(path, "rb").read()
        lay = detect_uniform_layout(data)
        if lay is not None:
            ndev = len(jax.devices())
            unit = lay.rs * ndev
            padded = -(-len(data) // unit) * unit
            arr = np.zeros(padded, np.uint8)
            arr[: len(data)] = np.frombuffer(data, np.uint8)
            step = build_uniform_qc_step(make_mesh(ndev), lay,
                                         parse_schema("generic"), width=256)
            n_r, b_r, ok, st = step(jnp.asarray(arr), jnp.int32(len(data)))
            print("mesh   : %d devices parsed %d reads / %d bases (ok=%s)"
                  % (ndev, int(n_r), int(b_r), bool(ok)))


if __name__ == "__main__":
    main()
