#!/usr/bin/env python
"""Multi-host QC runner: each process parses its record-boundary file shard
and prints the merged global `records base_pairs` plus its local feed rate.

Launch one process per host (or per simulated host) with:
  JAX_COORDINATOR_ADDRESS=<host0>:<port> JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
      python benchmark/run_multihost.py FILE

On a real TPU slice jax.distributed.initialize picks up the topology
automatically when the env vars are absent. All processes print identical
global counts — the multi-host determinism check (SURVEY §7.3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from blazeseq_tpu.parallel.multihost import init_distributed, run_multihost_qc


def main():
    path = sys.argv[1]
    init_distributed()
    import jax

    pid = jax.process_index()
    t0 = time.perf_counter()
    stats, local_reads, local_bases = run_multihost_qc(path)
    dt = time.perf_counter() - t0
    shard_bytes = os.path.getsize(path) / jax.process_count()
    print("[proc %d/%d] local: %d records %d base_pairs in %.3fs"
          " (~%.2f GB/s shard feed)"
          % (pid, jax.process_count(), local_reads, local_bases, dt,
             shard_bytes / dt / 1e9))
    print("[proc %d] GLOBAL: %d %d" % (pid, int(stats.reads),
                                       int(stats.bases)))


if __name__ == "__main__":
    main()
