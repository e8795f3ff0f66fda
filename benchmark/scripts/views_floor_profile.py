#!/usr/bin/env python
"""One-command component decomposition of the per-record object floor
(docs/perf_views_floor.md): the SAME parse consumed five ways, so each
row's delta vs the previous isolates one cost component. No external
profiler needed (this image has no perf(1)); the subtraction method is
the instrumentation.

  count()            whole scan+validate pipeline, zero per-record objects
  views(reuse=True)  + C chain-iterator protocol, ONE mutated shell
  views()            + per-record View create/teardown (freelist pops)
  records()          + owned-copy records (single-block C objects)
  sum(map(len, v))   + one PyObject_Size call per record

Usage: python benchmark/scripts/views_floor_profile.py [SIZE_MB] [REPS]
Rows print ns/record, GB/s, and the delta vs the row above. Counts are
cross-checked across consumers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import blazeseq_tpu as bt

    cache = "/tmp/blazeseq_bench_%dmb_100bp.fastq" % size_mb
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            buf = f.read()
    else:
        n = bt.compute_num_reads_for_size(size_mb << 20, 100, 100)
        buf = bytes(bt.generate_synthetic_fastq_buffer(n, 100, 100, 2, 40,
                                                       "sanger"))
    total = len(buf)
    cfg = bt.ParserConfig(check_ascii=True, check_quality=True,
                          quality_schema="sanger")

    def fresh():
        return bt.FastqParser(bt.MemoryReader(buf), config=cfg)

    def c_count():
        return fresh().count()[0]

    def c_views_reuse():
        n = 0
        for _v in fresh().views(reuse=True):
            n += 1
        return n

    def c_views():
        n = 0
        for _v in fresh().views():
            n += 1
        return n

    def c_records():
        n = 0
        for _r in fresh().records():
            n += 1
        return n

    def c_maplen():
        return sum(1 for _ in map(len, fresh().views()))

    rows = [("count()", c_count),
            ("views(reuse=True)", c_views_reuse),
            ("views()", c_views),
            ("records()", c_records),
            ("sum(map(len, views()))", c_maplen)]

    ref_n = None
    prev_ns = None
    print("| consumer | ns/record | GB/s | d vs row above (ns) |")
    print("|---|---|---|---|")
    for name, fn in rows:
        best = None
        n = 0
        for _ in range(reps):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if ref_n is None:
            ref_n = n
        assert n == ref_n, (name, n, ref_n)
        ns = best / n * 1e9
        print("| %s | %.0f | %.2f | %s |"
              % (name, ns, total / best / 1e9,
                 "—" if prev_ns is None else "%+.0f" % (ns - prev_ns)),
              flush=True)
        prev_ns = ns
    print("# corpus %.0f MB, %d records, best-of-%d"
          % (total / 1e6, ref_n, reps), file=sys.stderr)


if __name__ == "__main__":
    main()
