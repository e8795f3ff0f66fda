#!/usr/bin/env python
"""In-process FASTQ throughput matrix: modes x validation levels
(≡ reference benchmark/throughput/run_throughput_memory_blazeseq.mojo and
run_throughput_validation_blazeseq.mojo).

Loads the file fully into memory (MemoryReader; no disk in the timed region)
and prints one line per (mode, validation) cell:
    mode validation parse_seconds throughput_gbps records base_pairs

Usage: run_throughput.py FILE [--modes count,padded,batch,records]
                              [--validations none,ascii,ascii_quality]
                              [--reps 3] [--schema sanger]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import blazeseq_tpu as bt


def run_mode(buf, mode, check_ascii, check_quality, schema):
    cfg = bt.ParserConfig(check_ascii=check_ascii, check_quality=check_quality,
                          quality_schema=schema)
    parser = bt.FastqParser(bt.MemoryReader(buf), config=cfg)
    records = bases = 0
    t0 = time.perf_counter()
    if mode == "count":
        records, bases = parser.count()
    elif mode == "views":
        # sum(map(len, ...)) keeps the drain loop at the C level — the
        # idiomatic fast way to consume an iterator in Python, and the
        # honest analog of the reference's compiled consumer loop
        bases = sum(map(len, parser.views()))
        records = parser.records_served()
    elif mode == "views_reuse":
        # one mutated view shell per iteration (views(reuse=True)): skips
        # the per-record object create/destroy — the view-contract-legal
        # fast path for scan-and-inspect loops
        bases = sum(map(len, parser.views(reuse=True)))
        records = parser.records_served()
    elif mode == "records":
        bases = sum(map(len, parser.records()))
        records = parser.records_served()
    elif mode == "batch":
        for b in parser.batches(4096):
            records += len(b)
            bases += b.seq_len()
    elif mode == "batch_reuse":
        # zero-allocation bulk feed: batches view parser-owned staging
        # (valid until the next batch) — the device-feed configuration
        for b in parser.batches(4096, reuse_buffers=True):
            records += len(b)
            bases += b.seq_len()
    elif mode == "padded":
        # device-feed configuration: 16K rows, double-buffered reuse. Row
        # width sized to the corpus (max read length over a 1000-record
        # peek, rounded up to the 128-byte TPU lane) like bench.py stage A:
        # a fixed 256 doubles the write traffic for <=100bp corpora.
        import numpy as np

        peek = bt.FastqParser(bt.MemoryReader(buf),
                              config=cfg).next_batch(1000)
        ml = 128
        if peek.num_records():
            lens = np.diff(np.concatenate(
                [np.zeros(1, np.int64), np.asarray(peek._ends)]))
            ml = max(128, -(-int(lens.max()) // 128) * 128)
        for pb in parser.padded_batches(16384, max_len=ml,
                                        pad_records_to=16384,
                                        reuse_buffers=True):
            records += pb.n_records
            bases += int(pb.lengths[: pb.n_records].sum())
    dt = time.perf_counter() - t0
    return dt, records, bases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--modes",
                    default="count,views,views_reuse,padded,batch,batch_reuse,records")
    ap.add_argument("--validations", default="none,ascii,ascii_quality")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--schema", default="sanger")
    args = ap.parse_args()

    with open(args.file, "rb") as f:
        buf = f.read()
    size = len(buf)

    for mode in args.modes.split(","):
        for val in args.validations.split(","):
            ca = val in ("ascii", "ascii_quality")
            cq = val == "ascii_quality"
            best = None
            for _ in range(args.reps):
                dt, records, bases = run_mode(buf, mode, ca, cq, args.schema)
                best = dt if best is None else min(best, dt)
            print("%s %s %.4f %.3f %d %d"
                  % (mode, val, best, size / best / 1e9, records, bases))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
