#!/usr/bin/env python
"""FASTQ counting runner: prints `records base_pairs` for cross-parser
verification (≡ reference benchmark/fastq-parser/run_blazeseq.mojo:21-60).

Usage: run_fastq.py FILE [--mode count|views|records|batch|padded]
                         [--validate] [--schema NAME] [--parallelism N]
                         [--max-len N] [--time]

--max-len 0 (default) sizes padded rows to the corpus: max read length over
a 1000-record peek, rounded up to the 128-byte TPU lane — the same rule as
benchmark/throughput/run_throughput.py and bench.py stage A, so the
wall-clock and in-process matrices measure the same workload (a fixed 256
doubled the padded-row write traffic for <=100bp corpora and made the two
tables disagree by design).

--time appends in-runner parse seconds to the output line
(`records base_pairs seconds`): on sub-second corpora the ~0.15s
interpreter startup otherwise dominates the wall clock and fabricates
regressions relative to the in-process table.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import blazeseq_tpu as bt


def _auto_max_len(path, parallelism, cfg) -> int:
    """Corpus-native padded row width: max read length over a 1000-record
    peek, rounded up to the 128-byte TPU lane (>=128)."""
    import numpy as np

    peek = bt.FastqParser(bt.open_reader(path, parallelism),
                          config=cfg).next_batch(1000)
    ml = 128
    if peek.num_records():
        lens = np.diff(np.concatenate(
            [np.zeros(1, np.int64), np.asarray(peek._ends)]))
        ml = max(128, -(-int(lens.max()) // 128) * 128)
    return ml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--mode", default="count",
                    choices=["count", "views", "records", "batch", "padded"])
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--schema", default="generic")
    ap.add_argument("--parallelism", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=0,
                    help="padded row width; 0 = corpus-native (peek)")
    ap.add_argument("--time", action="store_true",
                    help="append in-runner parse seconds to the output")
    args = ap.parse_args()

    cfg = bt.ParserConfig(check_ascii=args.validate,
                          check_quality=args.validate,
                          quality_schema=args.schema)
    max_len = args.max_len
    if args.mode == "padded" and max_len <= 0:
        max_len = _auto_max_len(args.file, args.parallelism, cfg)
    parser = bt.FastqParser(bt.open_reader(args.file, args.parallelism),
                            config=cfg)
    records = bases = 0
    t0 = time.perf_counter()
    if args.mode == "count":
        records, bases = parser.count()
    elif args.mode == "views":
        for v in parser.views():
            records += 1
            bases += len(v)
    elif args.mode == "records":
        bases = sum(map(len, parser.records()))
        records = parser.records_served()
    elif args.mode == "batch":
        for b in parser.batches(4096):
            records += len(b)
            bases += b.seq_len()
    else:  # padded
        for pb in parser.padded_batches(16384, max_len=max_len,
                                        pad_records_to=16384,
                                        reuse_buffers=True):
            records += pb.n_records
            bases += int(pb.lengths[: pb.n_records].sum())
    dt = time.perf_counter() - t0
    if args.time:
        print(records, bases, "%.6f" % dt)
    else:
        print(records, bases)


if __name__ == "__main__":
    main()
