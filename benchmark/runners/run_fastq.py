#!/usr/bin/env python
"""FASTQ counting runner: prints `records base_pairs` for cross-parser
verification (≡ reference benchmark/fastq-parser/run_blazeseq.mojo:21-60).

Usage: run_fastq.py FILE [--mode count|views|records|batch|padded]
                         [--validate] [--schema NAME] [--parallelism N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import blazeseq_tpu as bt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--mode", default="count",
                    choices=["count", "views", "records", "batch", "padded"])
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--schema", default="generic")
    ap.add_argument("--parallelism", type=int, default=4)
    args = ap.parse_args()

    cfg = bt.ParserConfig(check_ascii=args.validate,
                          check_quality=args.validate,
                          quality_schema=args.schema)
    parser = bt.FastqParser(bt.open_reader(args.file, args.parallelism),
                            config=cfg)
    records = bases = 0
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
        for pb in parser.padded_batches(4096, max_len=256):
            records += pb.n_records
            bases += int(pb.lengths[: pb.n_records].sum())
    print(records, bases)


if __name__ == "__main__":
    main()
