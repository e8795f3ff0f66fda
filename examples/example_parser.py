#!/usr/bin/env python
"""FastqParser walkthrough (≡ reference examples/example_parser.mojo):
record mode with/without validation, then batched parsing, over a file given
on the command line (plain or .gz)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import blazeseq_tpu as bt


def example_record_parser(path):
    print("=" * 60)
    print("Record parser (full validation, sanger schema)")
    print("=" * 60)
    cfg = bt.ParserConfig(check_ascii=True, check_quality=True,
                          quality_schema="generic")
    parser = bt.FastqParser(bt.open_reader(path), config=cfg)
    n = bases = 0
    for rec in parser.records():
        if n < 3:
            print("Record %d: id=%s len=%d meanQ=%.1f"
                  % (n + 1, rec.id(), len(rec),
                     float(rec.phred_scores().mean())))
        n += 1
        bases += len(rec)
    print("Summary: %d records, %d base pairs\n" % (n, bases))


def example_views_no_validation(path):
    print("=" * 60)
    print("Zero-copy views (no validation)")
    print("=" * 60)
    parser = bt.FastqParser(bt.open_reader(path))
    records, bases = parser.count()
    print("Summary: %d records, %d base pairs\n" % (records, bases))


def example_batched_parser(path):
    print("=" * 60)
    print("Batched SoA parsing (device-layout feed)")
    print("=" * 60)
    parser = bt.FastqParser(bt.open_reader(path))
    records = bases = batches = 0
    for pb in parser.padded_batches(4096, max_len=256):
        records += pb.n_records
        bases += int(pb.lengths[: pb.n_records].sum())
        batches += 1
    print("Summary: %d batches, %d records, %d base pairs\n"
          % (batches, records, bases))


def main():
    if len(sys.argv) < 2:
        print("Usage: python examples/example_parser.py /path/to/file.fastq[.gz]")
        return 1
    path = sys.argv[1]
    example_record_parser(path)
    example_views_no_validation(path)
    example_batched_parser(path)
    print("=" * 60)
    print("All examples completed!")
    print("=" * 60)
    return 0


if __name__ == "__main__":
    sys.exit(main())
