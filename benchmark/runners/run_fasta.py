#!/usr/bin/env python
"""FASTA counting runner: prints `records base_pairs`
(≡ reference benchmark/fasta-parser/run_blazeseq_fasta.mojo)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import blazeseq_tpu as bt
from blazeseq_tpu.fasta import FastaParser


def main():
    path = sys.argv[1]
    parser = FastaParser(bt.open_reader(path))
    records, bases = parser.count()
    print(records, bases)


if __name__ == "__main__":
    main()
