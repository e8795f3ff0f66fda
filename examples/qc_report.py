#!/usr/bin/env python
"""Streaming on-device QC over a FASTQ file (FastQC-style statistics computed
by the fused TPU pass), optionally rendered as a standalone HTML report.

Usage: python examples/qc_report.py file.fastq[.gz] [out.html]"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from blazeseq_tpu.models import QCModel


def main():
    if len(sys.argv) < 2:
        print("Usage: python examples/qc_report.py /path/to/file.fastq[.gz]")
        return 1
    model = QCModel(quality_schema="generic", check_ascii=True,
                    check_quality=True)
    report = model.run_file(sys.argv[1])
    print(report)
    print("Base composition (A C G T other):", report.base_counts.tolist())
    ppq = report.per_position_mean_quality
    nz = np.flatnonzero(ppq > 0)
    if len(nz):
        shown = ppq[: nz[-1] + 1]
        print("Per-position mean quality (first 20):",
              [round(float(x), 1) for x in shown[:20]])
    if len(sys.argv) > 2:
        from blazeseq_tpu.report import write_html

        write_html(report, sys.argv[2],
                   title="QC report — %s" % sys.argv[1].rsplit("/", 1)[-1])
        print("wrote", sys.argv[2])
    return 0


if __name__ == "__main__":
    sys.exit(main())
