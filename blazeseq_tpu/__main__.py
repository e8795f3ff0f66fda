"""Command-line interface: `python -m blazeseq_tpu <command> ...`

Commands mirror the reference's example mains (examples/example_parser.mojo
takes argv paths) plus the ecosystem basics:

  count FILE [...]      records and base_pairs per FASTQ file (the benchmark
                        runner contract, run_blazeseq.mojo:3-5)
  stats [--adapter SEQ ...] [--duplicates] [--json] [--device] FILE [...]
                        device QC report (reads, bases, GC, mean quality,
                        distribution panels) — uses the TPU when attached;
                        --adapter adds FastQC adapter-content scans,
                        --duplicates profiles duplication levels and
                        overrepresented sequences; --device parses on the
                        TPU (pipeline B: uniform-template proof with exact
                        host fallback; core QC only)
  fasta-count FILE      records/bases for FASTA
  faidx FILE            build FILE.fai (samtools-compatible)
  fetch FILE NAME [START END]   random-access FASTA subsequence via .fai
  demux --barcode NAME=SEQ [...] [--mismatches K] [--out DIR] FILE
                        split reads by 5' barcode (device Hamming
                        assignment; 'N' in a barcode matches any base)
"""

from __future__ import annotations

import sys


def _count(args):
    import blazeseq_tpu as bt

    for path in args:
        p = bt.FastqParser(bt.open_reader(path))
        records, bases = p.count()
        print("%s\t%d\t%d" % (path, records, bases))


def _stats(args):
    try:
        from blazeseq_tpu.models import QCModel
    except ModuleNotFoundError as e:
        if "jax" in str(e):
            print("stats needs the device layer: pip install"
                  " 'blazeseq-tpu[tpu]'", file=sys.stderr)
            raise SystemExit(1)
        raise

    adapters = []
    duplicates = False
    as_json = False
    device_ingest = False
    paths = []
    it = iter(args)
    for a in it:
        if a == "--adapter":
            try:
                adapters.append(next(it).encode("ascii"))
            except StopIteration:
                print("usage: stats --adapter SEQUENCE [...] FILE",
                      file=sys.stderr)
                raise SystemExit(2)
        elif a == "--duplicates":
            duplicates = True
        elif a == "--json":
            as_json = True
        elif a == "--device":
            device_ingest = True
        else:
            paths.append(a)
    for path in paths:
        qc = QCModel(quality_schema="sanger", check_ascii=True,
                     check_quality=True, adapters=adapters or None,
                     track_duplicates=duplicates)
        report = (qc.run_file_device(path) if device_ingest
                  else qc.run_file(path))
        if as_json:
            import json

            print(json.dumps(dict(file=path, **report.to_dict())))
            continue
        print("%s: %s" % (path, report))
        for ad, st in (report.adapter_stats or {}).items():
            frac = st.cumulative_fraction()[-1]
            print("  adapter %s: %.3f%% of reads"
                  % (ad.decode("ascii"), 100.0 * frac))
        if duplicates:
            print("  unique reads: %.2f%%  dup levels 1..10+: %s"
                  % (100.0 * report.frac_unique_reads,
                     report.duplication_levels[1:].tolist()))
            for s, c in report.overrepresented[:5]:
                print("  overrepresented (%d): %s"
                      % (c, s.decode("ascii", "replace")))


def _fasta_count(args):
    import blazeseq_tpu as bt

    for path in args:
        p = bt.FastaParser(bt.open_reader(path))
        records, bases = p.count()
        print("%s\t%d\t%d" % (path, records, bases))


def _faidx(args):
    import blazeseq_tpu as bt
    from blazeseq_tpu.io.writers import BufferedWriter, FileWriter

    for path in args:
        recs = bt.build_fai(bt.FileReader(path))
        w = BufferedWriter(FileWriter(path + ".fai"))
        bt.write_fai(recs, w)
        w.close()
        print("wrote %s.fai (%d sequences)" % (path, len(recs)))


def _fetch(args):
    import blazeseq_tpu as bt

    path, name = args[0], args[1]
    start = int(args[2]) if len(args) > 2 else 0
    end = int(args[3]) if len(args) > 3 else None
    with bt.IndexedFasta(path) as ix:
        sys.stdout.write(ix.fetch(name, start, end).decode("ascii"))
        sys.stdout.write("\n")


def _demux(args):
    """demux --barcode NAME=SEQ [...] [--mismatches K] [--out DIR] FILE"""
    import os

    import blazeseq_tpu as bt
    from blazeseq_tpu.io.writers import BufferedWriter, FileWriter
    from blazeseq_tpu.ops.demux import demultiplex_to_writers

    names = []
    codes = []
    max_mm = 1
    out_dir = "."
    paths = []
    it = iter(args)
    for a in it:
        try:
            if a == "--barcode":
                spec = next(it)
                name, _, seq = spec.partition("=")
                if not seq:
                    name, seq = "sample%d" % (len(names) + 1), name
                names.append(name)
                codes.append(seq.encode("ascii"))
            elif a == "--mismatches":
                max_mm = int(next(it))
            elif a == "--out":
                out_dir = next(it)
            else:
                paths.append(a)
        except StopIteration:
            print("usage: demux --barcode NAME=SEQ [...] [--mismatches K]"
                  " [--out DIR] FILE", file=sys.stderr)
            raise SystemExit(2)
    if not codes or not paths:
        print("usage: demux --barcode NAME=SEQ [...] [--mismatches K]"
              " [--out DIR] FILE", file=sys.stderr)
        raise SystemExit(2)
    os.makedirs(out_dir, exist_ok=True)
    for path in paths:
        writers = [BufferedWriter(FileWriter(
            os.path.join(out_dir, "%s.fastq" % n))) for n in names]
        un = BufferedWriter(FileWriter(
            os.path.join(out_dir, "unassigned.fastq")))
        parser = bt.FastqParser(bt.open_reader(path))
        totals = demultiplex_to_writers(parser, codes, writers,
                                        unassigned_writer=un,
                                        max_mismatches=max_mm)
        for w in writers + [un]:
            w.close()
        for n, t in zip(names + ["unassigned"], totals):
            print("%s\t%s\t%d" % (path, n, t))


_COMMANDS = {
    "count": _count,
    "stats": _stats,
    "fasta-count": _fasta_count,
    "faidx": _faidx,
    "fetch": _fetch,
    "demux": _demux,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in _COMMANDS:
        print(__doc__)
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    _COMMANDS[argv[0]](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
