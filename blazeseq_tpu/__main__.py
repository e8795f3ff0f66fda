"""Command-line interface: `python -m blazeseq_tpu <command> ...`

Commands mirror the reference's example mains (examples/example_parser.mojo
takes argv paths) plus the ecosystem basics:

  count FILE [...]      records and base_pairs per FASTQ file (the benchmark
                        runner contract, run_blazeseq.mojo:3-5)
  stats [--adapter SEQ ...] [--duplicates] [--quartiles] [--json]
        [--device] [--schema NAME|auto] [--html OUT.html] FILE [...]
                        device QC report (reads, bases, GC, mean quality,
                        distribution panels) — uses the TPU when attached;
                        --adapter adds FastQC adapter-content scans,
                        --duplicates profiles duplication levels and
                        overrepresented sequences; --quartiles tracks the
                        full per-position quality distribution (FastQC
                        per-base boxplot percentiles); --device parses on the
                        TPU (pipeline B: uniform-template proof with exact
                        host fallback; core QC only); --schema auto infers
                        the Phred encoding from the file head; --html writes
                        a standalone FastQC-style HTML report (inline SVG,
                        light/dark, no dependencies)
  fasta-count FILE      records/bases for FASTA
  faidx FILE            build FILE.fai (samtools-compatible)
  fetch FILE NAME [START END]   random-access FASTA subsequence via .fai
  fqidx [--stride N] FILE [...]          build FILE.fqi (FASTQ record index)
  fqidx --fetch START [--count K] FILE   print records START..START+K-1 via
                        the .fqi (built on the fly if absent) — FASTQ random
                        access, an open item upstream (reference
                        README.md:129-134: "end-to-end, no seek")
  demux --barcode NAME=SEQ [...] [--mismatches K] [--out DIR] FILE
                        split reads by 5' barcode (device Hamming
                        assignment; 'N' in a barcode matches any base)
  filter [--min-len N] [--max-len N] [--min-q Q] [--fraction F]
         [--seed S] [--out FILE] FILE [...]
                        length / mean-quality / random-subsample read
                        filtering (bulk-serialized output)
  trim [--mode window|bwa|ends] [--q N] [--window N] [--out FILE] FILE
                        quality trimming on device (Trimmomatic
                        SLIDINGWINDOW / BWA -q / LEADING+TRAILING
                        semantics); writes trimmed FASTQ (reads trimmed
                        to zero length are dropped)
  merge [--min-overlap N] [--out FILE] R1 R2
  merge --interleaved [...] FILE
                        PEAR-style paired-end overlap merging on device
                        (two mate files, or one interleaved stream);
                        writes assembled reads, prints pair/merge counts
  tiles FILE [...]      FastQC per-tile sequence quality: per-tile mean
                        Phred and deviation from the per-position mean
                        (Illumina coordinate ids)
"""

from __future__ import annotations

import os
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
    quartiles = False
    as_json = False
    device_ingest = False
    html_out = None
    schema = "sanger"
    paths = []
    it = iter(args)
    for a in it:
        if a == "--html":
            try:
                html_out = next(it)
            except StopIteration:
                print("usage: stats --html OUT.html FILE", file=sys.stderr)
                raise SystemExit(2)
        elif a == "--adapter":
            try:
                adapters.append(next(it).encode("ascii"))
            except StopIteration:
                print("usage: stats --adapter SEQUENCE [...] FILE",
                      file=sys.stderr)
                raise SystemExit(2)
        elif a == "--schema":
            try:
                schema = next(it)  # a schema name, or "auto" to infer
            except StopIteration:
                print("usage: stats --schema NAME|auto FILE",
                      file=sys.stderr)
                raise SystemExit(2)
        elif a == "--duplicates":
            duplicates = True
        elif a == "--quartiles":
            quartiles = True
        elif a == "--json":
            as_json = True
        elif a == "--device":
            device_ingest = True
        else:
            paths.append(a)
    for path in paths:
        qc = QCModel(quality_schema=schema, check_ascii=True,
                     check_quality=True, adapters=adapters or None,
                     track_duplicates=duplicates,
                     track_quartiles=quartiles)
        report = (qc.run_file_device(path) if device_ingest
                  else qc.run_file(path))
        if html_out:
            from blazeseq_tpu.report import write_html

            out = html_out if len(paths) == 1 else \
                "%s.%s.html" % (html_out.rsplit(".html", 1)[0],
                                os.path.basename(path))
            write_html(report, out, title="QC report — %s"
                       % os.path.basename(path))
            print("wrote %s" % out)
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


def _fqidx(args):
    """fqidx [--stride N] [--fetch START [--count K]] FILE [...]"""
    import blazeseq_tpu as bt

    stride, fetch_start, count, paths = 10_000, None, 1, []
    it = iter(args)
    for a in it:
        if a == "--stride":
            stride = int(next(it))
        elif a == "--fetch":
            fetch_start = int(next(it))
        elif a == "--count":
            count = int(next(it))
        else:
            paths.append(a)
    if not paths:
        print("usage: fqidx [--stride N] [--fetch START [--count K]] FILE",
              file=sys.stderr)
        raise SystemExit(2)
    for path in paths:
        if fetch_start is None:
            ix = bt.build_fqi(path, stride=stride)
            bt.write_fqi(ix, path + ".fqi")
            print("wrote %s.fqi (%d records, %d bases, %d checkpoints)"
                  % (path, ix.n_records, ix.n_bases, len(ix.offsets)))
        else:
            with bt.IndexedFastq(path, stride=stride) as ix:
                out = sys.stdout.buffer
                for rec in ix.fetch(fetch_start, count):
                    out.write(rec.to_bytes())


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


def _filter(args):
    """filter [--min-len N] [--max-len N] [--min-q Q] [--fraction F]
    [--seed S] [--out FILE] FILE [...]

    Length / mean-quality / random-subsample read filtering (the
    seqkit/fastp basics), written through the bulk serializer."""
    import numpy as np

    import blazeseq_tpu as bt
    from blazeseq_tpu.fastq.batch import serialize_fastq_soa
    from blazeseq_tpu.io.writers import BufferedWriter, FileWriter

    min_len = max_len = min_q = frac = None
    seed = 0
    out_path = None
    paths = []
    it = iter(args)
    for a in it:
        try:
            if a == "--min-len":
                min_len = int(next(it))
            elif a == "--max-len":
                max_len = int(next(it))
            elif a == "--min-q":
                min_q = float(next(it))
            elif a == "--fraction":
                frac = float(next(it))
            elif a == "--seed":
                seed = int(next(it))
            elif a == "--out":
                out_path = next(it)
            else:
                paths.append(a)
        except StopIteration:
            paths = []
            break
    if not paths:
        print("usage: filter [--min-len N] [--max-len N] [--min-q Q]"
              " [--fraction F] [--seed S] [--out FILE] FILE",
              file=sys.stderr)
        raise SystemExit(2)
    rng = np.random.default_rng(seed)
    w = BufferedWriter(FileWriter(out_path)) if out_path else None
    for path in paths:
        parser = bt.FastqParser(bt.open_reader(path))
        off = parser.quality_schema.OFFSET
        total = kept = 0
        for batch in parser.batches(8192):
            batch._finalize()
            ends = batch._ends
            starts = np.concatenate(([0], ends[:-1]))
            lens = (ends - starts).astype(np.int64)
            keep = np.ones(len(lens), bool)
            if min_len is not None:
                keep &= lens >= min_len
            if max_len is not None:
                keep &= lens <= max_len
            if min_q is not None:
                # exact mean phred per read from the SoA quality bytes
                q64 = batch._quality_bytes.astype(np.int64)
                sums = np.add.reduceat(q64, starts.clip(max=max(
                    len(q64) - 1, 0))) if len(q64) else np.zeros(0)
                sums = np.where(lens > 0, sums, 0)
                mean = np.where(lens > 0,
                                (sums - off * lens) / np.maximum(lens, 1),
                                0.0)
                keep &= mean >= min_q
            if frac is not None:
                keep &= rng.random(len(lens)) < frac
            total += len(lens)
            kept += int(keep.sum())
            if w is not None and keep.any():
                w.write_bytes(serialize_fastq_soa(
                    batch._id_bytes, batch._id_ends,
                    batch._sequence_bytes, batch._quality_bytes, ends,
                    sub_start=np.zeros(len(lens), np.int64),
                    sub_len=np.where(keep, lens, 0)))
        print("%s\treads %d -> kept %d" % (path, total, kept))
    if w is not None:
        w.close()


def _trim(args):
    """trim [--mode window|bwa|ends] [--q N] [--window N] [--out FILE] FILE"""
    import numpy as np

    import blazeseq_tpu as bt
    from blazeseq_tpu.io.writers import BufferedWriter, FileWriter
    from blazeseq_tpu.ops import trim as trim_ops

    mode, q, window, out_path = "window", None, 4, None
    paths = []
    it = iter(args)
    for a in it:
        try:
            if a == "--mode":
                mode = next(it)
            elif a == "--q":
                q = int(next(it))
            elif a == "--window":
                window = int(next(it))
            elif a == "--out":
                out_path = next(it)
            else:
                paths.append(a)
        except StopIteration:
            paths = []
            break
    if not paths or mode not in ("window", "bwa", "ends"):
        print("usage: trim [--mode window|bwa|ends] [--q N] [--window N]"
              " [--out FILE] FILE", file=sys.stderr)
        raise SystemExit(2)
    import jax.numpy as jnp

    # one writer across all inputs (FileWriter truncates on open, so a
    # per-path writer would keep only the last input's reads)
    w = BufferedWriter(FileWriter(out_path)) if out_path else None
    for path in paths:
        parser = bt.FastqParser(bt.open_reader(path))
        off = parser.quality_schema.OFFSET
        total = kept = 0
        bases_in = bases_out = 0
        for batch in parser.batches(4096):
            # width sized to the batch (no clamp): a fixed cap would zero
            # the quality tail of longer reads and silently mis-trim them
            pb = batch.to_padded()
            qual = jnp.asarray(pb.qual)
            lens = jnp.asarray(pb.lengths, jnp.int32)
            starts = None
            if mode == "window":
                new = trim_ops.sliding_window_trim(
                    qual, lens, off, q if q is not None else 15,
                    window=window)
            elif mode == "bwa":
                new = trim_ops.bwa_trim(qual, lens, off,
                                        q if q is not None else 20)
            else:
                st, new = trim_ops.clip_ends(
                    qual, lens, off, leading=q if q is not None else 3,
                    trailing=q if q is not None else 3)
                starts = np.asarray(st)[: pb.n_records]
            new = np.asarray(new)[: pb.n_records]
            n = pb.n_records
            total += n
            bases_in += int(np.asarray(pb.lengths[:n], np.int64).sum())
            kept += int((new > 0).sum())
            bases_out += int(new[new > 0].sum())
            if w is not None:
                # bulk serialization: one vectorized pass over the batch
                # (no per-record Python writes)
                from blazeseq_tpu.fastq.batch import serialize_fastq_rows

                w.write_bytes(serialize_fastq_rows(
                    batch._id_bytes, batch._id_ends,
                    np.asarray(pb.seq)[:n], np.asarray(pb.qual)[:n],
                    new, sub_start=starts))
        print("%s\treads %d -> kept %d\tbases %d -> %d"
              % (path, total, kept, bases_in, bases_out))
    if w is not None:
        w.close()


def _merge(args):
    """merge [--min-overlap N] [--out FILE] R1 R2
       merge --interleaved [--min-overlap N] [--out FILE] FILE"""
    import numpy as np

    import blazeseq_tpu as bt
    from blazeseq_tpu.io.writers import BufferedWriter, FileWriter
    from blazeseq_tpu.ops.merge import merge_pairs

    min_ov, out_path, inter = 10, None, False
    paths = []
    it = iter(args)
    for a in it:
        try:
            if a == "--min-overlap":
                min_ov = int(next(it))
            elif a == "--out":
                out_path = next(it)
            elif a == "--interleaved":
                inter = True
            else:
                paths.append(a)
        except StopIteration:
            paths = []
            break
    if len(paths) != (1 if inter else 2):
        print("usage: merge [--min-overlap N] [--out FILE] R1 R2\n"
              "       merge --interleaved [--min-overlap N] [--out FILE]"
              " FILE", file=sys.stderr)
        raise SystemExit(2)
    import jax.numpy as jnp

    if inter:
        # one native batch scan, split by record parity — same cost shape
        # as the two-file path (and, like it, no per-pair id checking:
        # use InterleavedFastqParser.pairs() when ids must be verified)
        ip = bt.FastqParser(bt.open_reader(paths[0]))

        def next_batch_pair():
            b = ip.next_batch(8192)
            n = b.num_records()
            if n % 2:
                print("merge: interleaved stream ended with an unpaired "
                      "R1", file=sys.stderr)
                raise SystemExit(1)
            if n == 0:
                return bt.FastqBatch(), bt.FastqBatch()
            return b.deinterleave()
    else:
        p1 = bt.FastqParser(bt.open_reader(paths[0]))
        p2 = bt.FastqParser(bt.open_reader(paths[1]))

        def next_batch_pair():
            return p1.next_batch(4096), p2.next_batch(4096)

    w = BufferedWriter(FileWriter(out_path)) if out_path else None
    pairs = merged = 0
    while True:
        b1, b2 = next_batch_pair()
        if b1.num_records() != b2.num_records():
            print("merge: mate files have unequal record counts",
                  file=sys.stderr)
            raise SystemExit(1)
        if b1.num_records() == 0:
            break
        # common width sized to the longest read of EITHER mate (merge_pairs
        # needs equal [n, L]); a fixed cap would truncate longer reads and
        # mis-assign overlaps
        def _batch_max_len(b):
            b._finalize()
            e = b._ends
            return int(np.diff(e, prepend=0).max()) if len(e) else 0

        width = max(_batch_max_len(b1), _batch_max_len(b2), 1)
        pb1 = b1.to_padded(max_len=width)
        pb2 = b2.to_padded(max_len=width)
        res = merge_pairs(
            jnp.asarray(pb1.seq), jnp.asarray(pb1.qual),
            jnp.asarray(pb1.lengths, jnp.int32),
            jnp.asarray(pb2.seq), jnp.asarray(pb2.qual),
            jnp.asarray(pb2.lengths, jnp.int32), min_overlap=min_ov)
        n = pb1.n_records
        lens = np.asarray(res.merged_len)[:n]
        pairs += n
        merged += int((lens > 0).sum())
        if w is not None:
            from blazeseq_tpu.fastq.batch import serialize_fastq_rows

            b1._finalize()
            w.write_bytes(serialize_fastq_rows(
                b1._id_bytes, b1._id_ends, np.asarray(res.seq)[:n],
                np.asarray(res.qual)[:n], lens))
    if w is not None:
        w.close()
    src = paths[0] if inter else "%s + %s" % (paths[0], paths[1])
    print("%s\tpairs %d\tmerged %d (%.1f%%)"
          % (src, pairs, merged,
             100.0 * merged / pairs if pairs else 0.0))


def _tiles(args):
    import blazeseq_tpu as bt
    from blazeseq_tpu.ops.tiles import (PerTileAccumulator,
                                        parse_illumina_tiles)

    if not args:
        print("usage: tiles FILE [...]", file=sys.stderr)
        raise SystemExit(2)
    for path in args:
        parser = bt.FastqParser(bt.open_reader(path))
        off = parser.quality_schema.OFFSET
        acc = PerTileAccumulator()
        for batch in parser.batches(4096):
            batch._finalize()
            pb = batch.to_padded()
            tiles = parse_illumina_tiles(batch._id_bytes, batch._id_ends)
            acc.add_batch(tiles, pb.qual, pb.lengths, off,
                          n_records=pb.n_records)
        ts, mean = acc.mean()
        _ts, dev = acc.deviation()
        if not len(ts):
            print("%s\t(no Illumina coordinate ids)" % path)
            continue
        import numpy as np

        for k, t in enumerate(ts.tolist()):
            m = mean[k]
            d = dev[k]
            finite = np.isfinite(m)
            print("%s\ttile %d\tmeanQ %.2f\tmax|dev| %.2f"
                  % (path, t,
                     float(m[finite].mean()) if finite.any() else float("nan"),
                     float(np.nanmax(np.abs(d))) if finite.any()
                     else float("nan")))


_COMMANDS = {
    "count": _count,
    "stats": _stats,
    "fasta-count": _fasta_count,
    "faidx": _faidx,
    "fetch": _fetch,
    "fqidx": _fqidx,
    "demux": _demux,
    "filter": _filter,
    "trim": _trim,
    "merge": _merge,
    "tiles": _tiles,
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
