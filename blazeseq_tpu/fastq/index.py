"""FASTQ record index (``.fqi``): random access and exact record-aligned
sharding for plain FASTQ files.

The reference leaves FASTQ random access explicitly open (README.md:129-134,
docs/TODO.md:5-8 — "end-to-end, no seek"); this module closes it the same
way ``.fai`` does for FASTA: a sidecar index built in one scan-speed pass,
then O(1) seeks to any record.

The index stores the absolute byte offset of every ``stride``-th record's
``@`` byte plus total record/base counts. ``IndexedFastq.fetch(start, n)``
seeks to the nearest checkpoint and skips at most ``stride - 1`` records
with the zero-copy view iterator; ``shard_ranges(k)`` cuts the file into
``k`` byte ranges that all begin exactly on a record boundary — the exact
alternative to the speculative byte-split + rescan used when no index
exists (parallel/pipeline.py file sharding).

Plain (uncompressed) FASTQ only: offsets into a gzip stream are not
seekable. For compressed random access, recompress as BGZF
(io/writers.BGZFWriter) and index the decompressed stream — virtual-offset
support is future work.

File format (text, one value per line, ``.fai``-spirit transparency)::

    #blazeseq-fqi\tv1\tstride=S\trecords=N\tbases=B\tbytes=Z
    <offset of record 0>
    <offset of record S>
    ...
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..errors import ParseError
from .parser import FastqParser
from .record import FastqRecord

FQI_MAGIC = "#blazeseq-fqi"
DEFAULT_STRIDE = 10_000


@dataclass
class FastqIndex:
    """Checkpoint table over a plain FASTQ file (see module docstring)."""

    stride: int
    n_records: int
    n_bases: int
    n_bytes: int  # indexed file size; detects stale indexes
    offsets: np.ndarray  # int64 [ceil(n_records / stride)]

    def checkpoint_for(self, record_index: int) -> tuple:
        """(byte offset, records to skip) to reach ``record_index``."""
        if not 0 <= record_index < self.n_records:
            raise IndexError(
                "record %d out of range (0..%d)"
                % (record_index, self.n_records - 1))
        k = record_index // self.stride
        return int(self.offsets[k]), record_index - k * self.stride


def build_fqi(path, stride: int = DEFAULT_STRIDE,
              config=None) -> FastqIndex:
    """One scan-speed pass over a plain FASTQ file -> FastqIndex.

    Validation follows ``config`` (default ParserConfig: structure checks
    only), so a file that indexes cleanly will also parse cleanly under the
    same config.
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    p = str(path)
    if p.endswith(".gz"):
        raise ParseError(
            "cannot build a .fqi over a gzip stream: byte offsets into "
            "compressed data are not seekable. Recompress as BGZF "
            "(blazeseq_tpu.BGZFWriter) or index the uncompressed file.")
    from ..io.readers import MmapReader

    parser = FastqParser(MmapReader(p), config=config)
    checkpoints: List[np.ndarray] = []
    n_records = 0
    n_bases = 0
    for first, starts, seq_lens in parser.offset_chunks():
        n = len(starts)
        # global indices first..first+n-1; keep those divisible by stride
        k0 = -(-first // stride)  # first checkpoint index in this batch
        sel = k0 * stride - first
        if sel < n:
            checkpoints.append(starts[sel::stride])
        n_records += n
        n_bases += int(seq_lens.sum())
    offsets = (np.concatenate(checkpoints) if checkpoints
               else np.empty(0, dtype=np.int64)).astype(np.int64)
    return FastqIndex(stride=stride, n_records=n_records, n_bases=n_bases,
                      n_bytes=os.path.getsize(p), offsets=offsets)


def write_fqi(index: FastqIndex, path) -> None:
    """Serialize (text format, see module docstring)."""
    with open(str(path), "w") as f:
        f.write("%s\tv1\tstride=%d\trecords=%d\tbases=%d\tbytes=%d\n"
                % (FQI_MAGIC, index.stride, index.n_records,
                   index.n_bases, index.n_bytes))
        f.write("".join("%d\n" % o for o in index.offsets))


def read_fqi(path) -> FastqIndex:
    """Load a ``.fqi`` written by :func:`write_fqi`."""
    with open(str(path)) as f:
        header = f.readline().rstrip("\n").split("\t")
        if not header or header[0] != FQI_MAGIC or len(header) < 6:
            raise ParseError("not a blazeseq .fqi file: %s" % path)
        kv = dict(part.split("=", 1) for part in header[2:])
        offsets = np.loadtxt(f, dtype=np.int64, ndmin=1) if kv.get(
            "records") != "0" else np.empty(0, dtype=np.int64)
    return FastqIndex(stride=int(kv["stride"]), n_records=int(kv["records"]),
                      n_bases=int(kv["bases"]), n_bytes=int(kv["bytes"]),
                      offsets=offsets)


class IndexedFastq:
    """Random access into a plain FASTQ file via a ``.fqi`` sidecar
    (the FASTQ analog of :class:`~blazeseq_tpu.fai.parser.IndexedFasta`).

    Builds the index on first use when no ``<path>.fqi`` exists (and a
    sidecar whose recorded size disagrees with the file is rebuilt, not
    trusted). Usage::

        with IndexedFastq("reads.fastq") as ix:
            recs = ix.fetch(1_000_000, 10)   # records 1e6..1e6+9
            for lo, hi in ix.shard_ranges(8): ...
    """

    def __init__(self, path, fqi_path=None, stride: int = DEFAULT_STRIDE,
                 config=None, save: bool = True):
        from ..io.readers import MmapReader

        self._path = str(path)
        self._config = config
        sidecar = str(fqi_path) if fqi_path else self._path + ".fqi"
        self.index: Optional[FastqIndex] = None
        if os.path.exists(sidecar):
            ix = read_fqi(sidecar)
            if ix.n_bytes == os.path.getsize(self._path):
                self.index = ix
        if self.index is None:
            self.index = build_fqi(self._path, stride=stride, config=config)
            if save:
                write_fqi(self.index, sidecar)
        self._reader = MmapReader(self._path)
        self._arr = self._reader.as_array()  # None when mmap unavailable

    def __len__(self) -> int:
        return self.index.n_records

    def _parser_at(self, offset: int) -> FastqParser:
        if self._arr is not None:
            from ..io.readers import MemoryReader

            return FastqParser(MemoryReader(self._arr[offset:]),
                               config=self._config)
        from ..io.readers import FileReader

        r = FileReader(self._path)
        r._f.seek(offset)
        return FastqParser(r, config=self._config)

    def fetch(self, start: int, count: int = 1) -> List[FastqRecord]:
        """Records ``start .. start+count-1`` (owned copies), by seeking to
        the nearest index checkpoint and skipping at most ``stride - 1``
        records with the zero-copy view iterator."""
        if count < 1:
            return []
        off, skip = self.index.checkpoint_for(start)
        stop = min(start + count, self.index.n_records)
        want = stop - start
        parser = self._parser_at(off)
        out: List[FastqRecord] = []
        it = parser.views(reuse=True)
        for _ in range(skip):
            next(it)
        for rec in parser.records():
            out.append(rec)
            if len(out) == want:
                break
        return out

    def shard_ranges(self, n: int) -> List[tuple]:
        """Split the file into ``n`` byte ranges ``[lo, hi)`` that each start
        exactly on a record boundary and jointly cover every record — exact
        file sharding with no speculative rescan. Fewer than ``n`` ranges
        come back when there are fewer checkpoints than shards."""
        if n < 1:
            raise ValueError("n must be >= 1")
        ix = self.index
        if ix.n_records == 0:
            return []
        n_ckpt = len(ix.offsets)
        # pick n roughly-equidistant checkpoints as shard starts (always
        # including record 0); granularity is the index stride
        picks = sorted({int(ix.offsets[(i * n_ckpt) // n])
                        for i in range(min(n, n_ckpt))})
        bounds = picks + [ix.n_bytes]
        return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]

    def close(self) -> None:
        self._reader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
