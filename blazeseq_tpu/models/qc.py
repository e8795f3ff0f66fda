"""QCModel — streaming FastQC-style quality-control over a FASTQ source.

The framework's flagship "model": file/gzip bytes -> host bulk scan -> padded
SoA batches -> device fused validate/decode/QC (+ optional NW alignment) ->
host int64 accumulation. Batches use a static shape (fixed record count and
read length buckets) so XLA compiles the step once.

This generalizes the reference's end-to-end consumers (reads/bases counting
runners + nw_gpu example, SURVEY.md §2.2/§2.4) into a reusable pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import native
from ..constants import DEFAULT_BATCH_SIZE, TPU_LANE
from ..fastq.parser import FastqParser, ParserConfig
from ..fastq.quality import QualitySchema, parse_schema
from ..io.readers import open_reader
from ..ops.stats import QCAccumulator
from ..parallel.pipeline import build_qc_align_step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class QCReport:
    reads: int
    bases: int
    error_reads: int
    gc_fraction: float
    mean_quality: float
    base_counts: np.ndarray  # [5] A C G T other
    per_position_mean_quality: np.ndarray
    qual_hist: np.ndarray
    nw_scores: Optional[np.ndarray] = None
    # FastQC-style per-read distribution panels
    length_hist: Optional[np.ndarray] = None  # [LEN_BINS] reads by length
    gc_hist: Optional[np.ndarray] = None  # [101] reads by GC%
    mean_qual_hist: Optional[np.ndarray] = None  # reads by rounded mean Phred
    # [5, width] A/C/G/T/other counts per position + [width] in-window read
    # count (for %-composition panels; report.py renders them)
    per_pos_base_counts: Optional[np.ndarray] = None
    per_pos_count: Optional[np.ndarray] = None
    # adapter panel: {adapter: merged AdapterStats} when adapters= was given
    adapter_stats: Optional[dict] = None
    # duplication panel (track_duplicates=True): levels[k] = distinct
    # sequences seen exactly k times (k=10 means ">= 10"), over the first
    # dup_track_limit reads
    duplication_levels: Optional[np.ndarray] = None
    frac_unique_reads: Optional[float] = None
    # overrepresented sequences: [(prefix bytes <=50bp, count)] for sequences
    # making up > 0.1% of the tracked sample, most frequent first
    overrepresented: Optional[list] = None
    # per-base quality boxplot panel (track_quartiles=True): [5, width]
    # rows = p10, q1, median, q3, p90 per position (FastQC's whisker set),
    # plus the raw distribution [MAX_PHRED, width] it derives from
    quality_quartiles: Optional[np.ndarray] = None
    per_pos_qual_hist: Optional[np.ndarray] = None

    def __str__(self) -> str:
        s = ("QCReport(reads=%d, bases=%d, errors=%d, gc=%.4f, meanQ=%.2f"
             % (self.reads, self.bases, self.error_reads, self.gc_fraction,
                self.mean_quality))
        if self.frac_unique_reads is not None:
            s += ", unique=%.1f%%" % (100.0 * self.frac_unique_reads)
        return s + ")"

    def to_dict(self) -> dict:
        """JSON-serializable report (FastQC's fastqc_data.txt analog):
        scalars, histograms as lists, adapter/duplication panels when
        enabled. Zero-count histogram tails are trimmed."""
        def _trim(a):
            a = np.asarray(a)
            nz = np.flatnonzero(a)
            return a[: int(nz[-1]) + 1].tolist() if nz.size else []

        d = dict(
            reads=int(self.reads), bases=int(self.bases),
            error_reads=int(self.error_reads),
            gc_fraction=round(float(self.gc_fraction), 6),
            mean_quality=round(float(self.mean_quality), 4),
            base_counts=dict(zip("ACGTN", np.asarray(
                self.base_counts).astype(int).tolist())),
            per_position_mean_quality=[
                round(float(x), 3) for x in self.per_position_mean_quality],
            qual_hist=_trim(self.qual_hist),
        )
        if self.length_hist is not None:
            d["length_hist"] = _trim(self.length_hist)
            d["gc_hist"] = _trim(self.gc_hist)
            d["mean_qual_hist"] = _trim(self.mean_qual_hist)
        if self.per_pos_count is not None:
            cnt = np.asarray(self.per_pos_count)
            nz = np.flatnonzero(cnt)
            w = int(nz[-1]) + 1 if nz.size else 0
            d["per_pos_count"] = cnt[:w].astype(int).tolist()
            d["per_pos_base_counts"] = [
                row[:w].astype(int).tolist()
                for row in np.asarray(self.per_pos_base_counts)]
        if self.adapter_stats:
            d["adapters"] = {
                a.decode("ascii", "replace"): dict(
                    reads_with_adapter=int(st.reads_with_adapter),
                    reads_scanned=int(st.reads_scanned),
                    first_occurrence=_trim(st.first_occurrence))
                for a, st in self.adapter_stats.items()}
        if self.duplication_levels is not None:
            d["duplication_levels"] = np.asarray(
                self.duplication_levels).astype(int).tolist()
            d["frac_unique_reads"] = round(float(self.frac_unique_reads), 6)
            d["overrepresented"] = [
                dict(sequence=s.decode("ascii", "replace"), count=c)
                for s, c in (self.overrepresented or [])]
        if self.quality_quartiles is not None:
            w = len(d.get("per_pos_count", self.per_position_mean_quality))
            qq = np.asarray(self.quality_quartiles)[:, :w].astype(int)
            d["quality_quartiles"] = dict(zip(
                ("p10", "q1", "median", "q3", "p90"),
                (row.tolist() for row in qq)))
        if self.nw_scores is not None:
            d["nw_score_mean"] = round(float(np.mean(self.nw_scores)), 4)
        return d


class _ChainedReader:
    """Reader serving buffered leftover bytes first, then an inner reader
    (used to hand a partially-consumed stream to the host parser)."""

    def __init__(self, leftover: bytes, inner):
        self._left = memoryview(leftover)
        self._pos = 0
        self._inner = inner

    def readinto(self, mv) -> int:
        if self._pos < len(self._left):
            n = min(len(mv), len(self._left) - self._pos)
            mv[:n] = self._left[self._pos : self._pos + n]
            self._pos += n
            return n
        return self._inner.readinto(mv)

    def close(self) -> None:
        self._inner.close()


class QCModel:
    """Streaming QC (and optional alignment) engine."""

    def __init__(self, quality_schema: str | QualitySchema = "generic",
                 check_ascii: bool = True, check_quality: bool = True,
                 batch_size: int = DEFAULT_BATCH_SIZE,
                 max_read_len: int = 256,
                 align_to: Optional[bytes] = None,
                 adapters: Optional[list] = None,
                 track_duplicates: bool = False,
                 dup_track_limit: int = 200_000,
                 track_quartiles: bool = False,
                 mesh=None):
        # "auto": resolve lazily from the first file's head bytes
        # (fastq/quality.detect_quality_schema_file); reader-based entry
        # points reject it because a stream cannot be peeked twice.
        self._auto_schema = quality_schema == "auto"
        if self._auto_schema:
            self.schema = parse_schema("generic")  # placeholder until run
        else:
            self.schema = (quality_schema
                           if isinstance(quality_schema, QualitySchema)
                           else parse_schema(quality_schema))
        self.check_ascii = check_ascii
        self.check_quality = check_quality
        self.batch_size = batch_size
        self.max_read_len = _round_up(max_read_len, TPU_LANE)
        self.align_to = align_to
        self.adapters = [bytes(a) for a in adapters] if adapters else None
        # FastQC-style: profile duplication over the first dup_track_limit
        # reads (the TPU hashes every read; the host counts hash repeats)
        self.track_duplicates = track_duplicates
        self.dup_track_limit = dup_track_limit
        # FastQC per-base quality boxplot: track the full [MAX_PHRED, L]
        # per-position quality distribution (median/quartiles/deciles need
        # the distribution, not the per-position sum)
        self.track_quartiles = track_quartiles
        self.mesh = mesh
        self._step = build_qc_align_step(
            mesh, check_ascii=check_ascii, check_quality=check_quality,
            with_alignment=align_to is not None,
            qual_hist_2d=track_quartiles)

    def _resolve_auto_schema(self, path) -> None:
        if self._auto_schema:
            from ..fastq.quality import detect_quality_schema_file

            self.schema = detect_quality_schema_file(str(path))
            self._auto_schema = False  # one corpus per model instance

    def run_file(self, path, parallelism: int = 4) -> QCReport:
        self._resolve_auto_schema(path)
        return self.run_reader(open_reader(path, parallelism=parallelism))

    def run_file_device(self, path, chunk_mb: int = 256,
                        parallelism: int = 4) -> QCReport:
        """See _run_file_device_once; this wrapper adds the adaptive-
        histogram contract: device chunks run with Phred bins capped at
        the head-peeked max quality byte (the dominant kernel pass is
        linear in bin count — binned-quality corpora run ~2-3x faster),
        and a nonzero sentinel bin in the final report triggers ONE exact
        full-bin re-run, so the result never depends on the peek."""
        self._hist_his = set()
        self._len_his = set()
        rep = self._run_file_device_once(path, chunk_mb, parallelism,
                                         adaptive=True)
        if any(self._hist_overflows(rep, h) for h in self._hist_his) or \
                any(self._len_overflows(rep, v) for v in self._len_his):
            self._hist_his = set()
            self._len_his = set()
            rep = self._run_file_device_once(path, chunk_mb, parallelism,
                                             adaptive=False)
        return rep

    def _run_file_device_once(self, path, chunk_mb: int = 256,
                              parallelism: int = 4,
                              adaptive: bool = True) -> QCReport:
        """Pipeline B: raw bytes go straight to HBM and the TPU parses,
        validates, and computes QC under the uniform-layout template proof
        in one fused pass (ops/uniform_qc.py) — ~41 GB/s/chip, no host
        byte work and no intermediate SoA materialization. Any
        chunk that fails the proof, and everything after it, streams
        through the exact host engine instead, so the report is always
        byte-identical to run_file. Gzip inputs decompress on the host
        (parallel inflate) and feed the same device parser.

        Covers core QC (stats panels). Adapters, duplication tracking,
        alignment, and mesh sharding take the host path — call run_file.
        Non-uniform layouts (varying header widths / read lengths) use the
        general ragged device engine (ops/ragged_qc.py) — still a full
        device parse. Reads LONGER than max_read_len stay on device too
        (exact truncation semantics: bases/length panels true, composition
        and quality panels over the first max_read_len bases — identical
        to run_file). Only layouts outside the ragged tier's proven bounds
        (records spanning fewer than ~max_read_len/2 bytes beyond the
        head-peeked slot capacity) drop to the host."""
        if (self.adapters or self.track_duplicates or self.mesh is not None
                or self.align_to is not None or self.track_quartiles):
            raise ValueError(
                "run_file_device covers core QC; use run_file for "
                "adapters/duplicates/alignment/quartiles/mesh")
        from ..io.readers import MemoryReader, MmapReader
        from ..ops.uniform_parse import detect_uniform_layout

        p = str(path)
        self._resolve_auto_schema(p)
        if p.endswith(".gz") or p.endswith(".bgz"):
            return self._run_stream_device(p, chunk_mb, parallelism)
        reader = MmapReader(p)
        data = reader.as_array()
        if data is None or len(data) == 0:
            return self.run_reader(reader)
        lay = detect_uniform_layout(data)
        if lay is None or lay.rs > chunk_mb << 19:
            # semi-uniform tier first (fixed L, ragged ids -> normalize to
            # the uniform kernel); general ragged tier when it declines
            rep = self._run_normalized_mmap(data, chunk_mb,
                                            adaptive=adaptive)
            if rep is not None:
                return rep
            return self._run_ragged_mmap(data, chunk_mb, adaptive=adaptive)
        total = len(data)
        csize = max((chunk_mb << 20) // lay.rs, 1) * lay.rs
        # never allocate a chunk larger than the (rs-rounded) input
        csize = min(csize, -(-total // lay.rs) * lay.rs)
        hv = self._adaptive_hist_vals(data) if adaptive else ()
        uqc = self._device_uqc(lay, self.max_read_len, hist_vals=hv)

        # Overlapped ingest (SURVEY §7.3): full-size chunks are read-only
        # slices of the mmap fed zero-copy; the device works `depth` chunks
        # behind the dispatch front, so its compute overlaps the host's
        # slicing/transfer of the next chunks. A chunk's template verdict
        # arrives late; chunks dispatched after a failure are discarded and
        # the host engine resumes from the failed chunk's start.
        from ..parallel.ingest import OverlappedIngest

        ing = OverlappedIngest(lambda c, nv: uqc(c, jnp.int32(nv)), csize,
                               row_bytes=lay.rs)
        acc = QCAccumulator()
        fail_pos = None

        def consume(ready):
            nonlocal fail_pos
            for meta, (ok, st) in ready:
                if fail_pos is not None:
                    continue
                if bool(ok):
                    acc.add(st)
                else:
                    fail_pos = meta  # proof failed: host from this boundary
        pos = 0
        while pos < total and fail_pos is None:
            b = min(pos + csize, total)
            n_valid = (b - pos) // lay.rs * lay.rs
            if n_valid == 0:
                break  # trailing partial record: host tail
            if b - pos == csize:
                consume(ing.feed(data[pos:b], n_valid, meta=pos,
                                 owned=False))
            else:
                buf = ing.acquire()
                buf[: b - pos] = data[pos:b]
                buf[b - pos:] = 0
                consume(ing.feed(buf, n_valid, meta=pos))
            pos += n_valid
        consume(ing.drain())
        if fail_pos is not None:
            # The template proof failed mid-file (head looked uniform, the
            # rest is not — or bytes are invalid). fail_pos is a proven
            # record boundary, so the semi-uniform tier (then the general
            # ragged engine) takes the remainder; those fall back to the
            # exact host engine for anything outside their tiers
            # (including truly invalid bytes).
            rep = self._run_normalized_mmap(data[fail_pos:], chunk_mb,
                                            acc=acc, adaptive=adaptive)
            if rep is not None:
                return rep
            return self._run_ragged_mmap(data[fail_pos:], chunk_mb, acc=acc,
                                         adaptive=adaptive)
        if pos < total:
            # trailing partial record (or no provable boundary): exact host
            # engine for the remainder (pos is a proven record boundary:
            # every accepted chunk ends at one). Structure-only host parse,
            # validation on device via the fused step — the same division
            # of labor as run_reader, so bad records COUNT as error_reads
            # instead of raising.
            parser = FastqParser(MemoryReader(data[pos:]),
                                 config=ParserConfig())
            parser.quality_schema = self.schema
            self._host_consume(parser, acc)
        return self._report_from_acc(acc)

    def _device_rqc(self, c, n_valid, width=None, slot_cap=12,
                    hist_vals=(), len_vals=()):
        """The general (ragged-layout) fused device step — full parse +
        validate + QC for chunks whose header widths and read lengths vary
        per record (ops/ragged_qc.py). `hist_vals`/`len_vals` compile the
        eq-mode phred/length histograms (same re-run contract as the
        uniform kernel)."""
        from ..ops.ragged_qc import ragged_qc

        return ragged_qc(
            c, n_valid, width=width if width is not None
            else self.max_read_len,
            q_lo=int(self.schema.LOWER), q_hi=int(self.schema.UPPER),
            offset=int(self.schema.OFFSET), check_ascii=self.check_ascii,
            check_quality=self.check_quality, slot_cap=int(slot_cap),
            hist_vals=hist_vals, len_vals=len_vals)

    @staticmethod
    def _peek_ragged_slot_cap(data, width, head_bytes=1 << 16):
        """Slot capacity for the ragged device tier, from a host peek at
        the corpus head. A pure sizing hint: the kernel re-proves the bound
        on device per chunk and reports `fallback` when the rest of the
        corpus is packed denser, so correctness never depends on the peek.
        Short-record corpora (records well under `width` bytes) pack more
        than the default 12 line ends into a 2*width tile; sizing the cap
        to the densest peeked packing (+1 record margin) keeps them on
        device instead of dropping every chunk to the host."""
        head = np.asarray(data[: min(len(data), head_bytes)])
        nl = np.flatnonzero(head == 10)
        K = 2 * _round_up(width, TPU_LANE)
        rec_ends = nl[3::4]
        if len(rec_ends) < 2:
            return 12
        min_span = int(np.diff(rec_ends).min())
        slot_cap = 4 * (K // max(min_span, 8) + 2) + 4
        return int(min(max(12, slot_cap), 96))

    @staticmethod
    def _peek_semi_uniform(data, head_bytes=1 << 16, margin=16):
        """(L, idw) for the semi-uniform tier from a host peek at the
        corpus head: fixed seq/qual length L, bare '+' separators, id text
        up to idw bytes (max observed + margin). A pure sizing hint — the
        normalizer re-checks every record byte-wise and the device
        template proof re-verifies every produced chunk, so correctness
        never depends on the peek. Returns None when the head is not
        semi-uniform (mixed lengths, '+' with text, malformed)."""
        head = np.asarray(data[: min(len(data), head_bytes)])
        nl = np.flatnonzero(head == 10)
        k = len(nl) // 4
        if k < 1:
            return None
        id_nl = nl[0:4 * k:4]
        seq_nl = nl[1:4 * k:4]
        sep_nl = nl[2:4 * k:4]
        qual_nl = nl[3:4 * k:4]
        starts = np.empty(k, np.int64)
        starts[0] = 0
        starts[1:] = qual_nl[:-1] + 1
        L = int(seq_nl[0] - id_nl[0] - 1)
        if L <= 0:
            return None
        ok = head[starts] == ord("@")
        ok &= (seq_nl - id_nl - 1) == L
        ok &= (sep_nl - seq_nl) == 2
        ok &= head[np.minimum(seq_nl + 1, len(head) - 1)] == ord("+")
        ok &= (qual_nl - sep_nl - 1) == L
        if not ok.all():
            return None
        return L, int((id_nl - starts - 1).max()) + margin

    def _run_normalized_mmap(self, data, chunk_mb: int, acc=None,
                             adaptive: bool = True):
        """Pipeline B, semi-uniform tier: real corpora are overwhelmingly
        FIXED read length with VARIABLE-width ids (coordinate headers) —
        the one shape the uniform template rejects but the 40 GB/s uniform
        kernel could serve. The host rewrites each record's id line to a
        fixed stride at memcpy speed (native bs_normalize_semi_uniform,
        trailing-space padding — QC reads no id bytes) directly into the
        overlapped-ingest staging buffers; the device runs the one-pass
        uniform parse+validate+QC on the normalized chunks.

        Exactness: the device template proof re-verifies every produced
        chunk; a proof failure re-routes the REMAINDER from that chunk's
        original record boundary to the general ragged tier (which itself
        falls back to the exact host engine). A normalizer bail mid-file
        (an id wider than the peeked bound, a read-length change) re-peeks
        and continues with the new layout when possible — so block-wise
        mixed-length corpora stay on this tier per block.

        Returns None when the corpus head is not semi-uniform."""
        from ..parallel.ingest import OverlappedIngest

        peek = self._peek_semi_uniform(data)
        if peek is None:
            return None
        L, idw = peek
        total = len(data)
        pos = 0
        if acc is None:
            acc = QCAccumulator()
        from ..ops.uniform_parse import UniformLayout

        while pos < total:
            rs = idw + 2 * L + 6
            if rs > (chunk_mb << 19):
                break  # record bigger than half a chunk: not this tier
            lay = UniformLayout(rs=rs, o1=idw + 1, o2=idw + 2 + L,
                                o3=idw + 4 + L)
            hv = self._adaptive_hist_vals(data[pos:pos + (1 << 16)]) \
                if adaptive else ()
            uqc = self._device_uqc(lay, self.max_read_len, hist_vals=hv)
            csize = max((chunk_mb << 20) // rs, 1) * rs
            ing = OverlappedIngest(
                lambda c, nv, _u=uqc: _u(c, jnp.int32(nv)), csize,
                row_bytes=rs)
            fail_orig = None

            def consume(ready):
                nonlocal fail_orig
                for meta, (ok, st) in ready:
                    if fail_orig is not None:
                        continue
                    if bool(ok):
                        acc.add(st)
                    else:
                        fail_orig = meta  # chunk's ORIGINAL start offset
            stalled = False
            while pos < total and fail_orig is None:
                buf = ing.acquire()
                nrec, consumed = native.normalize_semi_uniform(
                    data, pos, buf, idw, L)
                if nrec == 0:
                    stalled = True
                    break
                consume(ing.feed(buf, nrec * rs, meta=pos))
                pos = consumed
            consume(ing.drain())
            if fail_orig is not None:
                pos = fail_orig
                break  # device rejected: remainder leaves this tier
            if stalled and pos < total:
                peek2 = self._peek_semi_uniform(data[pos:])
                if peek2 is None:
                    break
                L2, idw2 = peek2
                if L2 == L and idw2 <= idw:
                    break  # no progress possible: stop re-peeking
                # same-L stall: an id outgrew the bound, keep the wider of
                # the two; new L: a block boundary, restart with its layout
                idw = max(idw2, idw) if L2 == L else idw2
                L = L2
                continue
            break
        if pos >= total:
            return self._report_from_acc(acc)
        return self._run_ragged_mmap(data[pos:], chunk_mb, acc=acc,
                                     adaptive=adaptive)

    def _run_ragged_mmap(self, data, chunk_mb: int, acc=None,
                         adaptive: bool = True) -> QCReport:
        """Pipeline B, general tier: device-parse a non-uniform mmap'd file
        with OVERLAPPED ingest. Chunk cuts come from a cheap host-side
        record-boundary resync (parallel/sharding.find_record_boundary_bytes),
        which makes every chunk independent — no per-chunk sync on the
        device-reported tail, so staging/transfer overlaps device compute
        exactly like the uniform path. The device re-proves each chunk
        (validation + tier bounds + tail == chunk length); any disagreement
        — including a wrong host cut on adversarial bytes — rejects the
        chunk, and the remainder from that chunk's start streams through
        the exact host engine."""
        from ..io.readers import MemoryReader
        from ..parallel.ingest import OverlappedIngest
        from ..parallel.sharding import find_record_boundary_bytes

        slot_cap = self._peek_ragged_slot_cap(data, self.max_read_len)
        K = 2 * self.max_read_len
        total = len(data)
        # the ragged kernel's [T, K] intermediates make 256 MB chunks ~12%
        # slower than 128 MB on v5e (HBM working-set pressure; slope-timed)
        chunk_mb = min(chunk_mb, 128)
        csize = max((chunk_mb << 20) // K, 1) * K
        csize = min(csize, -(-total // K) * K)
        if acc is None:
            acc = QCAccumulator()

        hv_r = self._adaptive_hist_vals(data) if adaptive else ()
        lv_r = self._adaptive_len_vals(data) if adaptive else ()
        step = lambda c, nv: self._device_rqc(c, jnp.int32(nv),
                                              slot_cap=slot_cap,
                                              hist_vals=hv_r,
                                              len_vals=lv_r)
        # row_bytes=K: chunks upload as u8[csize//K, K] so the device
        # buffer carries the (8,128) row tiling (ragged kernel 1.23 ->
        # 1.87 GB/s measured on v5e; same layout win as the uniform path)
        ing = OverlappedIngest(step, csize, row_bytes=K)
        fail_pos = None  # host takes over from this byte offset

        def consume(ready):
            nonlocal fail_pos
            for meta, r in ready:
                if fail_pos is not None:
                    continue
                pos_m, nv_m, last = meta
                tail = int(r.tail_start)
                good = bool(r.ok) and not bool(r.fallback) and tail > 0 \
                    and (tail == nv_m or last)
                if not good:
                    fail_pos = pos_m
                    continue
                acc.add(r.stats)
                if last and tail < nv_m:
                    # trailing partial record of the file: exact host tail
                    fail_pos = pos_m + tail

        pos = 0
        while pos < total and fail_pos is None:
            cut = min(pos + csize, total)
            if cut < total:
                # resync scans FORWARD, so probe from a little before the
                # capacity limit and take the first boundary it proves;
                # back off further for records longer than the window. A
                # cut past pos+csize cannot fit the staging buffer, and no
                # provable boundary punts the remainder to the host.
                back = 4096
                while True:
                    # probe only to a little past the capacity limit: the
                    # default 1 MB window would make the resync scan (pure
                    # Python) cost more than the chunk copy itself, on the
                    # host thread the overlap is supposed to keep free
                    cut = find_record_boundary_bytes(
                        data, max(pos + 1, pos + csize - back),
                        probe=back + 8192)
                    if cut <= pos + csize or back >= csize:
                        break
                    back *= 4
                if cut <= pos or cut > pos + csize:
                    break
            nv = cut - pos
            buf = ing.acquire()
            buf[:nv] = data[pos:cut]
            buf[nv:] = 0
            consume(ing.feed(buf, nv, meta=(pos, nv, cut >= total)))
            pos = cut
        consume(ing.drain())
        if fail_pos is not None:
            pos = fail_pos
        if pos < total:
            parser = FastqParser(MemoryReader(data[pos:]),
                                 config=ParserConfig())
            parser.quality_schema = self.schema
            self._host_consume(parser, acc)
        return self._report_from_acc(acc)

    def _device_uqc(self, lay, width, hist_vals=()):
        """Build the jitted device step for a layout: the one-pass fused
        parse+validate+QC (ops/uniform_qc.py) — the padded SoA is never
        materialized, ~41 GB/s/chip measured (2-D row-tiled chunks) vs
        16.7 for the two-stage uniform_parse + qc_stats it replaced.
        `hist_vals` (a host-peeked distinct-phred set) compiles the
        eq-mode Phred-histogram variant — the caller must re-run
        full-bins when the accumulated remainder bin is nonzero
        (_hist_overflows)."""
        from ..ops.uniform_qc import uniform_qc

        def uqc(c, n_valid):
            return uniform_qc(
                c, n_valid, rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3,
                width=width, q_lo=int(self.schema.LOWER),
                q_hi=int(self.schema.UPPER), offset=int(self.schema.OFFSET),
                check_ascii=self.check_ascii,
                check_quality=self.check_quality, hist_vals=hist_vals)

        return uqc

    def _adaptive_hist_vals(self, data, head_bytes=1 << 16) -> tuple:
        """Distinct phred values over the corpus head's quality lines
        (lines 4k+3 of the newline grouping — self-consistent while the
        head is well-formed), for the eq-mode histogram. Real corpora are
        quality-BINNED (NovaSeq: 4 distinct values), so the dominant
        device pass shrinks from ~41 reductions to a handful. Returns ()
        (= off) when not profitable or outside the eq-mode preconditions;
        a wrong peek is caught by the remainder bin and only costs one
        full-bin re-run (run_file_device), never exactness."""
        from ..ops.stats import MAX_PHRED

        off = int(self.schema.OFFSET)
        lo, hi = int(self.schema.LOWER), int(self.schema.UPPER)
        if not self.check_quality or lo < off:
            return ()
        n_bins_full = min(hi - off, MAX_PHRED - 1) + 1
        head = np.asarray(data[: min(len(data), head_bytes)])
        nl = np.flatnonzero(head == 10)
        k = len(nl) // 4
        if k < 1:
            return ()
        sep_nl = nl[2:4 * k:4]
        qual_nl = nl[3:4 * k:4]
        seen = np.zeros(256, bool)
        for s, e in zip(sep_nl, qual_nl):
            if e > s + 1:
                seen[np.unique(head[s + 1:e])] = True
        bytes_seen = np.flatnonzero(seen)
        if len(bytes_seen) == 0 or bytes_seen.min() < off:
            return ()
        vals = tuple(int(b) - off for b in bytes_seen)
        # profitable and room for the remainder bin
        if max(vals) + 1 >= n_bins_full or len(vals) + 2 >= n_bins_full:
            return ()
        self.__dict__.setdefault("_hist_his", set()).add(vals)
        return vals

    def _adaptive_len_vals(self, data, head_bytes=1 << 16) -> tuple:
        """Distinct (clipped) read lengths over the corpus head, for the
        ragged engine's eq-mode length histogram — real corpora hit a
        handful of lengths, vs LEN_BINS=512 one-hot compares over the
        slot structure. Same contract as _adaptive_hist_vals: a length
        the peek missed lands in the remainder bin and costs one full-bin
        re-run, never exactness."""
        from ..ops.stats import LEN_BINS

        head = np.asarray(data[: min(len(data), head_bytes)])
        nl = np.flatnonzero(head == 10)
        k = len(nl) // 4
        if k < 1:
            return ()
        lens = np.minimum(nl[1:4 * k:4] - nl[0:4 * k:4] - 1, LEN_BINS - 1)
        vals = np.unique(lens)
        if len(vals) == 0 or int(vals.max()) + 1 >= LEN_BINS \
                or len(vals) + 2 >= LEN_BINS:
            return ()
        vals = tuple(int(v) for v in vals)
        self.__dict__.setdefault("_len_his", set()).add(vals)
        return vals

    def _len_overflows(self, report, len_vals) -> bool:
        """True when a device chunk saw a read length OUTSIDE the eq-mode
        set (its count landed in the remainder bin at max+1)."""
        if not len_vals:
            return False
        return int(report.length_hist[max(len_vals) + 1]) != 0

    def _hist_overflows(self, report, hist_vals) -> bool:
        """True when a device chunk saw a phred value OUTSIDE the eq-mode
        set: its count landed in the remainder bin (max+1), so the report
        is NOT exact and the caller re-runs with full bins. (Host/ragged
        fallback legs use full bins and can legitimately populate that
        bin; a false positive costs a re-run, never exactness.)"""
        if not hist_vals or not self.check_quality:
            return False
        return int(report.qual_hist[max(hist_vals) + 1]) != 0

    def _host_consume(self, parser, acc) -> None:
        """Core-QC host loop: structure-only host parse, validation +
        stats on device (the run_reader division of labor)."""
        for pb in parser.padded_batches(self.batch_size,
                                        max_len=self.max_read_len,
                                        pad_records_to=self.batch_size):
            res = self._step(
                jnp.asarray(pb.seq), jnp.asarray(pb.qual),
                jnp.asarray(pb.lengths, dtype=jnp.int32),
                jnp.int32(pb.n_records),
                jnp.zeros(TPU_LANE, jnp.uint8),
                jnp.int32(self.schema.LOWER),
                jnp.int32(self.schema.UPPER),
                jnp.int32(self.schema.OFFSET))
            acc.add(res.stats)

    def _report_from_acc(self, acc) -> QCReport:
        if acc.total is None:
            from ..ops.stats import zero_stats

            acc.add(zero_stats(self.max_read_len, self.track_quartiles))
        t = acc.total
        return QCReport(
            reads=int(t.reads),
            bases=int(t.bases),
            error_reads=int(t.error_reads),
            gc_fraction=acc.gc_fraction(),
            mean_quality=acc.mean_quality(),
            base_counts=np.asarray(t.base_counts),
            per_position_mean_quality=acc.per_position_mean_quality(),
            qual_hist=np.asarray(t.qual_hist),
            nw_scores=None,
            length_hist=np.asarray(t.length_hist),
            gc_hist=np.asarray(t.gc_hist),
            mean_qual_hist=np.asarray(t.mean_qual_hist),
            per_pos_base_counts=np.asarray(t.per_pos_base_counts),
            per_pos_count=np.asarray(t.per_pos_count),
            **self._quartile_report(acc),
        )

    def _run_stream_device(self, path, chunk_mb: int,
                           parallelism: int) -> QCReport:
        """Pipeline B over a compressed stream: host decompresses (parallel
        inflate for gzip), decompressed bytes accumulate into rs-aligned
        chunks and feed the device uniform parser; any proof failure (or a
        non-uniform head) routes the remaining stream through the exact
        host engine."""
        from ..ops.uniform_parse import detect_uniform_layout

        reader = open_reader(path, parallelism=parallelism)
        acc = QCAccumulator()
        head = bytearray()
        scratch = bytearray(1 << 16)
        head_eof = False
        while len(head) < (1 << 16):
            n = reader.readinto(memoryview(scratch))
            if n == 0:
                head_eof = True
                break
            head += scratch[:n]
        lay = detect_uniform_layout(bytes(head))
        if lay is None or lay.rs > chunk_mb << 19:
            return self._run_ragged_stream(bytes(head), reader, chunk_mb,
                                           acc)
        csize = max((chunk_mb << 20) // lay.rs, 1) * lay.rs
        # a stream that ended within the head peek bounds the chunk too
        if head_eof:
            csize = max(min(csize, -(-len(head) // lay.rs) * lay.rs), lay.rs)
        uqc = self._device_uqc(lay, self.max_read_len)

        # Overlapped ingest over rotating staging buffers (SURVEY §7.3):
        # the host inflates into buffer k+1 while the device parses chunk k.
        # A chunk's tail (bytes past the last whole record) is copied into
        # the NEXT buffer's head, so each buffer's content is
        # `carry` duplicated bytes + fresh stream bytes — on a late template
        # failure the unconsumed stream is rebuilt from the failed chunk's
        # full content plus every later chunk's fresh part.
        from ..parallel.ingest import OverlappedIngest
        from collections import deque

        # keep_bytes: the failure path below reads delivered chunks' buffer
        # contents (stream reconstruction), so buffers must outlive delivery
        ing = OverlappedIngest(lambda c, nv: uqc(c, jnp.int32(nv)), csize,
                               keep_bytes=True, row_bytes=lay.rs)
        pending = deque()  # dispatch-ordered (buf, fill, carry) per chunk
        fail_parts = None  # bytes of the stream the device did not consume

        def consume(ready):
            nonlocal fail_parts
            for _meta, (ok, st) in ready:
                b, f, ci = pending.popleft()
                if fail_parts is not None:
                    continue
                if bool(ok):
                    acc.add(st)
                else:
                    # failed chunk contributes ALL its bytes (its carry-in
                    # was never consumed either); later in-flight chunks
                    # contribute only their fresh (non-duplicated) bytes
                    fail_parts = [bytes(b[:f])]
                    fail_parts += [bytes(pb[pci:pf])
                                   for pb, pf, pci in pending]
        buf = ing.acquire()
        fill = len(head)
        carry = 0  # head bytes are fresh stream bytes
        buf[:fill] = np.frombuffer(bytes(head), np.uint8)
        eof = head_eof
        while fail_parts is None:
            while fill < csize and not eof:
                n = reader.readinto(memoryview(buf.data)[fill:])
                if n == 0:
                    eof = True
                else:
                    fill += n
            n_valid = fill // lay.rs * lay.rs
            if n_valid == 0:
                break
            if fill < csize:
                buf[fill:] = 0
            pending.append((buf, fill, carry))
            consume(ing.feed(buf, n_valid))
            if fail_parts is not None:
                # this buffer was dispatched: it is in `pending`'s
                # reconstruction, not an undispatched remainder
                buf, fill, carry = None, 0, 0
                break
            rem = fill - n_valid
            if eof and rem == 0:
                buf, fill, carry = None, 0, 0
                break
            nbuf = ing.acquire()
            if rem:
                # reading the in-flight buffer is safe; only writes race
                nbuf[:rem] = buf[n_valid:fill]
            buf, fill, carry = nbuf, rem, rem
        consume(ing.drain())
        if fail_parts is not None:
            # current (undispatched) buffer holds fresh bytes past `carry`
            if buf is not None and fill > carry:
                fail_parts.append(bytes(buf[carry:fill]))
            leftover = b"".join(fail_parts)
            # head looked uniform but the stream is not (or bytes are
            # invalid): the general ragged device engine takes the rest —
            # it starts at a proven record boundary (accepted chunks end on
            # one) and itself drops to the exact host engine when out of
            # tier or on truly invalid bytes.
            return self._run_ragged_stream(
                b"", _ChainedReader(leftover, reader), chunk_mb, acc)
        leftover = bytes(buf[:fill]) if buf is not None and fill else b""
        if leftover or not eof:
            parser = FastqParser(
                _ChainedReader(leftover, reader),
                config=ParserConfig())
            parser.quality_schema = self.schema
            self._host_consume(parser, acc)
        return self._report_from_acc(acc)

    def _run_ragged_stream(self, head: bytes, reader, chunk_mb: int,
                           acc) -> QCReport:
        """General-tier device parse over a decompressed stream: chunks
        accumulate host-side, the device parses/validates/QCs each and
        reports its trailing partial record, which is carried into the next
        fill. Any out-of-tier layout or validation failure chains the
        unconsumed bytes back into the exact host engine."""
        K = 2 * self.max_read_len
        csize = max((chunk_mb << 20) // K, 1) * K
        slot_cap = None  # sized from the first filled buffer below
        buf = np.zeros(csize, dtype=np.uint8)
        fill = len(head)
        if fill > csize:  # enormous max_read_len vs tiny chunk_mb: host
            parser = FastqParser(_ChainedReader(head, reader),
                                 config=ParserConfig())
            parser.quality_schema = self.schema
            self._host_consume(parser, acc)
            return self._report_from_acc(acc)
        buf[:fill] = np.frombuffer(head, np.uint8)
        eof = False
        stop = False
        first = True
        while True:
            while fill < csize and not eof:
                n = reader.readinto(memoryview(buf.data)[fill:])
                if n == 0:
                    eof = True
                else:
                    fill += n
            if fill == 0:
                break
            if first and eof and fill < csize:
                # whole stream fits in one chunk: shrink it so a tiny
                # corpus never pays for a full chunk_mb of zero padding
                # (one compile either way — the size is seen once)
                csize = max(-(-fill // K) * K, K)
                buf = np.ascontiguousarray(buf[:csize])
            first = False
            if fill < csize:
                buf[fill:] = 0
            if slot_cap is None:
                slot_cap = self._peek_ragged_slot_cap(buf[:fill],
                                                      self.max_read_len)
            r = self._device_rqc(jnp.asarray(buf.reshape(-1, K)),
                                 jnp.int32(fill), slot_cap=slot_cap)
            tail = int(r.tail_start)
            if bool(r.fallback) or not bool(r.ok) or tail == 0:
                stop = True
                break
            acc.add(r.stats)
            rem = fill - tail
            if rem:
                buf[:rem] = buf[tail:fill]
            fill = rem
            if eof and fill == 0:
                break
        if fill or not eof or stop:
            parser = FastqParser(_ChainedReader(bytes(buf[:fill]), reader),
                                 config=ParserConfig())
            parser.quality_schema = self.schema
            self._host_consume(parser, acc)
        return self._report_from_acc(acc)

    def run_reader(self, reader) -> QCReport:
        parser = FastqParser(reader, config=ParserConfig())
        parser.quality_schema = self.schema
        return self.run_parser(parser)

    def run_parser(self, parser: FastqParser) -> QCReport:
        import jax

        if self._auto_schema:
            raise ValueError(
                "quality_schema='auto' needs a path-based entry point "
                "(run_file / run_file_device): a stream cannot be peeked "
                "twice")
        acc = QCAccumulator()
        all_scores = [] if self.align_to is not None else None
        ref = (jnp.asarray(np.frombuffer(self.align_to, dtype=np.uint8))
               if self.align_to is not None
               else jnp.zeros(TPU_LANE, jnp.uint8))
        pad_n = self.batch_size
        if self.mesh is not None:
            pad_n = _round_up(pad_n, self.mesh.size)
        # device-resident running total, flushed to the host int64 accumulator
        # every _FLUSH_EVERY batches (keeps int32 leaves far from overflow and
        # minimizes device->host pulls)
        _FLUSH_EVERY = 64
        dev_total = None
        pending = 0
        merge = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
        # adapter scans run as a separate jitted pass over the same
        # device-resident batch (full rows; not part of the sharded step)
        ad_totals = ({a: None for a in self.adapters}
                     if self.adapters else None)
        dup_hashes = [] if self.track_duplicates else None
        dup_prefixes = [] if self.track_duplicates else None
        dup_seen = 0
        for pb in parser.padded_batches(self.batch_size,
                                        max_len=self.max_read_len,
                                        pad_records_to=pad_n):
            res = self._step(
                jnp.asarray(pb.seq), jnp.asarray(pb.qual),
                jnp.asarray(pb.lengths, dtype=jnp.int32),
                jnp.int32(pb.n_records), ref,
                jnp.int32(self.schema.LOWER), jnp.int32(self.schema.UPPER),
                jnp.int32(self.schema.OFFSET))
            dev_total = res.stats if dev_total is None else merge(
                dev_total, res.stats)
            pending += 1
            if pending >= _FLUSH_EVERY:
                acc.add(dev_total)
                dev_total = None
                pending = 0
            if all_scores is not None:
                all_scores.append(np.asarray(res.nw_scores)[: pb.n_records])
            if ad_totals is not None:
                from ..ops.adapter import adapter_content

                for a in self.adapters:
                    ast = adapter_content(
                        jnp.asarray(pb.seq),
                        jnp.asarray(pb.lengths, dtype=jnp.int32),
                        jnp.int32(pb.n_records), adapter_host=a)
                    ad_totals[a] = (ast if ad_totals[a] is None
                                    else merge(ad_totals[a], ast))
            if dup_hashes is not None and dup_seen < self.dup_track_limit:
                from ..ops.dedup import read_hashes

                take = min(pb.n_records, self.dup_track_limit - dup_seen)
                h = np.asarray(read_hashes(
                    jnp.asarray(pb.seq),
                    jnp.asarray(pb.lengths, dtype=jnp.int32),
                    jnp.int32(pb.n_records)))[:take]
                dup_hashes.append(h)
                # 50bp representative prefixes for the overrepresented list
                # (pb.seq is host numpy — this copy is free of device traffic)
                dup_prefixes.append(
                    np.array(pb.seq[:take, : min(50, pb.seq.shape[1])]))
                dup_seen += take
        if dev_total is not None:
            acc.add(dev_total)
        if acc.total is None:
            from ..ops.stats import zero_stats

            acc.add(zero_stats(self.max_read_len, self.track_quartiles))
        t = acc.total
        return QCReport(
            reads=int(t.reads),
            bases=int(t.bases),
            error_reads=int(t.error_reads),
            gc_fraction=acc.gc_fraction(),
            mean_quality=acc.mean_quality(),
            base_counts=np.asarray(t.base_counts),
            per_position_mean_quality=acc.per_position_mean_quality(),
            qual_hist=np.asarray(t.qual_hist),
            nw_scores=(np.concatenate(all_scores) if all_scores else None),
            length_hist=np.asarray(t.length_hist),
            gc_hist=np.asarray(t.gc_hist),
            mean_qual_hist=np.asarray(t.mean_qual_hist),
            per_pos_base_counts=np.asarray(t.per_pos_base_counts),
            per_pos_count=np.asarray(t.per_pos_count),
            **self._quartile_report(acc),
            adapter_stats=(
                {a: jax.tree.map(lambda x: np.asarray(x, np.int64), s)
                 for a, s in ad_totals.items() if s is not None}
                if ad_totals is not None else None),
            **(self._dup_report(dup_hashes, dup_prefixes)
               if dup_hashes is not None else {}),
        )

    def _quartile_report(self, acc) -> dict:
        """quality_quartiles / per_pos_qual_hist report fields (empty dict
        when the distribution was not tracked)."""
        t = acc.total
        if t is None or t.per_pos_qual_hist is None:
            return {}
        return dict(
            quality_quartiles=acc.per_position_quality_quartiles(),
            per_pos_qual_hist=np.asarray(t.per_pos_qual_hist))

    @staticmethod
    def _dup_report(dup_hashes, dup_prefixes) -> dict:
        from ..ops.dedup import duplication_levels, overrepresented_sequences

        h = (np.concatenate(dup_hashes)
             if dup_hashes else np.empty((0, 2), np.uint32))
        pfx = (np.concatenate(dup_prefixes)
               if dup_prefixes else np.empty((0, 0), np.uint8))
        levels, frac_unique = duplication_levels(h)
        return dict(duplication_levels=levels, frac_unique_reads=frac_unique,
                    overrepresented=overrepresented_sequences(h, pfx))
