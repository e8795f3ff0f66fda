"""Barcode demultiplexing on device (beyond the reference's scope).

Assigns each read of a padded batch to the best-matching barcode by
Hamming distance over the read's 5' prefix — the standard single-index
demultiplexing step (bcl2fastq/`demuxFQ` semantics): a read is assigned
when exactly one barcode is within `max_mismatches`; ties and misses go to
"unassigned" (-1).

TPU shape: one dense compare [n, K, BL] (K barcodes are few dozen, BL <=
16), reduced to mismatch counts on the VPU — no gathers, no scatters.
'N' in a BARCODE matches any base (IUPAC single-wildcard, the common
sample-sheet convention); 'N' in a READ mismatches everything except a
barcode 'N'.

Host twin: `demux_assign_host` (pure Python) — the validation reference.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_BYTE = ord("N")


def _prep_barcodes(barcodes: Sequence[bytes]):
    bl = len(barcodes[0])
    if any(len(b) != bl for b in barcodes):
        raise ValueError("all barcodes must share one length")
    arr = np.frombuffer(b"".join(bytes(b).upper() for b in barcodes),
                        dtype=np.uint8).reshape(len(barcodes), bl)
    return arr, bl


@jax.jit
def _assign(seq_prefix, codes, lengths, max_mm):
    """seq_prefix u8[n, BL], codes u8[K, BL] -> (assign i32[n], mm i32[n])."""
    up = seq_prefix & jnp.uint8(0xDF)  # case-insensitive reads
    codes_b = codes[None, :, :]  # [1, K, BL]
    reads_b = up[:, None, :]     # [n, 1, BL]
    wild = codes_b == jnp.uint8(N_BYTE)
    mism = (reads_b != codes_b) & ~wild
    mm = jnp.sum(mism, axis=2, dtype=jnp.int32)  # [n, K]
    # reads shorter than the barcode can never match
    too_short = lengths[:, None] < codes.shape[1]
    mm = jnp.where(too_short, jnp.int32(codes.shape[1] + 1), mm)
    best = jnp.min(mm, axis=1)
    best_k = jnp.argmin(mm, axis=1).astype(jnp.int32)
    n_best = jnp.sum(mm == best[:, None], axis=1, dtype=jnp.int32)
    ok = (best <= max_mm) & (n_best == 1)
    return jnp.where(ok, best_k, jnp.int32(-1)), best


def demux_assign(seq, lengths, barcodes: Sequence[bytes],
                 max_mismatches: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign padded reads [n, L] to barcodes.

    Returns (assignments i32[n] with -1 = unassigned/ambiguous,
    best_mismatches i32[n])."""
    codes_np, bl = _prep_barcodes(barcodes)
    seq = jnp.asarray(seq)
    if seq.shape[1] < bl:
        raise ValueError("reads narrower than the barcode length")
    return _assign(seq[:, :bl], jnp.asarray(codes_np),
                   jnp.asarray(lengths, dtype=jnp.int32),
                   jnp.int32(max_mismatches))


def demux_assign_host(seqs: List[bytes], barcodes: Sequence[bytes],
                      max_mismatches: int = 1) -> List[int]:
    """Scalar host twin with identical semantics (validation reference)."""
    out = []
    bl = len(barcodes[0])
    codes = [bytes(b).upper() for b in barcodes]
    for s in seqs:
        s = bytes(s).upper()
        if len(s) < bl:
            out.append(-1)
            continue
        mms = []
        for c in codes:
            mm = sum(1 for x, y in zip(s[:bl], c)
                     if y != N_BYTE and x != y)
            mms.append(mm)
        best = min(mms)
        if best <= max_mismatches and mms.count(best) == 1:
            out.append(mms.index(best))
        else:
            out.append(-1)
    return out


def demultiplex_counts(assignments, n_barcodes: int) -> jnp.ndarray:
    """Per-sample read counts (last bin = unassigned), scatter-free."""
    a = jnp.asarray(assignments)
    bins = jnp.arange(-1, n_barcodes, dtype=jnp.int32)
    counts = jnp.sum(a[:, None] == bins[None, :], axis=0, dtype=jnp.int32)
    return jnp.concatenate([counts[1:], counts[:1]])  # samples..., unassigned


def demultiplex_to_writers(parser, barcodes: Sequence[bytes], writers,
                           unassigned_writer=None, max_mismatches: int = 1,
                           batch_records: int = 16384, max_len: int = 256,
                           trim_barcode: bool = False):
    """Stream a FASTQ parser through device assignment and write each read
    to its sample's writer (host IO; assignment on device). Returns the
    per-sample counts list (+ unassigned last)."""
    if len(writers) != len(barcodes):
        raise ValueError("one writer per barcode required")
    from .. import native

    codes_np, bl = _prep_barcodes(barcodes)
    totals = [0] * (len(barcodes) + 1)
    for batch in parser.batches(batch_records):
        pb = batch.to_padded(max_len=max_len)
        assign, _ = demux_assign(pb.seq, pb.lengths, barcodes,
                                 max_mismatches)
        a = np.asarray(assign)[: pb.n_records]
        batch._finalize()
        ends = batch._ends
        starts = np.concatenate(([0], ends[:-1]))
        lens = ends - starts
        id_ends = batch._id_ends
        id_starts = np.concatenate(([0], id_ends[:-1]))
        id_lens = id_ends - id_starts
        # bulk write per sample: one native serialization pass per group
        # (order within a sample's file is preserved — masks keep batch
        # order — and inter-sample order is irrelevant across files)
        for k in range(-1, len(barcodes)):
            m = a == k
            cnt = int(m.sum())
            if cnt == 0:
                continue
            totals[k] += cnt  # k == -1 lands on the unassigned slot
            w = unassigned_writer if k < 0 else writers[k]
            if w is None:
                continue
            offs_k = starts[m]
            lens_k = lens[m]
            if k >= 0 and trim_barcode:
                offs_k = offs_k + bl
                lens_k = np.maximum(lens_k - bl, 0)
                if (lens_k == 0).any():
                    # a read exactly the barcode's length trims to an
                    # empty record, which the bulk serializer drops —
                    # keep the historical "@id\n\n+\n\n" output
                    from ..fastq.record import FastqRecord

                    for i in np.flatnonzero(m):
                        rec = batch.get_record(int(i))
                        FastqRecord(rec.id_bytes(),
                                    rec.sequence_bytes()[bl:],
                                    rec.quality_bytes()[bl:],
                                    phred_offset=rec._phred_offset).write(w)
                    continue
            w.write_bytes(native.serialize_fastq(
                batch._id_bytes, id_starts[m], id_lens[m],
                batch._sequence_bytes, batch._quality_bytes,
                offs_k, lens_k))
    return totals
