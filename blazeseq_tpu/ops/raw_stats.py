"""Raw-stream device QC: global statistics straight from FASTQ bytes in HBM.

The padded-SoA pipeline needs a host gather; TPUs hate ragged byte gathers
(see docs/roadmap.md). But GLOBAL statistics never needed the gather at all:
every byte's role is determined by its line phase — (number of newlines
before it) mod 4 — so one uint8 cumsum (mod-4-safe because 256 ≡ 0 mod 4)
plus masked dense reductions computes reads, bases, base composition, GC,
the Phred histogram, mean quality, and structure/validation checks at HBM
bandwidth with zero scatter/gather (scatters serialize on TPU — the
histogram is 64 masked sums, which XLA fuses into a handful of passes).
This is the reference's views-mode counting
(benchmark/fastq-parser/run_blazeseq.mojo:21-60) and Validator
(record.mojo:77-148) recast as dense tensor algebra.

Line phases (for a well-formed stream starting at a record boundary):
  0 header ('@...'), 1 sequence, 2 separator ('+...'), 3 quality.

The device checks structure globally (every phase-0 line starts with '@',
every phase-2 line with '+', total seq bytes == total qual bytes) and
returns error FLAGS; exact per-record error context comes from the host
rescan path, same contract as the host count() fast path.

Only complete records count: bytes after the last phase-3 newline are
reported via `tail_start` so the caller re-feeds them with the next chunk.
Counters are int32: feed chunks of < 2 GB and accumulate across chunks on
the host (Python ints), which the streaming callers do anyway.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEWLINE = 10
AT = 64
PLUS = 43


class RawStreamQC(NamedTuple):
    reads: jnp.ndarray          # i32[] complete records
    bases: jnp.ndarray          # i32[] sequence bytes in complete records
    base_counts: jnp.ndarray    # i32[5] A C G T other (complete records)
    qual_hist: jnp.ndarray      # i32[max_phred] Phred histogram
    bad_structure: jnp.ndarray  # bool[] any '@'/'+' line-start violation
    seq_qual_mismatch: jnp.ndarray  # bool[] total seq != total qual bytes
    bad_ascii: jnp.ndarray      # bool[] high bit anywhere in the chunk
    bad_quality: jnp.ndarray    # bool[] quality byte out of schema range
    tail_start: jnp.ndarray     # i32[] offset of the trailing partial record

    def mean_q_sum(self) -> int:
        """Exact sum of decoded Phred scores, derived host-side from the
        histogram (an in-graph int32 sum would overflow at ~60 MB of quality
        data; the per-bin counts themselves stay < 2^31 for < 2 GB chunks)."""
        import numpy as np

        hist = np.asarray(self.qual_hist, dtype=np.int64)
        return int((np.arange(len(hist), dtype=np.int64) * hist).sum())


@functools.partial(jax.jit, static_argnames=("max_phred",))
def raw_stream_qc(chunk: jnp.ndarray, q_lower, q_upper, offset,
                  max_phred: int = 64) -> RawStreamQC:
    """chunk: uint8[n] starting at a record boundary. Scalars: quality
    schema LOWER/UPPER/OFFSET (i32)."""
    n = chunk.shape[0]
    if n == 0:  # static-shape branch: empty shard/chunk -> zero stats
        z = jnp.int32(0)
        f = jnp.asarray(False)
        return RawStreamQC(z, z, jnp.zeros(5, jnp.int32),
                           jnp.zeros(max_phred, jnp.int32), f, f, f, f, z)
    nl = chunk == NEWLINE
    nl_u8 = nl.astype(jnp.uint8)
    incl = jnp.cumsum(nl_u8, dtype=jnp.uint8)  # inclusive newline count & 0xFF
    # phase of byte i = (# newlines BEFORE i) mod 4; uint8 wrap is exact
    # because 256 ≡ 0 (mod 4)
    phase = (incl - nl_u8) & jnp.uint8(3)

    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # a newline whose inclusive count ≡ 0 (mod 4) ends a record; the tail
    # starts one past the last of them (no i32 cumsum / search needed)
    rec_end = nl & ((incl & jnp.uint8(3)) == 0)
    tail_start = jnp.max(jnp.where(rec_end, idx + 1, 0), initial=0)
    reads = jnp.sum(rec_end, dtype=jnp.int32)
    complete = idx < tail_start

    seq_m = (phase == 1) & (~nl) & complete
    qual_m = (phase == 3) & (~nl) & complete

    # base composition, case-insensitive (A C G T other)
    upper = chunk & jnp.uint8(0xDF)
    counts = [jnp.sum(seq_m & (upper == jnp.uint8(b)), dtype=jnp.int32)
              for b in b"ACGT"]
    bases = jnp.sum(seq_m, dtype=jnp.int32)
    base_counts = jnp.stack(counts + [bases - sum(counts)])

    # quality histogram + mean, offset-decoded and clamped into max_phred.
    # All byte math stays uint8 — i32 expansion would 4x the memory traffic
    # of every pass (offset/bounds are < 256 by schema construction).
    off_u8 = offset.astype(jnp.uint8)
    phred = jnp.minimum(
        jnp.where(chunk < off_u8, jnp.uint8(0), chunk - off_u8),
        jnp.uint8(max_phred - 1))
    qual_hist = jnp.stack([
        jnp.sum(qual_m & (phred == jnp.uint8(k)), dtype=jnp.int32)
        for k in range(max_phred)
    ])

    # structure: a line START is position 0 or any position after a newline;
    # phase-0 starts must be '@', phase-2 starts must be '+'
    prev_nl = jnp.concatenate([jnp.ones(1, dtype=bool), nl[:-1]])
    start_m = prev_nl & complete
    bad_at = jnp.any(start_m & (phase == 0) & (chunk != AT))
    bad_plus = jnp.any(start_m & (phase == 2) & (chunk != PLUS))
    bad_structure = bad_at | bad_plus
    seq_qual_mismatch = bases != jnp.sum(qual_m, dtype=jnp.int32)

    bad_ascii = jnp.any((chunk & jnp.uint8(0x80)) > 0)
    lo_u8 = q_lower.astype(jnp.uint8)
    hi_u8 = q_upper.astype(jnp.uint8)
    bad_quality = jnp.any(qual_m & ((chunk < lo_u8) | (chunk > hi_u8)))

    return RawStreamQC(reads, bases, base_counts, qual_hist,
                       bad_structure, seq_qual_mismatch, bad_ascii,
                       bad_quality, tail_start)
