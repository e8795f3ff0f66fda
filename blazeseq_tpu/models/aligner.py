"""NWAligner — batched global alignment of reads against a reference.

Model-level wrapper over the wavefront NW kernels (blazeseq_tpu/ops/nw.py),
mirroring the reference GPU example end-to-end flow
(examples/nw_gpu/execution.mojo:90-152): SoA batches -> device -> batched DP
-> scores -> optional CPU-twin verification (main.mojo:72-87 asserts
GPU == CPU scores; `verify_batch` is that check). mode="local" swaps the
recurrence for Smith-Waterman (beyond reference)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fastq.batch import FastqBatch, PaddedFastqBatch
from ..ops import nw as nw_ops

MAX_QUERY_LEN = 256  # reference clamp (examples/nw_gpu/kernels.mojo:15-16)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class NWAligner:
    def __init__(self, reference: bytes, max_query_len: int = MAX_QUERY_LEN,
                 prefer_pallas: Optional[bool] = None,
                 mode: str = "global",
                 gap_open: Optional[int] = None, gap_extend: int = -1):
        """mode="global" is the reference semantics (Needleman-Wunsch);
        mode="local" is Smith-Waterman on the same wavefront (beyond
        reference) — scores are the best zero-clamped local hit.
        mode="semiglobal" aligns the full query with free leading/trailing
        reference gaps (read-vs-reference-window scoring, beyond
        reference).

        gap_open=None (default) keeps the reference's linear gap model
        (every gapped base costs -1). Passing gap_open (e.g. -3) switches
        both modes to AFFINE gaps (Gotoh, beyond reference): a length-k
        gap costs gap_open + (k-1)*gap_extend, penalties negative."""
        if mode not in ("global", "local", "semiglobal"):
            raise ValueError(
                "mode must be 'global', 'local', or 'semiglobal'")
        self.reference = bytes(reference)
        self._ref = jnp.asarray(np.frombuffer(self.reference, dtype=np.uint8))
        self.max_query_len = max_query_len
        self.prefer_pallas = prefer_pallas
        self.mode = mode
        self.gap_open = gap_open
        self.gap_extend = gap_extend
        # The whole step (clamp + slice + wavefront DP) is one jit so
        # per-batch scoring is one device dispatch, not a chain of eager ops
        # (each eager op is a host round trip — catastrophic on
        # remote-attached devices). jax.jit caches one executable per input
        # shape; the Python-level slice branch resolves at trace time.
        mql = max_query_len

        @jax.jit
        def _step(seq, lengths, ref):
            lengths = jnp.minimum(lengths.astype(jnp.int32), mql)
            if seq.shape[1] > mql:
                seq = seq[:, :mql]
            # a row narrower than a true read length (caller-clamped
            # padding) must score its clamped prefix, not miss the
            # extraction lane and return the NEG sentinel
            lengths = jnp.minimum(lengths, seq.shape[1])
            if self.gap_open is not None:
                fn = {"local": nw_ops.sw_affine_scores_xla,
                      "semiglobal": nw_ops.nw_semiglobal_affine_scores_xla,
                      "global": nw_ops.nw_affine_scores_xla}[self.mode]
                return fn(seq, lengths, ref, gap_open=self.gap_open,
                          gap_extend=self.gap_extend)
            if self.mode == "local":
                return nw_ops.sw_scores_xla(seq, lengths, ref)
            if self.mode == "semiglobal":
                return nw_ops.nw_semiglobal_scores_xla(seq, lengths, ref)
            return nw_ops.nw_scores(seq, lengths, ref,
                                    prefer_pallas=self.prefer_pallas)

        self._step = _step

    def score_padded(self, pb: PaddedFastqBatch) -> np.ndarray:
        scores = self._step(jnp.asarray(pb.seq), jnp.asarray(pb.lengths),
                            self._ref)
        return np.asarray(scores)[: pb.n_records]

    def score_batch(self, batch: FastqBatch) -> np.ndarray:
        # width sized to the batch (lane-rounded by to_padded); _step
        # slices columns down to max_query_len and clamps lengths to the
        # same bound. A fixed min(max_query_len, TPU_LANE) cap used to
        # leave reads of 129..max_query_len bp with NO extraction lane —
        # their "score" was the NEG init sentinel.
        pb = batch.to_padded()
        return self.score_padded(pb)

    def score_cpu(self, batch: FastqBatch) -> np.ndarray:
        """Host twin (≡ run_cpu_nw, execution.mojo:137-152)."""
        if self.gap_open is not None:
            base = {"local": nw_ops.smith_waterman_affine_cpu,
                    "semiglobal": nw_ops.semiglobal_affine_cpu,
                    "global": nw_ops.needleman_wunsch_affine_cpu}[self.mode]
            twin = lambda q, r: base(q, r, gap_open=self.gap_open,
                                     gap_extend=self.gap_extend)
        else:
            twin = {"local": nw_ops.smith_waterman_cpu,
                    "semiglobal": nw_ops.semiglobal_cpu,
                    "global": nw_ops.needleman_wunsch_cpu}[self.mode]
        out = np.empty(len(batch), dtype=np.int32)
        for i in range(len(batch)):
            q = batch.get_ref(i).sequence_bytes()[: self.max_query_len]
            out[i] = twin(q, self.reference)
        return out

    def verify_batch(self, batch: FastqBatch) -> bool:
        """Device-vs-CPU score equality (≡ main.mojo:72-87)."""
        return bool(np.array_equal(self.score_batch(batch),
                                   self.score_cpu(batch)))
