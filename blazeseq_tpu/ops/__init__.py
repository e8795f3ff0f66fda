"""Device kernels (jax/XLA/Pallas): validation, decoding, QC stats,
structural scanning, and Needleman-Wunsch alignment."""

from .adapter import AdapterStats, adapter_content, adapter_content_cpu
from .dedup import (duplication_levels, overrepresented_sequences,
                    read_hashes, read_hashes_cpu)
from .demux import (demultiplex_counts, demultiplex_to_writers, demux_assign,
                    demux_assign_host)
from .merge import MergeResult, merge_pairs, merge_pairs_host
from .tiles import (PerTileAccumulator, parse_illumina_tiles,
                    per_tile_qual_sums)
from .uniform_parse import (UniformLayout, UniformParseResult,
                            detect_uniform_layout, uniform_parse)
from .kmer import kmer_counts, kmer_counts_cpu
from .common import length_mask, round_up, use_interpret
from .nw import (needleman_wunsch_affine_cpu, needleman_wunsch_cpu,
                 nw_affine_scores_xla, nw_scores, nw_scores_pallas,
                 nw_scores_xla, nw_semiglobal_affine_scores_xla,
                 nw_semiglobal_scores_xla, semiglobal_affine_cpu,
                 semiglobal_cpu, smith_waterman_affine_cpu,
                 smith_waterman_cpu, sw_affine_scores_xla, sw_scores_xla)
from .scan import (
    count_records_device,
    gather_padded_device,
    newline_positions_device,
    parse_fastq_device,
    record_offsets_device,
    structural_bitmaps,
)
from .ragged_qc import RaggedQC, ragged_qc
from .raw_stats import RawStreamQC, raw_stream_qc
from .trim import (bwa_trim, bwa_trim_cpu, clip_ends, clip_ends_cpu,
                   sliding_window_trim, sliding_window_trim_cpu)
from .stats import (GC_BINS, LEN_BINS, MAX_PHRED, QCAccumulator, QCStats,
                    qc_stats, row_histograms, row_partials, zero_stats)
from .validate import validate_decode, validate_decode_pallas, validate_decode_xla
