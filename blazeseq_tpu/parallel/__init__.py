"""Multi-device scale-out: meshes, shardings, and the SPMD analysis pipeline."""

from .feed import parallel_count, parallel_padded_batches
from .mesh import DP_AXIS, batch_sharding, make_mesh, replicated, shard_batch
from .multihost import init_distributed, run_multihost_qc
from .pipeline import (QCAlignResult, build_qc_align_step,
                       build_ragged_qc_step, build_uniform_qc_step,
                       run_qc_align)
from .sharding import RangeReader, find_record_boundary, open_shard, shard_file
