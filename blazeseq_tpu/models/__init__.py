"""End-to-end pipelines ("models"): streaming QC and batched alignment."""

from .aligner import NWAligner
from .qc import QCModel, QCReport
