"""blazeseq_tpu — a TPU-native FASTX ingestion-and-analysis engine.

A from-scratch reimplementation of the capabilities of BlazeSeq
(MoSafi2/BlazeSeq, a Mojo SIMD FASTQ/FASTA parsing library), re-designed
TPU-first:

* Host layer: byte sources (file / memory / gzip / parallel-gzip), a
  chunk-vectorized FASTQ parser whose hot loop runs in a native C++ bulk
  scanner (blazeseq_tpu/native), and streaming FASTA/FAI/BED/GFF3/GTF parsers.
* Device layer (jax/XLA/Pallas): Structure-of-Arrays read batches in HBM,
  fused validation + Phred decode + QC-stats kernels, on-device structural
  byte scanning, and a batched Needleman-Wunsch wavefront aligner.
* Scale-out: data-parallel sharding of read batches over a
  `jax.sharding.Mesh` with psum-merged QC statistics.

Public API surface mirrors the reference (blazeseq/__init__.mojo:30-40):
parsers expose `views()` / `records()` / `batches()`.
"""

from .constants import DEFAULT_BATCH_SIZE, DEFAULT_CAPACITY, EOF
from .errors import (
    FastxEOFError,
    FastxError,
    FastxErrorCode,
    ParseContext,
    ParseError,
    ValidationError,
)
from .bed.parser import BedParser, BedWriter
from .bed.record import BedRecord, BedView, ItemRgb, Strand
from .fai.parser import FaiParser, IndexedFasta, build_fai, write_fai
from .fai.record import FaiRecord, FaiView
from .fasta.parser import FastaBatch, FastaParser, FastaParserConfig
from .fasta.record import FastaRecord
from .fastq.batch import DeviceFastqBatch, FastqBatch, PaddedFastqBatch, upload_batch_to_device
from .fastq.index import (FastqIndex, IndexedFastq,
                          build_fqi, read_fqi, write_fqi)
from .fastq.paired import (InterleavedFastqParser,
                           PairedFastqParser, PairSyncError)
from .fastq.parser import FastqParser, ParserConfig
from .fastq.quality import (QualitySchema,
                            detect_quality_schema,
                            detect_quality_schema_file,
                            parse_schema)
from .fastq.record import Definition, FastqRecord, FastqView, Validator
from .features.ranges import Interval, Position
from .gff.attributes import Gff3Attributes, parse_gff3_attributes
from .gff.parser import Gff3Parser
from .gff.record import Gff3Record, Gff3Strand, SequenceRegion
from .gtf.attributes import GtfAttributes, parse_gtf_attributes
from .gtf.parser import GtfParser, GtfRecord
from .io.buffered import ByteStream, LineIterator, LineIteratorError
from .io.delimited import (
    DefaultLinePolicy,
    DelimitedReader,
    DelimitedRecord,
    DelimitedView,
    LineAction,
)
from .io.readers import (
    BgzfReader,
    FileReader,
    MmapReader,
    GZFile,
    MemoryReader,
    ParallelGzipReader,
    RapidgzipReader,
    open_reader,
    scan_bgzf_blocks,
)
from .io.writers import (
    BGZFWriter,
    BufferedWriter,
    FileWriter,
    GZWriter,
    MemoryWriter,
    buffered_writer_for_file,
    buffered_writer_for_gzip,
    buffered_writer_for_memory,
)
from .utils import (
    compute_num_fasta_reads_for_size,
    compute_num_reads_for_size,
    generate_synthetic_fasta_buffer,
    generate_synthetic_fastq_buffer,
    generate_synthetic_fastq_to_writer,
    generate_variable_id_fastq_buffer,
)

__version__ = "0.7.0"


def parser(path, quality_schema: str = "generic", parallelism: int = 4,
           validate: bool = False, batch_size: int = DEFAULT_BATCH_SIZE):
    """Ergonomic entry point mirroring the reference Python binding
    (python/blazeseq/__init__.py:267-289): dispatches on file suffix to a
    plain or parallel-gzip source. quality_schema="auto" infers the Phred
    encoding from the file head (detect_quality_schema_file; beyond
    reference)."""
    from .fastq.parser import FastqParser, ParserConfig

    if quality_schema == "auto":
        from .fastq.quality import detect_quality_schema_file, schema_key

        quality_schema = schema_key(detect_quality_schema_file(path))
    cfg = ParserConfig(check_ascii=validate, check_quality=validate,
                       quality_schema=quality_schema)
    return FastqParser(open_reader(path, parallelism=parallelism),
                       batch_size=batch_size, config=cfg)


# Lazy imports for heavier / jax-dependent subpackages.
def __getattr__(name):
    # NOTE: must go through importlib — a `from . import X` here re-enters
    # this __getattr__ via _handle_fromlist and recurses forever.
    if name in ("ops", "parallel", "models"):
        import importlib

        return importlib.import_module("." + name, __name__)
    raise AttributeError(name)
