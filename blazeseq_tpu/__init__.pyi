"""Typing stub for the blazeseq_tpu public surface.

Parity component for the reference binding stub
(python/blazeseq/__init__.pyi): the package itself is inline-annotated
(PEP 561 ``py.typed``); this stub pins the *top-level* re-export surface so
`from blazeseq_tpu import X` stays checkable even though the runtime
``__init__`` uses lazy ``__getattr__`` for the jax-dependent subpackages.
tests/test_typing_stub.py asserts this file and the runtime exports agree.
"""

from types import ModuleType
from typing import Any

from .bed.parser import BedParser as BedParser, BedWriter as BedWriter
from .bed.record import (
    BedRecord as BedRecord,
    BedView as BedView,
    ItemRgb as ItemRgb,
    Strand as Strand,
)
from .constants import (
    DEFAULT_BATCH_SIZE as DEFAULT_BATCH_SIZE,
    DEFAULT_CAPACITY as DEFAULT_CAPACITY,
    EOF as EOF,
)
from .errors import (
    FastxEOFError as FastxEOFError,
    FastxError as FastxError,
    FastxErrorCode as FastxErrorCode,
    ParseContext as ParseContext,
    ParseError as ParseError,
    ValidationError as ValidationError,
)
from .fai.parser import (
    FaiParser as FaiParser,
    IndexedFasta as IndexedFasta,
    build_fai as build_fai,
    write_fai as write_fai,
)
from .fai.record import FaiRecord as FaiRecord, FaiView as FaiView
from .fasta.parser import (
    FastaBatch as FastaBatch,
    FastaParser as FastaParser,
    FastaParserConfig as FastaParserConfig,
)
from .fasta.record import FastaRecord as FastaRecord
from .fastq.batch import (
    DeviceFastqBatch as DeviceFastqBatch,
    FastqBatch as FastqBatch,
    PaddedFastqBatch as PaddedFastqBatch,
    upload_batch_to_device as upload_batch_to_device,
)
from .fastq.index import (
    FastqIndex as FastqIndex,
    IndexedFastq as IndexedFastq,
    build_fqi as build_fqi,
    read_fqi as read_fqi,
    write_fqi as write_fqi,
)
from .fastq.paired import (
    InterleavedFastqParser as InterleavedFastqParser,
    PairedFastqParser as PairedFastqParser,
    PairSyncError as PairSyncError,
)
from .fastq.parser import FastqParser as FastqParser, ParserConfig as ParserConfig
from .fastq.quality import (
    QualitySchema as QualitySchema,
    detect_quality_schema as detect_quality_schema,
    detect_quality_schema_file as detect_quality_schema_file,
    parse_schema as parse_schema,
)
from .fastq.record import (
    Definition as Definition,
    FastqRecord as FastqRecord,
    FastqView as FastqView,
    Validator as Validator,
)
from .features.ranges import Interval as Interval, Position as Position
from .gff.attributes import (
    Gff3Attributes as Gff3Attributes,
    parse_gff3_attributes as parse_gff3_attributes,
)
from .gff.parser import Gff3Parser as Gff3Parser
from .gff.record import (
    Gff3Record as Gff3Record,
    Gff3Strand as Gff3Strand,
    SequenceRegion as SequenceRegion,
)
from .gtf.attributes import (
    GtfAttributes as GtfAttributes,
    parse_gtf_attributes as parse_gtf_attributes,
)
from .gtf.parser import GtfParser as GtfParser, GtfRecord as GtfRecord
from .io.buffered import (
    ByteStream as ByteStream,
    LineIterator as LineIterator,
    LineIteratorError as LineIteratorError,
)
from .io.delimited import (
    DefaultLinePolicy as DefaultLinePolicy,
    DelimitedReader as DelimitedReader,
    DelimitedRecord as DelimitedRecord,
    DelimitedView as DelimitedView,
    LineAction as LineAction,
)
from .io.readers import (
    BgzfReader as BgzfReader,
    FileReader as FileReader,
    GZFile as GZFile,
    MemoryReader as MemoryReader,
    MmapReader as MmapReader,
    ParallelGzipReader as ParallelGzipReader,
    RapidgzipReader as RapidgzipReader,
    open_reader as open_reader,
    scan_bgzf_blocks as scan_bgzf_blocks,
)
from .io.writers import (
    BGZFWriter as BGZFWriter,
    BufferedWriter as BufferedWriter,
    FileWriter as FileWriter,
    GZWriter as GZWriter,
    MemoryWriter as MemoryWriter,
    buffered_writer_for_file as buffered_writer_for_file,
    buffered_writer_for_gzip as buffered_writer_for_gzip,
    buffered_writer_for_memory as buffered_writer_for_memory,
)
from .utils import (
    compute_num_fasta_reads_for_size as compute_num_fasta_reads_for_size,
    compute_num_reads_for_size as compute_num_reads_for_size,
    generate_synthetic_fasta_buffer as generate_synthetic_fasta_buffer,
    generate_synthetic_fastq_buffer as generate_synthetic_fastq_buffer,
    generate_synthetic_fastq_to_writer as generate_synthetic_fastq_to_writer,
    generate_variable_id_fastq_buffer as generate_variable_id_fastq_buffer,
)

__version__: str

# jax-dependent subpackages surfaced lazily via __getattr__ at runtime
ops: ModuleType
parallel: ModuleType
models: ModuleType

def parser(
    path: Any,
    quality_schema: str = ...,
    parallelism: int = ...,
    validate: bool = ...,
    batch_size: int = ...,
) -> FastqParser: ...
