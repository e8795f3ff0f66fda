"""Phred quality schemas (reference: blazeseq/fastq/quality_schema.mojo:26-31).

Values derive from BioJulia FASTX.jl quality tables. Each schema carries the
inclusive ASCII byte range [LOWER, UPPER] considered valid and the OFFSET used
to decode Phred scores.

Note: the reference's SIMD validation path treats UPPER as exclusive while its
scalar tail treats it as inclusive (blazeseq/fastq/record.mojo:119-148). We use
the inclusive (scalar) semantics everywhere, matching the documented schema.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class QualitySchema:
    SCHEMA: str
    LOWER: int
    UPPER: int
    OFFSET: int

    def __str__(self) -> str:
        return (
            "Quality schema: %s\nLower: %d\nUpper: %d\nOffset: %d"
            % (self.SCHEMA, self.LOWER, self.UPPER, self.OFFSET)
        )


GENERIC_SCHEMA = QualitySchema("Generic", 33, 126, 33)
SANGER_SCHEMA = QualitySchema("Sanger", 33, 126, 33)
SOLEXA_SCHEMA = QualitySchema("Solexa", 59, 126, 64)
ILLUMINA_1_3_SCHEMA = QualitySchema("Illumina v1.3", 64, 126, 64)
ILLUMINA_1_5_SCHEMA = QualitySchema("Illumina v1.5", 66, 126, 64)
ILLUMINA_1_8_SCHEMA = QualitySchema("Illumina v1.8", 33, 126, 33)

_SCHEMAS = {
    "generic": GENERIC_SCHEMA,
    "sanger": SANGER_SCHEMA,
    "solexa": SOLEXA_SCHEMA,
    "illumina_1.3": ILLUMINA_1_3_SCHEMA,
    "illumina_1.5": ILLUMINA_1_5_SCHEMA,
    "illumina_1.8": ILLUMINA_1_8_SCHEMA,
}


def parse_schema(quality_format: str) -> QualitySchema:
    """Resolve a schema name; unknown names warn and fall back to generic
    (reference: blazeseq/utils.mojo:614-637)."""
    schema = _SCHEMAS.get(quality_format)
    if schema is None:
        print(
            "Unknown quality schema please choose one of 'sanger', 'solexa',"
            " 'illumina_1.3', 'illumina_1.5' 'illumina_1.8', or 'generic'."
            " Parsing with generic schema."
        )
        return GENERIC_SCHEMA
    return schema
