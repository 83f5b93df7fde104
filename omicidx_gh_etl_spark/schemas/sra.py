"""SRA entity schemas as Spark StructTypes.

Mirrors the reference's enforced PyArrow schemas
(omicidx_etl/sra/extract.py:53-226) — the source of truth for SRA
run/study/sample/experiment parquet — and the accessions TSV table
(sqlmesh/models/raw/src_sra_accessions.sql:10-30).

Type mapping per SURVEY.md §1.2: pa.string→StringType,
pa.int64→LongType, pa.int32→IntegerType, pa.float64→DoubleType,
pa.struct→StructType, pa.list_→ArrayType. List fields are normalized
to [] (never null) upstream (normalize_record, sra/extract.py:255-302);
readers here rely on that invariant for explode semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType())


def _struct(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


IDENTIFIER = _struct(_s("namespace"), _s("id"), _s("uuid"))
ATTRIBUTE = _struct(_s("tag"), _s("value"))
XREF = _struct(_s("db"), _s("id"))

FILE_ALTERNATIVE = _struct(_s("url"), _s("free_egress"), _s("access_type"), _s("org"))

FILE = _struct(
    _s("cluster"),
    _s("filename"),
    _s("url"),
    T.StructField("size", T.LongType()),
    _s("date"),
    _s("md5"),
    _s("sratoolkit"),
    T.StructField("alternatives", T.ArrayType(FILE_ALTERNATIVE)),
)

RUN_READ = _struct(
    T.StructField("index", T.LongType()),
    T.StructField("count", T.LongType()),
    T.StructField("mean_length", T.DoubleType()),
    T.StructField("sd_length", T.DoubleType()),
)

BASE_COUNT = _struct(_s("base"), T.StructField("count", T.LongType()))

QUALITY = _struct(
    T.StructField("quality", T.IntegerType()), T.StructField("count", T.LongType())
)

TAX_COUNT_ENTRY = _struct(
    _s("rank"),
    _s("name"),
    T.StructField("parent", T.IntegerType()),
    T.StructField("total_count", T.LongType()),
    T.StructField("self_count", T.LongType()),
    T.StructField("tax_id", T.IntegerType()),
)

TAX_ANALYSIS = _struct(
    T.StructField("nspot_analyze", T.LongType()),
    T.StructField("total_spots", T.LongType()),
    T.StructField("mapped_spots", T.LongType()),
    T.StructField("tax_counts", T.ArrayType(TAX_COUNT_ENTRY)),
)

EXPERIMENT_READ = _struct(
    T.StructField("base_coord", T.LongType()),
    _s("read_class"),
    T.StructField("read_index", T.LongType()),
    _s("read_type"),
)

SRA_RUN_SCHEMA = _struct(
    _s("accession"),
    _s("alias"),
    _s("experiment_accession"),
    _s("title"),
    T.StructField("total_spots", T.LongType()),
    T.StructField("total_bases", T.LongType()),
    T.StructField("size", T.LongType()),
    T.StructField("avg_length", T.DoubleType()),
    T.StructField("identifiers", T.ArrayType(IDENTIFIER)),
    T.StructField("attributes", T.ArrayType(ATTRIBUTE)),
    T.StructField("files", T.ArrayType(FILE)),
    T.StructField("reads", T.ArrayType(RUN_READ)),
    T.StructField("base_counts", T.ArrayType(BASE_COUNT)),
    T.StructField("qualities", T.ArrayType(QUALITY)),
    T.StructField("tax_analysis", TAX_ANALYSIS),
)

SRA_STUDY_SCHEMA = _struct(
    _s("accession"),
    _s("study_accession"),
    _s("alias"),
    _s("title"),
    _s("description"),
    _s("abstract"),
    _s("study_type"),
    _s("center_name"),
    _s("broker_name"),
    _s("BioProject"),
    _s("GEO"),
    T.StructField("identifiers", T.ArrayType(IDENTIFIER)),
    T.StructField("attributes", T.ArrayType(ATTRIBUTE)),
    T.StructField("xrefs", T.ArrayType(XREF)),
    T.StructField("pubmed_ids", T.ArrayType(T.StringType())),
)

SRA_SAMPLE_SCHEMA = _struct(
    _s("accession"),
    _s("alias"),
    _s("title"),
    _s("organism"),
    _s("description"),
    T.StructField("taxon_id", T.IntegerType()),
    _s("geo"),
    _s("BioSample"),
    T.StructField("identifiers", T.ArrayType(IDENTIFIER)),
    T.StructField("attributes", T.ArrayType(ATTRIBUTE)),
    T.StructField("xrefs", T.ArrayType(XREF)),
)

SRA_EXPERIMENT_SCHEMA = _struct(
    _s("accession"),
    _s("experiment_accession"),
    _s("alias"),
    _s("title"),
    _s("description"),
    _s("design"),
    _s("center_name"),
    _s("study_accession"),
    _s("sample_accession"),
    _s("platform"),
    _s("instrument_model"),
    _s("library_name"),
    _s("library_construction_protocol"),
    _s("library_layout"),
    _s("library_layout_orientation"),
    _s("library_layout_length"),
    _s("library_layout_sdev"),
    _s("library_strategy"),
    _s("library_source"),
    _s("library_selection"),
    T.StructField("spot_length", T.LongType()),
    T.StructField("nreads", T.LongType()),
    T.StructField("identifiers", T.ArrayType(IDENTIFIER)),
    T.StructField("attributes", T.ArrayType(ATTRIBUTE)),
    T.StructField("xrefs", T.ArrayType(XREF)),
    T.StructField("reads", T.ArrayType(EXPERIMENT_READ)),
)

# SRA_Accessions.tab mirror (raw/src_sra_accessions.sql:10-30; FIXTURES.md §7).
# Updated/Published/Received are timestamps; Type ∈ {STUDY, EXPERIMENT,
# SAMPLE, RUN} is the join discriminator for all bronze SRA models.
SRA_ACCESSIONS_SCHEMA = _struct(
    _s("Accession"),
    _s("Submission"),
    _s("Status"),
    T.StructField("Updated", T.TimestampNTZType()),
    T.StructField("Published", T.TimestampNTZType()),
    T.StructField("Received", T.TimestampNTZType()),
    _s("Type"),
    _s("Center"),
    _s("Visibility"),
    _s("Alias"),
    _s("Experiment"),
    _s("Sample"),
    _s("Study"),
    T.StructField("Loaded", T.LongType()),
    T.StructField("Spots", T.LongType()),
    T.StructField("Bases", T.LongType()),
    _s("Md5sum"),
    _s("BioSample"),
    _s("BioProject"),
    _s("ReplacedBy"),
)
