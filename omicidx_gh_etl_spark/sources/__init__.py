from .archive_extract import (
    archive_member_lines,
    read_archive_csv,
    read_archive_jsonl,
)
from .ncbi_extract import (
    extract_bioprojects,
    extract_biosamples,
    extract_pubmed,
    parse_xml_strings,
)
from .readers import read_csv, read_ndjson, read_parquet_glob, read_table, read_tables
from .rest_source import RestPagesDataSource
from .writers import write_ndjson, write_parquet

__all__ = [
    "read_parquet_glob",
    "read_ndjson",
    "read_csv",
    "read_table",
    "read_tables",
    "write_parquet",
    "write_ndjson",
    "RestPagesDataSource",
    "archive_member_lines",
    "read_archive_jsonl",
    "read_archive_csv",
    "extract_biosamples",
    "extract_bioprojects",
    "extract_pubmed",
    "parse_xml_strings",
]
