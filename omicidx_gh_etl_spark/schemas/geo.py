"""GEO entity schemas (gsm/gse/gpl).

The reference stores GEO as NDJSON.gz with inferred, name-unioned
schemas (raw/src_geo_samples.sql:36). The full nested shapes come from
its BigQuery dumps (reference README.md:105-203) and the fixture files
(FIXTURES.md §1-3, §7): gsm carries ``channels``
array<struct> accessed 1-based (geometadb/gsm.sql:16-31) and a nested
``contact.name`` struct.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType())


def _arr_s(name: str) -> T.StructField:
    return T.StructField(name, T.ArrayType(T.StringType()))


CONTACT_NAME = T.StructType([_s("last"), _s("middle"), _s("first")])

CONTACT = T.StructType(
    [
        _s("city"),
        T.StructField("name", CONTACT_NAME),
        _s("laboratory"),
        _s("phone"),
        _s("state"),
        _s("country"),
        _s("zip_postal_code"),
        _s("department"),
        _s("email"),
        _s("address"),
        _s("institute"),
        _s("web_link"),
    ]
)

CHANNEL_CHARACTERISTIC = T.StructType([_s("value"), _s("tag")])

CHANNEL = T.StructType(
    [
        T.StructField("characteristics", T.ArrayType(CHANNEL_CHARACTERISTIC)),
        _s("treatment_protocol"),
        _s("extract_protocol"),
        _s("label_protocol"),
        _s("source_name"),
        _s("organism"),
        _s("molecule"),
        T.StructField("taxid", T.ArrayType(T.LongType())),
        _s("growth_protocol"),
        _s("label"),
    ]
)

GEO_SAMPLE_SCHEMA = T.StructType(
    [
        _s("accession"),
        _s("title"),
        _s("status"),
        T.StructField("submission_date", T.DateType()),
        T.StructField("last_update_date", T.DateType()),
        _s("type"),
        _s("biosample"),
        _s("platform_id"),
        T.StructField("tag_count", T.LongType()),
        T.StructField("tag_length", T.DoubleType()),
        _s("hyb_protocol"),
        T.StructField("channel_count", T.LongType()),
        _s("scan_protocol"),
        T.StructField("data_row_count", T.LongType()),
        _s("library_source"),
        _s("sra_experiment"),
        _s("data_processing"),
        _s("anchor"),
        _s("description"),
        T.StructField("contact", CONTACT),
        _s("overall_design"),
        _arr_s("supplemental_files"),
        T.StructField("channels", T.ArrayType(CHANNEL)),
        _arr_s("contributor"),
    ]
)

GEO_SERIES_SCHEMA = T.StructType(
    [
        _s("accession"),
        _s("title"),
        _s("status"),
        T.StructField("submission_date", T.DateType()),
        T.StructField("last_update_date", T.DateType()),
        _s("overall_design"),
        _s("summary"),
        _arr_s("subseries"),
        _arr_s("bioprojects"),
        _arr_s("sra_studies"),
        T.StructField("contact", CONTACT),
        _arr_s("type"),
        _arr_s("relation"),
        T.StructField("pubmed_id", T.ArrayType(T.LongType())),
        _arr_s("sample_id"),
        T.StructField("sample_taxid", T.ArrayType(T.LongType())),
        _arr_s("sample_organism"),
        _arr_s("platform_id"),
        T.StructField("platform_taxid", T.ArrayType(T.LongType())),
        _arr_s("platform_organism"),
        _s("data_processing"),
        _s("description"),
        _arr_s("supplemental_files"),
        _arr_s("contributor"),
    ]
)

GEO_PLATFORM_SCHEMA = T.StructType(
    [
        _s("accession"),
        _s("title"),
        _s("status"),
        T.StructField("submission_date", T.DateType()),
        T.StructField("last_update_date", T.DateType()),
        _s("organism"),
        _s("technology"),
        T.StructField("data_row_count", T.LongType()),
        T.StructField("contact", CONTACT),
        _s("summary"),
        _arr_s("sample_id"),
        _arr_s("series_id"),
        _s("description"),
        _s("distribution"),
        _arr_s("manufacturer"),
        _arr_s("contributor"),
        _arr_s("relation"),
        _s("manufacture_protocol"),
    ]
)
