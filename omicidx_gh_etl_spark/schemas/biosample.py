"""EBI / NCBI BioSample schemas.

EBI mirrors the reference's enforced Arrow schema
(omicidx_etl/ebi_biosample/extract.py:20-65): flattened
characteristics (map→array-of-structs with an added ``characteristic``
key field, flattening at ebi_biosample/extract.py:154-159), and
``update``/``release``/``create`` kept as ISO-8601 *strings* — the
bronze model CASTs them (bronze/stg_ebi_biosample.sql:15-18).

NCBI biosample/bioproject are schema-inferred in the reference
(pa.Table.from_pylist, biosample/extract.py:97); the StructTypes here
pin the fixture shape from sqlmesh/tests/test_stg_ncbi_*.yaml
(FIXTURES.md §5-6).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType())


def _arr_s(name: str) -> T.StructField:
    return T.StructField(name, T.ArrayType(T.StringType()))


CHARACTERISTIC = T.StructType(
    [
        _s("text"),
        T.StructField("ontologyTerms", T.ArrayType(T.StringType())),
        _s("unit"),
        _s("characteristic"),
    ]
)

ORGANIZATION = T.StructType([_s("Name"), _s("Role"), _s("Address"), _s("URI"), _s("Email")])
CONTACT = T.StructType([_s("Name"), _s("Role"), _s("Email")])
PUBLICATION = T.StructType([_s("pubmed_id"), _s("doi")])
EXTERNAL_REFERENCE = T.StructType(
    [_s("url"), T.StructField("duo", T.ArrayType(T.StringType()))]
)
_HREF = T.StructType([_s("href")])
LINKS = T.StructType(
    [
        T.StructField("self", _HREF),
        T.StructField("curationLinks", _HREF),
        T.StructField("samples", _HREF),
        T.StructField("curationLink", _HREF),
    ]
)

EBI_BIOSAMPLE_SCHEMA = T.StructType(
    [
        _s("accession"),
        _s("name"),
        _s("update"),
        _s("release"),
        _s("create"),
        T.StructField("taxId", T.LongType()),
        T.StructField("characteristics", T.ArrayType(CHARACTERISTIC)),
        T.StructField("organization", T.ArrayType(ORGANIZATION)),
        T.StructField("contact", T.ArrayType(CONTACT)),
        T.StructField("publications", T.ArrayType(PUBLICATION)),
        T.StructField("externalReferences", T.ArrayType(EXTERNAL_REFERENCE)),
        T.StructField("_links", LINKS),
    ]
)

NCBI_BIOSAMPLE_SCHEMA = T.StructType(
    [
        _s("accession"),
        _s("title"),
        _s("last_update"),
        _s("submission_date"),
        _s("publication_date"),
        _s("taxonomy_name"),
        T.StructField("taxon_id", T.LongType()),
        _s("is_reference"),
        _s("access"),
        _s("id"),
        _arr_s("id_recs"),
        _arr_s("ids"),
        _s("sra_sample"),
        _s("dbgap"),
        _s("gsm"),
        _s("description"),
        _arr_s("attribute_recs"),
        _arr_s("attributes"),
        _s("model"),
    ]
)

NCBI_BIOPROJECT_SCHEMA = T.StructType(
    [
        _s("accession"),
        _s("title"),
        _s("name"),
        _s("description"),
        _s("release_date"),
        _arr_s("publications"),
        _arr_s("locus_tags"),
        _arr_s("data_types"),
        _arr_s("external_links"),
    ]
)
