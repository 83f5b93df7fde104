"""Oracle-checked parser queries (S10 breadth).

Each query builds real-format NCBI XML documents DETERMINISTICALLY
from a testdata table, runs them through the actual record parsers in
``sources/ncbi_extract.py`` (the same code the file extractors use),
and projects scalar fields. The DuckDB oracle computes the expected
values directly from the source table — so a hash match proves the
parser round-trips every field exactly (extraction + typing), not
just that it runs.

Reference parity targets:
- BioSample/BioProject: omicidx_etl/biosample/extract.py:108-112 with
  the column contract of sqlmesh/models/raw/src_ncbi_biosample.sql /
  src_ncbi_bioproject.sql;
- PubMed medline: omicidx_etl/etl/pubmed.py:89-101.

Scale: the XML build is codegen'd concat; the parse is Arrow-batched
mapInPandas (the D1 surface — Python by design, batched, no shuffle);
the projection is map-only. One scan, zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.ncbi_extract import parse_xml_strings
from .base import register
from .tables import load_table


@register(
    "biosample_xml_parse",
    """
    SELECT 'SAMN' || CAST(c_custkey AS VARCHAR) AS accession,
           c_name AS title,
           CAST(c_nationkey AS BIGINT) AS taxon_id,
           c_mktsegment AS taxonomy_name,
           'SRS' || CAST(c_custkey AS VARCHAR) AS sra_sample,
           'Generic' AS model,
           CAST(2 AS INTEGER) AS n_attrs,
           'segment=' || c_mktsegment AS first_attr
    FROM customer
    """,
    tags=("S10", "xml", "parser"),
)
def biosample_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NCBI BioSample XML → records, field-exact vs the oracle: one
    <BioSampleSet> document per customer row in the real public format
    (Ids/Description/Organism/Attributes/Models), parsed by
    ``biosample_record``."""
    c = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    xml = F.concat(
        F.lit('<BioSampleSet><BioSample access="public" id="'), key,
        F.lit('" accession="SAMN'), key,
        F.lit('"><Ids><Id db="BioSample" is_primary="1">SAMN'), key,
        F.lit('</Id><Id db="SRA">SRS'), key,
        F.lit("</Id></Ids><Description><Title>"), F.col("c_name"),
        F.lit('</Title><Organism taxonomy_id="'),
        F.col("c_nationkey").cast("string"),
        F.lit('" taxonomy_name="'), F.col("c_mktsegment"),
        F.lit('"/></Description><Models><Model>Generic</Model></Models>'),
        F.lit('<Attributes><Attribute attribute_name="segment">'),
        F.col("c_mktsegment"),
        F.lit('</Attribute><Attribute attribute_name="name">'),
        F.col("c_name"),
        F.lit("</Attribute></Attributes></BioSample></BioSampleSet>"),
    )
    parsed = parse_xml_strings(c.select(xml.alias("xml")), "xml", "biosample")
    return parsed.select(
        "accession",
        "title",
        "taxon_id",
        "taxonomy_name",
        "sra_sample",
        "model",
        F.size("attributes").alias("n_attrs"),
        F.element_at("attributes", 1).alias("first_attr"),
    )


@register(
    "bioproject_xml_parse",
    """
    SELECT 'PRJNA' || CAST(o_orderkey AS VARCHAR) AS accession,
           o_orderpriority AS title,
           CAST(o_orderdate AS VARCHAR) AS release_date,
           CAST(1 AS INTEGER) AS n_pubs,
           CAST(o_custkey AS VARCHAR) AS first_pub,
           o_orderstatus AS data_type
    FROM orders
    """,
    tags=("S10", "xml", "parser"),
)
def bioproject_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NCBI BioProject XML → records: one <PackageSet> per order row
    in the real nested Package/Project/Project format, parsed by
    ``bioproject_record`` (inner-element selection + 1:N safety)."""
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("string")
    xml = F.concat(
        F.lit("<PackageSet><Package><Project><Project><ProjectID>"),
        F.lit('<ArchiveID accession="PRJNA'), key, F.lit('" id="'), key,
        F.lit('"/></ProjectID><ProjectDescr><Title>'),
        F.col("o_orderpriority"),
        F.lit("</Title><ProjectReleaseDate>"),
        F.col("o_orderdate").cast("string"),
        F.lit('</ProjectReleaseDate><Publication id="'),
        F.col("o_custkey").cast("string"),
        F.lit('"/></ProjectDescr><ProjectType><ProjectTypeSubmission>'),
        F.lit("<ProjectDataTypeSet><DataType>"), F.col("o_orderstatus"),
        F.lit("</DataType></ProjectDataTypeSet></ProjectTypeSubmission>"),
        F.lit("</ProjectType></Project></Project></Package></PackageSet>"),
    )
    parsed = parse_xml_strings(o.select(xml.alias("xml")), "xml", "bioproject")
    return parsed.select(
        "accession",
        "title",
        "release_date",
        F.size("publications").alias("n_pubs"),
        F.element_at("publications", 1).alias("first_pub"),
        F.element_at("data_types", 1).alias("data_type"),
    )


@register(
    "pubmed_medline_parse",
    """
    SELECT CAST(doc_id AS VARCHAR) AS pmid,
           '10.1000/d' || CAST(doc_id AS VARCHAR) AS doi,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           'Journal ' || CAST(doc_id % 7 AS VARCHAR) AS journal,
           CAST(2000 + doc_id % 20 AS VARCHAR) AS pubdate,
           CAST(2 AS INTEGER) AS n_authors,
           'A' || CAST(doc_id AS VARCHAR) AS first_author,
           'M' || CAST(doc_id % 5 AS VARCHAR) AS mesh0
    FROM documents
    """,
    tags=("S10", "xml", "parser"),
)
def pubmed_medline_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PubMed medline XML → records: one <PubmedArticleSet> per
    document row (PMID/Article/AuthorList/Mesh/ArticleIdList in the
    real format), parsed by ``pubmed_record``."""
    d = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit("<PubmedArticleSet><PubmedArticle><MedlineCitation><PMID>"),
        key,
        F.lit("</PMID><Article><Journal><Title>Journal "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</Title><JournalIssue><PubDate><Year>"),
        (F.lit(2000) + F.col("doc_id") % 20).cast("string"),
        F.lit("</Year></PubDate></JournalIssue></Journal>"),
        F.lit("<ArticleTitle>Doc "), key,
        F.lit("</ArticleTitle><AuthorList><Author><LastName>A"), key,
        F.lit("</LastName></Author><Author><LastName>B"), key,
        F.lit("</LastName></Author></AuthorList></Article>"),
        F.lit("<MeshHeadingList><MeshHeading><DescriptorName>M"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("</DescriptorName></MeshHeading></MeshHeadingList>"),
        F.lit("</MedlineCitation><PubmedData><ArticleIdList>"),
        F.lit('<ArticleId IdType="doi">10.1000/d'), key,
        F.lit("</ArticleId></ArticleIdList></PubmedData>"),
        F.lit("</PubmedArticle></PubmedArticleSet>"),
    )
    parsed = parse_xml_strings(d.select(xml.alias("xml")), "xml", "pubmed")
    return parsed.select(
        "pmid",
        "doi",
        "title",
        "journal",
        F.col("pubdate"),
        F.size("authors").alias("n_authors"),
        F.col("authors").getItem(0).getField("lastname").alias("first_author"),
        F.element_at("mesh_terms", 1).alias("mesh0"),
    )
