"""The reference's warehouse models, re-expressed as Spark DataFrame
builders: 11 raw views + 11 bronze incrementals + 6 geometadb
compatibility views + 1 mart.

Each builder cites the reference model it re-implements
(/root/reference/sqlmesh/models/...). Semantics preserved exactly:

- raw views = schema-pinned glob scans with explicit projections
  (linter-enforced, no SELECT * — sqlmesh/config.yaml);
- bronze = identity/rename projections + DuckDB-style CASTs +
  inclusive BETWEEN(start_ds, end_ds) on the time column; SRA bronze
  joins detail × accessions with a Type filter
  (bronze/stg_sra_experiments.sql:19-24);
- geometadb = explode/UNNEST, 1-based array indexing via
  try_element_at (gsm.sql:16-31 — the §7.4 semantic trap), struct
  access, UNION ALL with discriminators, DISTINCT pairs, regexp
  filename extraction, URL concat.

Scale notes: raw views are never materialized — bronze's date filters
reach the parquet scan through them. Bronze tables partition by their
time column (dynamic overwrite ⇒ idempotent backfills). The mart join
uses the same broadcast-dims / shuffle-facts split as
queries/core.py::mart_denormalized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.compat import array_get_1based, iso8601_to_date, iso8601_to_timestamp
from ..schemas import (
    EBI_BIOSAMPLE_SCHEMA,
    GEO_PLATFORM_SCHEMA,
    GEO_SAMPLE_SCHEMA,
    GEO_SERIES_SCHEMA,
    NCBI_BIOPROJECT_SCHEMA,
    NCBI_BIOSAMPLE_SCHEMA,
    SRA_ACCESSIONS_SCHEMA,
    SRA_EXPERIMENT_SCHEMA,
    SRA_RUN_SCHEMA,
    SRA_SAMPLE_SCHEMA,
    SRA_STUDY_SCHEMA,
)
from .registry import ModelContext, Resolver, model

# -------------------------------------------------------------------------
# raw layer — schema-pinned glob scans (VIEW kind, zero-copy)
# -------------------------------------------------------------------------

_RAW_SOURCES = {
    # name suffix → (relative glob, schema, format)
    "src_sra_runs": ("sra/*Full-run-*.parquet", SRA_RUN_SCHEMA, "parquet"),
    "src_sra_experiments": (
        "sra/*Full-experiment-*.parquet", SRA_EXPERIMENT_SCHEMA, "parquet"),
    "src_sra_samples": ("sra/*Full-sample-*.parquet", SRA_SAMPLE_SCHEMA, "parquet"),
    "src_sra_studies": ("sra/*Full-study-*.parquet", SRA_STUDY_SCHEMA, "parquet"),
    "src_sra_accessions": ("sra/sra_accessions.parquet", SRA_ACCESSIONS_SCHEMA, "parquet"),
    "src_ncbi_biosample": ("biosample/biosample-*.parquet", NCBI_BIOSAMPLE_SCHEMA, "parquet"),
    "src_ncbi_bioproject": ("biosample/bioproject-*.parquet", NCBI_BIOPROJECT_SCHEMA, "parquet"),
    "src_ebi_biosample": ("ebi_biosample/biosamples-*.parquet", EBI_BIOSAMPLE_SCHEMA, "parquet"),
    "src_geo_samples": ("geo/gsm*.ndjson.gz", GEO_SAMPLE_SCHEMA, "json"),
    "src_geo_series": ("geo/gse*.ndjson.gz", GEO_SERIES_SCHEMA, "json"),
    "src_geo_platforms": ("geo/gpl*.ndjson.gz", GEO_PLATFORM_SCHEMA, "json"),
}


def _make_raw(name: str, glob: str, schema, fmt: str):
    @model(name=f"raw.{name}", layer="raw", kind="VIEW")
    def _raw(resolve: Resolver, ctx: ModelContext, _glob=glob, _schema=schema, _fmt=fmt) -> DataFrame:
        path = f"{ctx.data_root}/{_glob}"
        reader = ctx.spark.read.schema(_schema)
        if _fmt == "json":
            # NDJSON.gz with union-by-name semantics (raw/src_geo_samples.sql:36);
            # pinned schema ⇒ files missing columns yield nulls.
            return reader.json(path)
        return reader.parquet(path)

    _raw.__doc__ = f"Glob scan (sqlmesh/models/raw/{name}.sql)."
    return _raw


for _n, (_g, _s, _f) in _RAW_SOURCES.items():
    _make_raw(_n, _g, _s, _f)


# -------------------------------------------------------------------------
# bronze layer — incremental-by-time-range staging
# -------------------------------------------------------------------------


def _between_ds(col: Column, ctx: ModelContext) -> Column:
    """Inclusive BETWEEN @start_ds AND @end_ds (FIXTURES.md §8.2)."""
    return col.between(F.lit(ctx.start_ds).cast("date"), F.lit(ctx.end_ds).cast("date"))


def _sra_bronze(entity: str, type_value: str):
    """Shared shape of bronze/stg_sra_{experiments,runs,samples,studies}.sql:
    detail INNER JOIN accessions ON accession=Accession + Type filter +
    date range, projecting detail.* + Updated-derived columns."""

    @model(
        name=f"bronze.stg_sra_{entity}",
        layer="bronze",
        kind="INCREMENTAL_BY_TIME_RANGE",
        time_column="updated_date",
        grain="accession",
        depends_on=(f"raw.src_sra_{entity}", "raw.src_sra_accessions"),
    )
    def _m(resolve: Resolver, ctx: ModelContext, _e=entity, _t=type_value) -> DataFrame:
        detail = resolve(f"raw.src_sra_{_e}").alias("e")
        acc = (
            resolve("raw.src_sra_accessions")
            .filter(F.col("Type") == _t)
            .alias("a")
        )
        joined = detail.join(acc, F.col("e.accession") == F.col("a.Accession"), "inner")
        extra = {
            "updated_date": F.col("a.Updated").cast("date"),
            "updated_timestamp": F.col("a.Updated"),
            "status": F.col("a.Status"),
            "biosample": F.col("a.BioSample"),
            "bioproject": F.col("a.BioProject"),
        }
        # Spark resolves column names case-insensitively: where the detail
        # schema already carries the xref (samples.BioSample, studies.BioProject
        # — sra/extract.py:168-186), keep the detail's column.
        detail_lower = {c.lower() for c in detail.columns}
        cols = [c.alias(n) for n, c in extra.items() if n not in detail_lower]
        return joined.filter(
            _between_ds(F.col("a.Updated").cast("date"), ctx)
        ).select("e.*", *cols)

    _m.__doc__ = f"bronze/stg_sra_{entity}.sql (Type='{type_value}')."
    return _m


_sra_bronze("experiments", "EXPERIMENT")
_sra_bronze("runs", "RUN")
_sra_bronze("samples", "SAMPLE")
_sra_bronze("studies", "STUDY")


@model(
    name="bronze.stg_sra_accessions",
    layer="bronze",
    kind="INCREMENTAL_BY_TIME_RANGE",
    time_column="updated_date",
    grain="accession",
    depends_on=("raw.src_sra_accessions",),
)
def stg_sra_accessions(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """bronze/stg_sra_accessions.sql — full snake_case rename projection."""
    a = resolve("raw.src_sra_accessions")
    renames = {
        "Accession": "accession", "Submission": "submission", "Status": "status",
        "Published": "published", "Received": "received", "Type": "type",
        "Center": "center", "Visibility": "visibility", "Alias": "alias",
        "Experiment": "experiment", "Sample": "sample", "Study": "study",
        "Loaded": "loaded", "Spots": "spots", "Bases": "bases",
        "Md5sum": "md5sum", "BioSample": "biosample", "BioProject": "bioproject",
        "ReplacedBy": "replaced_by",
    }
    return a.filter(_between_ds(F.col("Updated").cast("date"), ctx)).select(
        *[F.col(old).alias(new) for old, new in renames.items()],
        F.col("Updated").cast("date").alias("updated_date"),
        F.col("Updated").alias("updated_timestamp"),
    )


def _geo_bronze(entity: str):
    @model(
        name=f"bronze.stg_geo_{entity}",
        layer="bronze",
        kind="INCREMENTAL_BY_TIME_RANGE",
        time_column="last_update_date",
        grain="accession",
        depends_on=(f"raw.src_geo_{entity}",),
    )
    def _m(resolve: Resolver, ctx: ModelContext, _e=entity) -> DataFrame:
        src = resolve(f"raw.src_geo_{_e}")
        return src.filter(_between_ds(F.col("last_update_date"), ctx))

    _m.__doc__ = f"bronze/stg_geo_{entity}.sql — identity + date range."
    return _m


_geo_bronze("samples")
_geo_bronze("series")
_geo_bronze("platforms")


@model(
    name="bronze.stg_ebi_biosample",
    layer="bronze",
    kind="INCREMENTAL_BY_TIME_RANGE",
    time_column="update_date",
    grain="accession",
    depends_on=("raw.src_ebi_biosample",),
)
def stg_ebi_biosample(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """bronze/stg_ebi_biosample.sql — ISO-8601 'Z'+millis casts
    (golden: "2021-01-07T00:22:30.866Z" → 2021-01-07 00:22:30.866)."""
    src = resolve("raw.src_ebi_biosample")
    return src.filter(_between_ds(iso8601_to_date("update"), ctx)).select(
        "accession",
        "name",
        iso8601_to_timestamp("update").alias("update_timestamp"),
        iso8601_to_date("update").alias("update_date"),
        iso8601_to_timestamp("release").alias("release_timestamp"),
        iso8601_to_timestamp("create").alias("create_timestamp"),
        "taxId",
        "characteristics",
        "organization",
        "contact",
        "publications",
        "externalReferences",
        "_links",
    )


@model(
    name="bronze.stg_ncbi_biosample",
    layer="bronze",
    kind="INCREMENTAL_BY_TIME_RANGE",
    time_column="last_update_date",
    grain="accession",
    depends_on=("raw.src_ncbi_biosample",),
)
def stg_ncbi_biosample(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """bronze/stg_ncbi_biosample.sql."""
    src = resolve("raw.src_ncbi_biosample")
    return src.filter(_between_ds(iso8601_to_date("last_update"), ctx)).select(
        "is_reference",
        iso8601_to_timestamp("submission_date").alias("submission_timestamp"),
        iso8601_to_timestamp("last_update").alias("last_update_timestamp"),
        iso8601_to_date("last_update").alias("last_update_date"),
        iso8601_to_timestamp("publication_date").alias("publication_timestamp"),
        "access", "id", "accession", "id_recs", "ids", "sra_sample",
        "dbgap", "gsm", "title", "description", "taxonomy_name", "taxon_id",
        "attribute_recs", "attributes", "model",
    )


@model(
    name="bronze.stg_ncbi_bioproject",
    layer="bronze",
    kind="INCREMENTAL_BY_TIME_RANGE",
    time_column="release_date_only",
    grain="accession",
    depends_on=("raw.src_ncbi_bioproject",),
)
def stg_ncbi_bioproject(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """bronze/stg_ncbi_bioproject.sql."""
    src = resolve("raw.src_ncbi_bioproject")
    return src.filter(_between_ds(iso8601_to_date("release_date"), ctx)).select(
        "title", "description", "name", "accession", "publications", "locus_tags",
        iso8601_to_timestamp("release_date").alias("release_timestamp"),
        iso8601_to_date("release_date").alias("release_date_only"),
        "data_types", "external_links",
    )


# -------------------------------------------------------------------------
# geometadb layer — compatibility views
# -------------------------------------------------------------------------

_GEO_ACC_URL = "https://www.ncbi.nlm.nih.gov/geo/query/acc.cgi?acc="


def _contact_full_name() -> Column:
    # contact."name"."first" || ' ' || contact."name"."last" (gsm.sql / gse.sql)
    return F.concat_ws(" ", F.col("contact.name.first"), F.col("contact.name.last"))


def _channel(i: int, fld: str) -> Column:
    """1-based channels[i].field — DuckDB indexing (gsm.sql:16-31)."""
    return array_get_1based("channels", i)[fld]


@model(
    name="geometadb.gsm",
    layer="geometadb",
    kind="VIEW",
    depends_on=("bronze.stg_geo_samples",),
)
def geometadb_gsm(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """geometadb/gsm.sql — GEOmetadb-compatible GSM view: 1-based
    channel access for ch1/ch2, nested contact name concat."""
    s = resolve("bronze.stg_geo_samples")
    ch_fields = [
        "source_name", "organism", "characteristics", "molecule", "label",
        "treatment_protocol", "extract_protocol", "label_protocol",
    ]
    cols: list[Column] = [
        F.col("title"),
        F.col("accession").alias("gsm"),
        F.col("platform_id").alias("gpl"),
        F.col("status"),
        F.col("submission_date"),
        F.col("last_update_date"),
        F.col("type"),
    ]
    for i in (1, 2):
        cols += [_channel(i, f).alias(f"{f}_ch{i}") for f in ch_fields]
    cols += [
        F.col("channels").alias("channel_records"),
        F.col("hyb_protocol"),
        F.col("description"),
        F.col("data_processing"),
        _contact_full_name().alias("contact"),
        F.col("supplemental_files").alias("supplementary_file"),
        F.col("data_row_count"),
        F.col("channel_count"),
    ]
    return s.select(*cols)


@model(
    name="geometadb.gse",
    layer="geometadb",
    kind="VIEW",
    depends_on=("bronze.stg_geo_series",),
)
def geometadb_gse(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """geometadb/gse.sql — GSE view with web_link concat + contact fields."""
    s = resolve("bronze.stg_geo_series")
    return s.select(
        F.col("accession").alias("gse"),
        "title",
        "status",
        "submission_date",
        "last_update_date",
        "summary",
        "pubmed_id",
        "type",
        "contributor",
        F.concat(F.lit(_GEO_ACC_URL), F.col("accession")).alias("web_link"),
        "overall_design",
        F.col("contact.country").alias("contact_country"),
        F.col("contact.email").alias("contact_email"),
        F.col("contact.name.first").alias("contact_first_name"),
        F.col("contact.institute").alias("contact_institute"),
        F.col("contact.name.last").alias("contact_last_name"),
        _contact_full_name().alias("contact"),
        F.col("supplemental_files").alias("supplementary_file"),
        "data_processing",
    )


@model(
    name="geometadb.gpl",
    layer="geometadb",
    kind="VIEW",
    depends_on=("bronze.stg_geo_platforms",),
)
def geometadb_gpl(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """geometadb/gpl.sql — GPL view."""
    p = resolve("bronze.stg_geo_platforms")
    return p.select(
        "title",
        F.col("accession").alias("gpl"),
        "status",
        "submission_date",
        "last_update_date",
        "technology",
        "distribution",
        "organism",
        "manufacturer",
        "manufacture_protocol",
        "description",
        F.concat(F.lit(_GEO_ACC_URL), F.col("accession")).alias("web_link"),
        _contact_full_name().alias("contact"),
        "data_row_count",
        "summary",
    )


@model(
    name="geometadb.gse_gsm",
    layer="geometadb",
    kind="VIEW",
    depends_on=("bronze.stg_geo_series",),
)
def geometadb_gse_gsm(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """geometadb/gse_gsm.sql — DISTINCT(accession, UNNEST(sample_id))."""
    s = resolve("bronze.stg_geo_series")
    return (
        s.select(F.col("accession").alias("gse"), F.explode("sample_id").alias("gsm"))
        .distinct()
    )


@model(
    name="geometadb.gse_gpl",
    layer="geometadb",
    kind="VIEW",
    depends_on=("bronze.stg_geo_platforms",),
)
def geometadb_gse_gpl(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """geometadb/gse_gpl.sql — DISTINCT(accession, UNNEST(series_id))."""
    p = resolve("bronze.stg_geo_platforms")
    return (
        p.select(F.col("accession").alias("gpl"), F.explode("series_id").alias("gse"))
        .distinct()
    )


@model(
    name="geometadb.geo_supplemental_files",
    layer="geometadb",
    kind="VIEW",
    depends_on=("bronze.stg_geo_series", "bronze.stg_geo_samples"),
)
def geometadb_geo_supplemental_files(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """geometadb/geo_supplemental_files.sql — UNION ALL of exploded
    supplemental files with 'gse'/'gsm' discriminators, != 'NONE'
    filter, regexp filename extraction. Empty arrays vanish on explode
    (matches DuckDB UNNEST, FIXTURES.md §8.1)."""

    def side(model_name: str, tag: str) -> DataFrame:
        return resolve(model_name).select(
            "accession",
            F.lit(tag).alias("accession_type"),
            F.explode("supplemental_files").alias("supplemental_file"),
        )

    supp = side("bronze.stg_geo_series", "gse").unionByName(
        side("bronze.stg_geo_samples", "gsm")
    )
    return supp.filter(F.col("supplemental_file") != "NONE").select(
        "accession",
        "accession_type",
        "supplemental_file",
        F.regexp_extract("supplemental_file", r"[^/]+$", 0).alias("filename"),
    )


# -------------------------------------------------------------------------
# mart layer — denormalized export (the reference's headline table)
# -------------------------------------------------------------------------


@model(
    name="mart.sra_metadata",
    layer="mart",
    kind="TABLE",
    depends_on=(
        "bronze.stg_sra_experiments",
        "bronze.stg_sra_studies",
        "bronze.stg_sra_samples",
    ),
)
def mart_sra_metadata(resolve: Resolver, ctx: ModelContext) -> DataFrame:
    """mart.sra_metadata — denormalized experiment×study×sample table
    (WAREHOUSE_SUMMARY.md:119-139; 49.4M rows / 6.9 s baseline,
    EXPORT_DEPLOYMENT.md:247-252). Join keys study_accession /
    sample_accession exist in the experiment schema
    (sra/extract.py:200-202).

    Scale: experiments is the big fact; studies (531K in the
    reference) broadcasts, samples (30M) sort-merge-joins — AQE
    re-plans to broadcast when a side fits."""
    e = resolve("bronze.stg_sra_experiments").alias("e")
    st = resolve("bronze.stg_sra_studies").alias("st")
    sa = resolve("bronze.stg_sra_samples").alias("sa")
    return (
        e.join(
            F.broadcast(st), F.col("e.study_accession") == F.col("st.accession"), "left"
        )
        .join(sa, F.col("e.sample_accession") == F.col("sa.accession"), "left")
        .select(
            F.col("e.accession").alias("experiment_accession"),
            F.col("e.title").alias("experiment_title"),
            F.col("e.platform").alias("platform"),
            F.col("e.instrument_model").alias("instrument_model"),
            F.col("e.library_strategy").alias("library_strategy"),
            F.col("e.library_source").alias("library_source"),
            F.col("e.library_selection").alias("library_selection"),
            F.col("e.updated_date").alias("updated_date"),
            F.col("e.status").alias("status"),
            F.col("e.bioproject").alias("bioproject"),
            F.col("e.biosample").alias("biosample"),
            F.col("st.accession").alias("study_accession"),
            F.col("st.title").alias("study_title"),
            F.col("st.study_type").alias("study_type"),
            F.col("sa.accession").alias("sample_accession"),
            F.col("sa.organism").alias("organism"),
            F.col("sa.taxon_id").alias("taxon_id"),
        )
    )
