"""omicidx_gh_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference system (seandavi/omicidx-gh-etl: a DuckDB/sqlmesh batch ELT
warehouse for genomics metadata), re-expressed Spark-first:

- ``sources``   : parquet/ndjson/csv readers + zstd parquet / ndjson sinks
                  (reference: sqlmesh/models/raw/*.sql, omicidx_etl/sra/extract.py:540-627)
- ``schemas``   : StructType constants mirroring the reference's enforced
                  Arrow schemas (omicidx_etl/sra/extract.py:53-226,
                  ebi_biosample/extract.py:20-65)
- ``functions`` : semantic-parity helpers (1-based array indexing,
                  ISO-8601 casts, snake_case renames, …)
- ``operators`` : dedup (exact/minhash-LSH/simhash/ngram-jaccard/latest-by-key),
                  similarity search, text analysis, multimodal plumbing
- ``models``    : the reference's raw/bronze/geometadb/mart SQL models as
                  registered Spark model definitions
- ``engine``    : DAG runner (topo-sort, interval planner, run-tracking
                  meta tables) re-implementing the documented
                  transformations.warehouse contract (WAREHOUSE.md:132-310)
- ``queries``   : the operator inventory (SURVEY.md §2) as named
                  (spark_builder, duckdb_oracle_sql) pairs over the
                  synthetic test tables — the correctness surface.
"""

__version__ = "0.1.0"
