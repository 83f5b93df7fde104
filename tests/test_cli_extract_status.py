"""CLI per-source extract verbs + status dashboard (reference:
omicidx_etl/cli.py:19-35 per-source commands, status.py dashboard)."""

import argparse
import json

from omicidx_gh_etl_spark import cli

_BIOSAMPLE_XML = """<?xml version="1.0"?>
<BioSampleSet>
  <BioSample access="public" id="7" accession="SAMN7">
    <Ids><Id db="BioSample" is_primary="1">SAMN7</Id></Ids>
    <Description><Title>t7</Title>
      <Organism taxonomy_id="10090" taxonomy_name="Mus musculus"/>
    </Description>
  </BioSample>
</BioSampleSet>
"""


def _ns(**kw):
    base = dict(cmd="extract", cpus=8, schema=None, block_size=1_000_000)
    base.update(kw)
    return argparse.Namespace(**base)


def test_cli_extract_biosample(spark, tmp_path, capsys):
    src = tmp_path / "in"
    src.mkdir()
    (src / "biosample_set.xml").write_text(_BIOSAMPLE_XML)
    out = str(tmp_path / "out")
    assert cli.cmd_extract(_ns(source="biosample", input=str(src), output=out)) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload == {"source": "biosample", "records": 1, "output": out}
    row = spark.read.parquet(out).collect()[0]
    assert row["accession"] == "SAMN7" and row["taxon_id"] == 10090


def test_cli_extract_scimago(spark, tmp_path, capsys):
    """extract --source scimago: `;`-delimited CSV with messy headers →
    snake_case parquet (reference etl/scimago.py:21-28 incl. the
    trailing-underscore strip on names like "Total Docs. (2021)")."""
    src = tmp_path / "scimago.csv"
    src.write_text(
        "Rank;Title;SJR Best Quartile;Total Docs. (2021)\n"
        "1;Nature;Q1;5000\n"
        "2;Cell;Q1;400\n"
    )
    out = str(tmp_path / "scimago_out")
    assert cli.cmd_extract(_ns(source="scimago", input=str(src), output=out)) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload == {"source": "scimago", "records": 2, "output": out}
    df = spark.read.parquet(out)
    assert df.columns == ["rank", "title", "sjr_best_quartile", "total_docs_2021"]
    assert {r["title"] for r in df.collect()} == {"Nature", "Cell"}


def test_cli_extract_scimago_ndjson_format(spark, tmp_path, capsys):
    """--format ndjson mirrors the reference's raw artifact shape
    (scimago.ndjson.gz, etl/scimago.py:36-37): gzip NDJSON out."""
    import gzip
    import pathlib

    src = tmp_path / "scimago.csv"
    src.write_text("Rank;Title\n1;Nature\n")
    out = str(tmp_path / "scimago_nd")
    assert cli.cmd_extract(
        _ns(source="scimago", input=str(src), output=out, format="ndjson")
    ) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["records"] == 1
    parts = list(pathlib.Path(out).glob("*.json.gz"))
    assert parts, "expected gzip ndjson part files"
    rec = json.loads(gzip.open(parts[0], "rt").readline())
    assert rec == {"rank": 1, "title": "Nature"}


def test_cli_extract_scimago_requires_input(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        cli.cmd_extract(_ns(source="scimago", input=None, output=str(tmp_path / "o")))


def test_cli_extract_icite_requires_schema(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        cli.cmd_extract(
            _ns(source="icite", input=str(tmp_path), output=str(tmp_path / "o"))
        )


# the `status` dashboard test lives in test_warehouse_models.py (it
# needs that module's reference-shaped data_root fixture).


def test_cli_extract_rest_source(spark, tmp_path, capsys):
    """extract --source ebi-biosample: paged-REST DataSource → chunked
    zstd parquet (synthetic transport offline; partition-per-page)."""
    import argparse
    import json

    from omicidx_gh_etl_spark import cli

    out = str(tmp_path / "rest_out")
    ns = argparse.Namespace(
        cmd="extract", cpus=8, source="ebi-biosample", input=None,
        output=out, schema=None, block_size=1000, total=450, page_size=200,
    )
    assert cli.cmd_extract(ns) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["records"] == 450
    back = spark.read.parquet(out)
    assert back.count() == 450
    # partition-per-page planning: 450 records / 200-page => pages 0..2
    assert {r["page"] for r in back.select("page").distinct().collect()} \
        == {0, 1, 2}


def test_cli_extract_geo_esearch(spark, tmp_path, capsys):
    """extract --source geo-esearch: the GEO Entrez esearch preset —
    retstart/retmax offset pagination (--page-size maps onto retmax)
    with entrez gds ids mapped to GSE/GPL/GSM accessions, the shape of
    reference geo/extract.py:198-221,239-277 (synthetic transport
    offline)."""
    import argparse
    import json

    from omicidx_gh_etl_spark import cli

    out = str(tmp_path / "geo_out")
    ns = argparse.Namespace(
        cmd="extract", cpus=8, source="geo-esearch", input=None,
        output=out, schema=None, block_size=1000, total=7500,
        page_size=5000, term='"rnaseq counts"[filter]',
    )
    assert cli.cmd_extract(ns) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["records"] == 7500
    back = spark.read.parquet(out)
    assert back.count() == 7500
    # retstart/retmax pagination: 7500 ids at retmax 5000 => 2 pages
    assert {r["page"] for r in back.select("page").distinct().collect()} \
        == {0, 1}
    # entrez id -> accession mapping: series digit + stripped padding
    # (1-based ids: index 0 would otherwise mint the impossible
    # empty-numbered "GSE")
    accs = {r["accession"] for r in back.collect()}
    assert "GSE1" in accs and "GPL2" in accs and "GSM3" in accs
    assert all(a[:3] in ("GSE", "GPL", "GSM") for a in accs)
    assert all(len(a) > 3 for a in accs), "empty-numbered accession"
    # the payload column is valid JSON even though the term carries
    # double quotes (json.dumps, not f-string interpolation)
    for r in back.limit(5).collect():
        assert json.loads(r["payload"])["term"] == '"rnaseq counts"[filter]'
