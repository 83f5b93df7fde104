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


def test_cli_extract_icite_requires_schema(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        cli.cmd_extract(
            _ns(source="icite", input=str(tmp_path), output=str(tmp_path / "o"))
        )


# the `status` dashboard test lives in test_warehouse_models.py (it
# needs that module's reference-shaped data_root fixture).
