"""Property-based round-trip tests for the NCBI parsers (pure Python —
the record functions are exercised directly, no Spark session, so
hypothesis can run many examples cheaply).

Property: for ANY record content (including XML-hostile characters —
escaping handled by the ET builder, exactly how real feeds escape),
build the XML element and parse it back; every field round-trips."""

from __future__ import annotations

import io
import json
import tarfile
import xml.etree.ElementTree as ET

from hypothesis import given
from hypothesis import strategies as st

from omicidx_gh_etl_spark.sources.archive_extract import _member_lines
from omicidx_gh_etl_spark.sources.ncbi_extract import (
    biosample_record,
    bioproject_record,
    pubmed_record,
)

# XML 1.0 forbids most control chars; real feeds never contain them.
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="\r"
    ),
    min_size=1,
    max_size=40,
)
_name = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12)


@given(
    accession=_name,
    title=_text,
    taxonomy_name=_text,
    taxon_id=st.integers(1, 10**9),
    attrs=st.lists(st.tuples(_name, _text), max_size=5),
    ids=st.lists(st.tuples(_name, _text), max_size=5),
)
def test_biosample_roundtrip(accession, title, taxonomy_name, taxon_id, attrs, ids):
    bs = ET.Element("BioSample", accession=accession, access="public")
    ids_el = ET.SubElement(bs, "Ids")
    for db, val in ids:
        ET.SubElement(ids_el, "Id", db=db).text = val
    descr = ET.SubElement(bs, "Description")
    ET.SubElement(descr, "Title").text = title
    ET.SubElement(
        descr,
        "Organism",
        taxonomy_id=str(taxon_id),
        taxonomy_name=taxonomy_name,
    )
    attrs_el = ET.SubElement(bs, "Attributes")
    for name, val in attrs:
        ET.SubElement(attrs_el, "Attribute", attribute_name=name).text = val

    # serialize + reparse: the parser sees REAL escaped XML text
    rec = biosample_record(ET.fromstring(ET.tostring(bs, encoding="unicode")))
    assert rec["accession"] == accession
    assert rec["title"] == title
    assert rec["taxonomy_name"] == taxonomy_name
    assert rec["taxon_id"] == taxon_id
    assert rec["ids"] == [v.strip() for _, v in ids]
    assert rec["attributes"] == [f"{n}={v.strip()}" for n, v in attrs]
    for rec_json, (n, v) in zip(rec["attribute_recs"], attrs):
        parsed = json.loads(rec_json)
        assert parsed["attribute_name"] == n and parsed["value"] == v.strip()


@given(
    accession=_name,
    title=_text,
    pubs=st.lists(_name, max_size=4),
    links=st.lists(_text, max_size=3),
)
def test_bioproject_roundtrip(accession, title, pubs, links):
    proj = ET.Element("Project")
    pid = ET.SubElement(proj, "ProjectID")
    ET.SubElement(pid, "ArchiveID", accession=accession, archive="NCBI")
    descr = ET.SubElement(proj, "ProjectDescr")
    ET.SubElement(descr, "Title").text = title
    for p in pubs:
        ET.SubElement(descr, "Publication", id=p)
    for u in links:
        link = ET.SubElement(descr, "ExternalLink")
        ET.SubElement(link, "URL").text = u
    rec = bioproject_record(ET.fromstring(ET.tostring(proj, encoding="unicode")))
    assert rec["accession"] == accession
    assert rec["title"] == title
    assert rec["publications"] == pubs
    assert rec["external_links"] == [u.strip() for u in links if u.strip()]


@given(
    pmid=st.integers(1, 10**8),
    title=_text,
    authors=st.lists(st.tuples(_text, _text), max_size=4),
    mesh=st.lists(_text, max_size=4),
)
def test_pubmed_roundtrip(pmid, title, authors, mesh):
    art = ET.Element("PubmedArticle")
    cit = ET.SubElement(art, "MedlineCitation")
    ET.SubElement(cit, "PMID").text = str(pmid)
    a = ET.SubElement(cit, "Article")
    ET.SubElement(a, "ArticleTitle").text = title
    alist = ET.SubElement(a, "AuthorList")
    for last, fore in authors:
        au = ET.SubElement(alist, "Author")
        ET.SubElement(au, "LastName").text = last
        ET.SubElement(au, "ForeName").text = fore
    mh = ET.SubElement(cit, "MeshHeadingList")
    for m in mesh:
        ET.SubElement(
            ET.SubElement(mh, "MeshHeading"), "DescriptorName"
        ).text = m
    rec = pubmed_record(ET.fromstring(ET.tostring(art, encoding="unicode")))
    assert rec["pmid"] == str(pmid)
    assert rec["title"] == title
    assert [(x["lastname"], x["forename"]) for x in rec["authors"]] == authors
    assert rec["mesh_terms"] == mesh


@given(
    recs=st.lists(
        st.dictionaries(_name, st.integers(0, 100), min_size=1, max_size=3),
        min_size=1,
        max_size=10,
    )
)
def test_tar_member_lines_roundtrip(tmp_path_factory, recs):
    """Every jsonl line written into a tar.gz member comes back in
    order with its line number."""
    tmp = tmp_path_factory.mktemp("tarprop")
    data = "\n".join(json.dumps(r) for r in recs).encode()
    with tarfile.open(tmp / "a.tar.gz", "w:gz") as tar:
        info = tarfile.TarInfo("m.json")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    lines = list(_member_lines(str(tmp / "a.tar.gz"), ".json"))
    assert [json.loads(line) for _, _, _, line in lines] == recs
    assert [no for _, _, no, _ in lines] == list(range(len(recs)))
