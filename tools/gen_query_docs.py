"""Generate QUERIES.md from the query registry.

Run after adding queries:  python tools/gen_query_docs.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from omicidx_gh_etl_spark.queries import REGISTRY  # noqa: E402

HEADER = """\
# QUERIES — the registered correctness surface

Auto-generated (`python tools/gen_query_docs.py`) from
`omicidx_gh_etl_spark/queries/`. One row per entry in
`__spark_entry__.queries()`; "oracle" = value-hash-compared against
DuckDB by the driver at sf0.01, "rows-only" = iterative/approximate
operators whose properties are pytest-pinned instead.

| query | check | tags | what it is |
|---|---|---|---|
"""


def first_sentence(doc: str) -> str:
    text = " ".join((doc or "").split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text.split(stop, 1)[0] + "."
    return text or "—"


def main() -> None:
    lines = [HEADER]
    for name, q in sorted(REGISTRY.items()):
        check = "oracle" if q.oracle else "rows-only"
        tags = " ".join(q.tags) or "—"
        doc = first_sentence(q.doc).replace("|", "\\|")
        lines.append(f"| `{name}` | {check} | {tags} | {doc} |\n")
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    lines.append(
        f"\n{len(REGISTRY)} queries: {n_oracle} oracle, "
        f"{len(REGISTRY) - n_oracle} rows-only.\n"
    )
    Path(__file__).resolve().parent.parent.joinpath("QUERIES.md").write_text(
        "".join(lines)
    )
    print(f"wrote QUERIES.md ({len(REGISTRY)} queries, {n_oracle} oracle)")


if __name__ == "__main__":
    main()
