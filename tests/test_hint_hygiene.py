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

# Aggregate GROUP KEYS whose distinct-value count is bounded by the
# schema / the author's construction, not the corpus (round-6 advice:
# an Aggregate alone does not bound output — groupBy(doc_id) grows with
# the data; these keys do not):
# - event_type: generator enum (a handful of values at every SF);
# - source:     corpus source tag, same kind of enum;
# - __qb:      quantile-bucket index, ≤ n_buckets by construction
#              (engine/curate.py token-budget selection);
# - bkt:       hash-bucket index (`md5(...) % n_buckets`), bounded by
#              the modulus constant (queries/llmops.py DSIR buckets);
# - j, bucket: Count-Min sketch coordinates, ≤ depth × width constants
#              (operators/sketch.py).
# - pos:       posexplode ordinal of a fixed-dim embedding array, ≤ dim
#              (operators/similarity.py::covariance_matrix Σx frame).
# - centroid_id: k-means/IVF cell id — cardinality ≤ k, the cluster
#              count the AUTHOR chose (seeds are a constant-key-bounded
#              frame; every assignment maps into that id set), never
#              the corpus (similarity_kmeans_two_steps re-broadcasts
#              step-1's (centroid_id, pos)-aggregated centroids).
_BOUNDED_GROUP_KEYS = {
    "event_type", "source", "__qb", "bkt", "j", "bucket", "pos",
    "centroid_id",
}

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

_KEY_REF = re.compile(r"#\d+L?\b")


def _agg_key_names(agg) -> list[str]:
    """Base column names of an Aggregate's grouping expressions
    (exprId suffixes stripped); a non-attribute grouping expression
    keeps its full rendering and so never matches the bounded list —
    conservative by construction."""
    return [
        _KEY_REF.sub("", g.toString())
        for g in _jlist(agg.groupingExpressions())
    ]


def _filter_condition(n) -> str:
    """The Filter's condition rendered WITHOUT truncation (round-6
    advice: ``simpleString(25)`` elides long conditions, which could
    hide — or fake — a bounding literal)."""
    try:
        return n.condition().toString()
    except Exception:
        return n.simpleString(1000)


def _hint_child_ok(child) -> bool:
    """EVERY root-to-leaf path in the hint child must cross its own
    bounding node (round-6 advice: the old any-Aggregate-in-subtree
    rule let one reduced branch of a Join whitelist the other, and
    accepted corpus-keyed aggregates like groupBy(doc_id)). Walking
    top-down, a path is bounded when it hits:

    - ``GlobalLimit`` / ``Deduplicate`` — author-shaped top-k /
      distinct frames (every current use dedups an already-reduced
      candidate or query-term set);
    - ``Aggregate`` with NO group keys (scalar), with every group key
      in ``_BOUNDED_GROUP_KEYS``, or with ANY ``Filter`` above it on
      the path (the HAVING hot-set pattern: the author capped the key
      set explicitly — hot shingles, Q18 large-volume orders);
    - a bounded leaf (``_leaf_ok``) or any leaf below a unique-key
      vs literal ``Filter`` (``vec_id < 10`` ⇒ ≤10 rows at any SF).
    """
    return _path_ok(child, False, False)


def _path_ok(node, any_filter_above: bool, key_bound_above: bool) -> bool:
    nm = node.nodeName()
    if nm in ("GlobalLimit", "Deduplicate"):
        return True
    if nm == "Aggregate":
        keys = _agg_key_names(node)
        if not keys or any_filter_above:
            return True
        if all(k in _BOUNDED_GROUP_KEYS for k in keys):
            return True
        if _semi_bounded_agg(node, keys):
            return True
        # bounded-INPUT aggregate: grouping never grows rows, so an
        # Aggregate whose every path below is itself bounded (e.g. a
        # groupBy(q_id) over a `vec_id < 3` unique-key filter — the
        # multi-probe query-bucket shape) is bounded regardless of its
        # group keys
        kids = _jlist(node.children())
        return bool(kids) and all(
            _path_ok(k, any_filter_above, key_bound_above) for k in kids
        )
    kids = _jlist(node.children())
    if not kids:
        return _leaf_ok(node) or key_bound_above
    if nm == "Filter":
        cond = _filter_condition(node)
        any_filter_above = True
        key_bound_above = key_bound_above or bool(_BOUND_FILTER.search(cond))
    return all(
        _path_ok(k, any_filter_above, key_bound_above) for k in kids
    )


def _semi_bounded_agg(agg, keys: list[str]) -> bool:
    """groupBy whose input was LEFT SEMI-joined on every group key
    against a bounded right side (itself judged by ``_path_ok``):
    distinct group keys ≤ the bounded semi set, regardless of corpus
    size — the bm25_batch shape (postings semi-filtered to the
    broadcast query-term list BEFORE the df-per-term aggregate)."""
    for n in _walk(agg):
        if n.nodeName() != "Join":
            continue
        head = n.simpleString(1000)
        if "LeftSemi" not in head:
            continue
        if not all(f"{k}#" in head for k in keys):
            continue
        right = _jlist(n.children())[1]
        if _path_ok(right, False, False):
            return True
    return False


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
