"""Python UDTFs (Spark 4 table functions) — the SQL-callable face of
the one-row-to-many-rows extension surface.

The reference's record parsers are generator functions (1 XML file →
many record dicts, SURVEY.md §2.10 D1: sra/extract.py:608,
etl/pubmed.py:89-96); this repo implements those with ``mapInPandas``
(sources/xml_extract.py). A Python UDTF is the same contract exposed
to SQL users: ``SELECT t.* FROM docs, LATERAL chunk_text(doc_id,
text)`` — registered per-session, usable wherever Spark SQL is.

Arrow-batched (``useArrow=True``): rows move JVM↔Python in columnar
batches, not pickled one at a time. Still the Python path — built-in
expressions beat it where they can express the op (dedup.shingles
does shingling with ``transform``/``explode`` JVM-side); a UDTF earns
its cost when the expansion is genuinely imperative (stateful parsers,
tokenizers with carry-over), which fixed-overlap chunking models.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

CHUNK_WINDOW = 50
CHUNK_STRIDE = 40


@udtf(
    returnType="doc_id bigint, chunk_id int, chunk string, n_chunk_tokens int",
    useArrow=True,
)
class ChunkText:
    """Overlapping fixed-size token chunks — the LLM-training prep
    step that slices documents into model-context-sized pieces with
    ``CHUNK_WINDOW - CHUNK_STRIDE`` tokens of overlap. Start positions
    are 0, stride, 2·stride, … while < n_tokens; the final chunk may
    be short (never empty); empty/whitespace docs yield no rows."""

    def eval(self, doc_id: int, text: str):
        toks = [t for t in (text or "").split(" ") if t]
        start = 0
        chunk_id = 0
        while start < len(toks):
            piece = toks[start : start + CHUNK_WINDOW]
            yield doc_id, chunk_id, " ".join(piece), len(piece)
            chunk_id += 1
            start += CHUNK_STRIDE


def register_udtfs(spark: SparkSession) -> list[str]:
    """Register all UDTFs on the session; returns the SQL names."""
    spark.udtf.register("chunk_text", ChunkText)
    return ["chunk_text"]
