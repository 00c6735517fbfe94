"""Python UDTFs (table functions) — the LATERAL-join face of the UDF
surface.

`TokenChunks` emits overlapping fixed-size token windows per document —
the RAG-chunking shape as a SQL-callable table function:

    SELECT d.doc_id, c.* FROM documents d,
           LATERAL token_chunks(d.text, 32, 16) c

Arrow-optimized (`useArrow=True`: rows cross the Python boundary in
Arrow batches, not pickled one at a time), but still a per-row Python
``eval`` — this module exists for API-surface completeness (UDTF +
lateral correlation) and ad-hoc exploration. The PRODUCTION chunker is
`doc_chunks` in the query catalog: the same semantics as pure codegen
``sequence``/``slice``/``transform`` expressions, zero Python. Both are
registered and oracle-checked against the same DuckDB twin, so the
equivalence is pinned, not asserted.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

__all__ = ["TokenChunks", "register_udtfs"]


@udtf(returnType="start int, n_tokens int, chunk string", useArrow=True)
class TokenChunks:
    """(start, n_tokens, chunk) for every ``step``-strided window of
    ``size`` whitespace tokens; a doc shorter than ``size`` yields its
    whole token list as one chunk (start 0)."""

    def eval(self, text: str, size: int, step: int):
        if text is None or size is None or step is None or size < 1 or step < 1:
            return
        toks = text.split()
        if not toks:
            return
        for s in range(0, max(len(toks) - size + 1, 1), step):
            window = toks[s : s + size]
            yield s, len(window), " ".join(window)


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register every UDTF under its SQL name."""
    spark.udtf.register("token_chunks", TokenChunks)
