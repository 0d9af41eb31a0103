"""Python user-defined TABLE functions (Spark 4 `@udtf`) — the row→rows
extension seam of the function surface.

The reference's extension point is scalar-only (a Faker formatter returns
ONE value per row — src/Anonymizer.php:53-58); Spark's UDTF generalizes it
to set-returning functions usable in the FROM clause with LATERAL
correlation. This module demonstrates the full contract (class-based UDTF,
typed returnType, per-row yield, LATERAL join in SQL) on a word-n-gram
expander.

Honesty about the hot path: a Python UDTF is the row-at-a-time slow path.
The engine's PRODUCTION n-gram machinery is codegen'd JVM array algebra
(operators/dedup.py shingles, chunk_docs_for_rag's stride-sequence slices)
— use a UDTF only for logic the Column algebra genuinely can't express;
this one exists to certify the API seam end-to-end against an exact oracle.

Tokenization matches the repo convention (doc_top_terms: lower → split on
ASCII whitespace runs → drop empties) so UDTF output is comparable with the
JVM-side text family. `flags=re.ASCII` pins Python's `\\s` to the ASCII set
the SQL twins use — default Python `\\s` is Unicode-wide and would tokenize
NBSP-bearing fuzz docs differently from both engines.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_WS = re.compile(r"\s+", flags=re.ASCII)


@udtf(returnType="pos int, ngram string")
class WordNgramsUDTF:
    """(pos, ngram) for every word n-gram of ``text``; 1-based positions.

    eval() is called once per input row; each yield emits one output row.
    NULL text yields nothing (SQL-conformant empty correlation).
    """

    def eval(self, text: str, n: int):  # noqa: D102 — contract method
        if text is None or n is None or n < 1:
            return
        toks = [t for t in _WS.split(text.lower()) if t]
        for i in range(len(toks) - n + 1):
            yield i + 1, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Idempotently register the module's UDTFs for SQL use."""
    spark.udtf.register("word_ngrams", WordNgramsUDTF)
