"""Python UDTFs (user-defined TABLE functions) — the row→rows surface.

Completes the §2.11 function-kind matrix next to scalar pandas_udf,
grouped map, and grouped agg (functions.pandas_udfs): a UDTF is the
lateral-join generator shape (one input row → N output rows), the
Python escape hatch when the fan-out logic doesn't fit posexplode over
a constructible array.

This one DOES fit an array expression (queries_window.
q_posexplode_tokens is the codegen'd equivalent) — which is exactly
why it makes a good conformance subject: the UDTF and the pure-column
form must emit identical rows, and the DuckDB oracle checks the UDTF
path end-to-end.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string", useArrow=True)
class WordNGrams:
    """Emit (position, word-n-gram) for every n-gram in the text.

    Arrow-optimized (``useArrow=True``): rows move through the UDTF as
    Arrow batches (ArrowEvalPythonUDTF), not per-row pickling — the same
    batch-transfer discipline as the pandas UDF surface."""

    def eval(self, text: str, n: int):  # noqa: D102 - UDTF contract
        toks = [t for t in (text or "").split(" ") if t]
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])
