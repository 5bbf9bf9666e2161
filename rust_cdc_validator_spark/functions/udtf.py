"""Python UDTF surface (Spark 4): table functions for row-expanding text
operators. The reference has no user-extensible functions (SURVEY.md
§2.11); these demonstrate the lateral-join extension point our engine gets
from PySpark — one input row → many output rows with full SQL composability
(``LATERAL``/``TABLE()`` syntax).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence: string, n_words: int, position: int")
class SplitSentences:
    """Split a document into sentences (naive '.'/'!'/'?' boundaries) with
    per-sentence stats. Usage::

        spark.udtf.register("split_sentences", SplitSentences)
        spark.sql("SELECT d.doc_id, s.* FROM docs d, "
                  "LATERAL split_sentences(d.text) s")
    """

    def eval(self, text: str):
        if not text:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text) if p.strip()]
        for i, p in enumerate(parts):
            yield p, len(p.split()), i


@udtf(returnType="token: string, position: int")
class Tokenize:
    """Whitespace tokenizer as a table function (one row per token)."""

    def eval(self, text: str):
        if not text:
            return
        for i, tok in enumerate(text.split()):
            yield tok, i
