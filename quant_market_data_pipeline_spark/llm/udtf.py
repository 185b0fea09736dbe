"""Python UDTF surface (Spark 4): table functions for text expansion.

UDTFs complete the engine's Python-extension trio (scalar pandas_udf,
grouped applyInPandas*, table-valued udtf).  They run Python per row-batch
— the slow path by design — so the built-in ``explode(split(...))``
composition stays the default; a UDTF earns its cost only when the
expansion logic needs real Python (a tokenizer library, a parser).  The
sentence splitter below keeps deliberately simple regex semantics so the
DuckDB oracle can replicate it exactly.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx: int, sentence: string, n_words: int")
class SentenceSplit:
    """One row per sentence: split on '.' followed by whitespace.

    Empty fragments are dropped; ``sentence_idx`` is 1-based in document
    order.  Registered per-session via ``register_udtfs``; used in SQL as
    ``LATERAL sentence_split(text)``.
    """

    def eval(self, text: str):  # noqa: A002 - Spark UDTF contract
        if text is None:
            return
        idx = 0
        for frag in re.split(r"\.\s+", text):
            frag = frag.strip()
            if not frag:
                continue
            idx += 1
            yield idx, frag, len(frag.split())


def register_udtfs(spark) -> None:
    """Idempotent session registration of the engine's UDTFs."""
    spark.udtf.register("sentence_split", SentenceSplit)
