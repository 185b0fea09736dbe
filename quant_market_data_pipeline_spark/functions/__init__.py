"""Public column-function surface of the engine.

One import point for the reusable Column-level building blocks scattered
across the operator/LLM modules — the pieces a user composes into their
own queries (everything is a JVM-side built-in composition; no UDFs):

- text/hashing: tokenization, shingling, the seeded-md5 hash family that
  makes MinHash/SimHash/LSH deterministic and oracle-checkable;
- time: tumbling-bucket floor (the scalar twin of ``F.window``);
- vectors: cosine similarity over ``array<float>`` columns;
- exact: cross-engine order-insensitive money/avg aggregates (decimal
  internally, double at the boundary — see functions/exact.py).
"""

from quant_market_data_pipeline_spark.functions.exact import (  # noqa: F401
    fin,
    money,
    money_avg,
    money_sum,
    one_minus,
    one_plus,
)
from quant_market_data_pipeline_spark.llm.hashing import (  # noqa: F401
    band_hash,
    hamming16,
    md5_sign,
    minhash_agg_exprs,
    seeded_md5,
    simhash_bit_sums,
    simhash_from_sums,
    word_shingles,
    word_tokens,
)
from quant_market_data_pipeline_spark.llm.similarity import (  # noqa: F401
    as_double,
    cosine,
    dot,
    norm,
)
from quant_market_data_pipeline_spark.llm.text import (  # noqa: F401
    normalized_text,
    tokens_column,
)
from quant_market_data_pipeline_spark.operators.bars import (  # noqa: F401
    floor_bucket,
)

__all__ = [
    "band_hash",
    "as_double",
    "cosine",
    "dot",
    "norm",
    "fin",
    "money",
    "money_avg",
    "money_sum",
    "one_minus",
    "one_plus",
    "floor_bucket",
    "hamming16",
    "md5_sign",
    "minhash_agg_exprs",
    "normalized_text",
    "seeded_md5",
    "simhash_bit_sums",
    "simhash_from_sums",
    "tokens_column",
    "word_shingles",
    "word_tokens",
]
