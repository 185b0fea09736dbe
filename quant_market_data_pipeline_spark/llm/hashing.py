"""Deterministic hashing primitives for dedup & LSH — the md5 trick.

MinHash, SimHash and random-hyperplane LSH all need a family of pseudo-
random hash functions.  The engine derives every one of them from ``md5``
over a seeded input (``md5(seed || '|' || value)``): md5 hex strings are
bit-identical in Spark and DuckDB, so the whole randomized-algorithm
family is reproducible AND oracle-checkable — no RNG state, no UDFs, no
seed files.  MinHash minimizes over the first 60 hash bits read as a
BIGINT (``seeded_md5_long`` — numeric so the aggregate stays in
HashAggregate and the signature shuffle carries 8-byte longs); sign bits
come from the first hex nibble (>= '8' = top bit set, an unbiased
Bernoulli(1/2)).

Everything returns Column expressions over built-ins: explode/groupBy for
the signature aggregation is the only shuffle, and it's on doc_id —
perfectly parallel at 100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_tokens(text: Column | str) -> Column:
    """Whitespace tokens, no empties (== DuckDB regexp_extract_all '\\S+')."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-grams joined by single spaces; empty array when < n tokens.

    Guarded: Spark's ``sequence(1, 0)`` counts DOWN, so short docs must
    short-circuit to an empty array instead.
    """
    count = F.size(tokens) - (n - 1)
    make = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.when(count >= 1, make).otherwise(F.array().cast("array<string>"))


def seeded_md5(seed: int | str, value: Column) -> Column:
    """The hash family: md5 of '<seed>|<value>' (hex string)."""
    return F.md5(F.concat(F.lit(f"{seed}|"), value))


def seeded_md5_long(seed: int | str, value: Column) -> Column:
    """First 60 bits of the seeded md5 as a BIGINT.

    Numeric hashes keep MinHash aggregation in HashAggregate — min over
    strings forces SortAggregate (strings can't live in the fixed-size
    hash-agg buffer), measured ~2x slower cold — and shrink the signature
    shuffle 4x (8-byte longs vs 32-char hex).  15 hex chars = 60 bits
    fits a signed long exactly; DuckDB twin:
    ``('0x' || substr(md5(...), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(seeded_md5(seed, value), 1, 15), 16, 10).cast(
        "long"
    )


def md5_sign(seed: int | str, value: Column) -> Column:
    """±1 from the top bit of the seeded hash (first hex char >= '8')."""
    return F.when(
        F.substring(seeded_md5(seed, value), 1, 1) >= "8", F.lit(1)
    ).otherwise(F.lit(-1))


def minhash_agg_exprs(shingle: Column, k: int = 16) -> list[Column]:
    """k MinHash aggregate expressions: min seeded-md5-long per function.

    Use inside a single ``groupBy(doc).agg(*exprs)`` — one shuffle builds
    the whole signature, and the numeric mins stay in HashAggregate.

    LEGACY family: k md5 calls per shingle occurrence.  The registered
    queries use the mixed family below (one md5 + k modular mixes) —
    16x less hashing CPU on the largest intermediate of the whole dedup
    pipeline; this form is kept as the direct k-independent-hash
    reference implementation.
    """
    return [
        F.min(seeded_md5_long(i, shingle)).alias(f"h{i}") for i in range(k)
    ]


# Largest prime below 2^30: keeps every product in the mix strictly
# inside int64 ((P-1)^2 < 2^60) in BOTH engines — DuckDB RAISES on
# BIGINT overflow where Spark wraps, so the domain must provably fit.
MINHASH_P = 1073741789


def minhash_mix_consts(k: int = 16) -> list[tuple[int, int]]:
    """(a_i, b_i) coefficients of the universal-hash mix family,
    md5-derived Python ints baked as LITERALS into both engines'
    expressions (the EWMA-coefficient discipline): a in [1, P-1],
    b in [0, P-1]."""
    out = []
    for i in range(k):
        a = (
            int(hashlib.md5(f"mh_a|{i}".encode()).hexdigest()[:15], 16)
            % (MINHASH_P - 1)
            + 1
        )
        b = int(hashlib.md5(f"mh_b|{i}".encode()).hexdigest()[:15], 16) % MINHASH_P
        out.append((a, b))
    return out


def minhash_base(shingle: Column) -> Column:
    """The ONE hash per shingle the mixed MinHash family minimizes over:
    seeded 60-bit md5 reduced mod P.  Compute this in a projection
    BEFORE the signature groupBy so the md5 provably evaluates once per
    row (not once per aggregate expression)."""
    return seeded_md5_long("mh", shingle) % MINHASH_P


def minhash_mixed_agg_exprs(base: Column, k: int = 16) -> list[Column]:
    """k MinHash aggregates from the shared base hash: min over
    h_i(s) = (base(s) * a_i + b_i) mod P — the classic universal-hash
    MinHash construction (one strong hash, k cheap mixes).

    Why: the k-independent-md5 family costs k md5 calls per shingle
    OCCURRENCE — the single largest CPU sink in the dedup pipeline at
    corpus scale (measured 16 md5/row = ~2/3 of minhash_lsh_pairs' x16
    doc-scale wall).  The mix replaces 15 of every 16 md5 calls with
    two integer ops, is oracle-expressible verbatim (BIGINT arithmetic
    is exact in both engines), and keeps the min-stability property
    MinHash needs: each h_i is a permutation-ish uniform map of the
    shared base, pairwise-independent across i.
    """
    return [
        F.min((base * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_mix_consts(k))
    ]


def band_hash(sig_cols: list[str], band: int, rows_per_band: int) -> Column:
    """LSH band key: md5 over the band's slice of the signature."""
    lo = band * rows_per_band
    parts = [F.col(c) for c in sig_cols[lo : lo + rows_per_band]]
    return F.md5(F.concat_ws(",", *parts))


def simhash_bit_sums(token: Column, bits: int = 16) -> list[Column]:
    """Per-bit ±1 vote sums for SimHash (aggregate over exploded tokens)."""
    return [
        F.sum(md5_sign(f"b{b}", token)).alias(f"s{b}") for b in range(bits)
    ]


def simhash_from_sums(sum_cols: list[str]) -> Column:
    """Collapse bit-vote sums into the integer fingerprint (bit b set when
    the vote sum is >= 0)."""
    out = F.lit(0)
    for b, c in enumerate(sum_cols):
        out = out + F.when(F.col(c) >= 0, F.lit(2**b)).otherwise(F.lit(0))
    return out


def hamming16(a: Column, b: Column) -> Column:
    """Hamming distance between two fingerprints (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
