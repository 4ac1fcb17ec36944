"""Portable deterministic hashing.

MinHash / SimHash / fingerprint operators need a hash function that yields
IDENTICAL values in Spark and in the DuckDB oracle, so the engine-agnostic
primitive is a character-level polynomial rolling hash

    h(s) = foldl1( (acc, c) -> (acc*31 + ascii(c)) mod P )  over chars of s

with P = 1e9+7. Everything downstream (minhash permutations, simhash bit
draws, band hashes) is integer arithmetic on h(s), expressible as column
expressions in both dialects. Spark-side expressions stay inside
whole-stage codegen (no Python).
"""

from __future__ import annotations

MOD = 1_000_000_007
MERSENNE = (1 << 61) - 1  # permutation modulus

# (a, b) parameters for k=16 minhash permutations h_i(x) = (a*x + b) % MERSENNE
# Fixed constants (seeded offline) — not generated at runtime, so both
# engines and every run agree.
MINHASH_PERMS: tuple[tuple[int, int], ...] = tuple(
    (2 * i + 3, 1_000_003 * (i + 1) + 7) for i in range(16)
)
N_BANDS = 4
ROWS_PER_BAND = 4

SIMHASH_BITS = 32


def char_hash_sql(col: str, dialect: str) -> str:
    """Polynomial char hash of a string column; identical value both dialects."""
    if dialect == "spark":
        return (
            f"aggregate(transform(split({col}, ''), c -> CAST(ascii(c) AS BIGINT)), "
            f"CAST(NULL AS BIGINT), "
            f"(acc, x) -> CASE WHEN acc IS NULL THEN x ELSE (acc * 31 + x) % {MOD} END)"
        )
    if dialect == "duckdb":
        return (
            f"list_reduce(list_transform(string_split({col}, ''), "
            f"c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc * 31 + x) % {MOD})"
        )
    raise ValueError(dialect)


def minhash_perm_sql(hash_col: str, i: int) -> str:
    """i-th permuted hash of an already-hashed shingle (dialect-neutral)."""
    a, b = MINHASH_PERMS[i]
    return f"(({a} * {hash_col} + {b}) % {MERSENNE})"


def band_hash_sql(minhash_cols: list[str]) -> str:
    """Combine one band's minhashes into a single bucket key (dialect-neutral)."""
    expr = minhash_cols[0]
    for c in minhash_cols[1:]:
        expr = f"(({expr}) * 31 + ({c})) % {MOD}"
    return expr


def simhash_bit_sql(hash_col: str, bit: int) -> str:
    """Deterministic ±1 draw for simhash bit `bit` from a token hash."""
    # mix with a distinct odd multiplier per bit, take parity
    a = 2 * bit + 3
    return f"CASE WHEN (({a} * {hash_col}) % {MOD}) % 2 = 0 THEN 1 ELSE -1 END"


def char_hash_py(s: str) -> int:
    """Python twin of char_hash_sql for UDF-side parity tests."""
    acc = None
    for ch in s:
        o = ord(ch)
        acc = o if acc is None else (acc * 31 + o) % MOD
    return acc if acc is not None else 0
