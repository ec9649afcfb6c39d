"""Vector expression builders for similarity search (SURVEY §2.11 N2).

Cosine similarity over ``array<double>`` with built-in higher-order
functions — JVM-side, no Python in the loop. The scale path (sign-LSH
bucketing) uses deterministic rational hyperplanes (pure integer
arithmetic scaled to [-1, 1]) so Spark and DuckDB agree bit-for-bit —
no libm (sin/cos) calls whose last-ulp behavior could differ.
"""

from __future__ import annotations

DIM = 64

# --- cosine(a, b), both array<double> --------------------------------------
# Structurally identical sequential folds in both dialects.


def cosine_spark(a: str, b: str) -> str:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    na = f"aggregate(transform({a}, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    nb = f"aggregate(transform({b}, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def cosine_duck(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(range(1, {DIM + 1}), i -> {a}[i] * {b}[i]))"
    na = f"list_sum(list_transform({a}, x -> x * x))"
    nb = f"list_sum(list_transform({b}, x -> x * x))"
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


# --- sign-LSH bucket (8 planes) ---------------------------------------------
# plane[p][i] = (((p*73 + i*37) % 19) - 9) / 9.0, i 0-based — deterministic,
# rational, identical in both engines. Bucket = 8-char sign bitstring.

N_PLANES = 8


def lsh_bucket_spark(e: str) -> str:
    dot = (
        f"aggregate(zip_with({e}, transform(sequence(0, {DIM - 1}), i -> "
        "CAST(((p * 73 + i * 37) % 19) - 9 AS DOUBLE) / 9.0), (x, w) -> x * w), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        f"array_join(transform(sequence(0, {N_PLANES - 1}), p -> "
        f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END), '')"
    )


def lsh_bucket_duck(e: str) -> str:
    dot = (
        f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
        f"{e}[i] * (CAST(((p * 73 + (i - 1) * 37) % 19) - 9 AS DOUBLE) / 9.0)))"
    )
    return (
        f"array_to_string(list_transform(range(0, {N_PLANES}), p -> "
        f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END), '')"
    )


# --- squared L2 distance (PQ, SURVEY §2.11 N58) -----------------------------
# Same sequential-fold structure as cosine above. Both variants are total
# over their inputs' actual length (the Duck range derives from len(a), it
# is NOT fixed to a sub-dim) so the two dialects can never silently
# diverge on a caller passing full-width vectors.


def l2sq_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def l2sq_duck(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
