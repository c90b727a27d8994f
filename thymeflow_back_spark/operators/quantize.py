"""Scalar quantization (int8) for embedding columns.

At 100 TB the embedding store, not the similarity math, is the bottleneck:
float32×d per row. Per-vector scalar quantization stores 1 byte per
dimension plus two float parameters — a 4× shrink that keeps recall high
for cosine ranking (the SQ8 scheme of FAISS/IVF literature, computed here
with exact floor arithmetic so results are engine-reproducible).

Encode (per vector, map-side only):
    mn = min(v), mx = max(v), scale = (mx - mn) / 255
    code_i = clamp(floor((v_i - mn) / scale), 0, 255)
Decode (asymmetric search uses the bucket midpoint):
    v'_i = mn + (code_i + 0.5) · scale

Everything is a narrow projection — no shuffle, no UDF; the decode feeds
the same cosine top-k tail as the exact path, so quantized search composes
with broadcast probing, SRP-LSH, or the IVF index unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = 255


def sq8_encode(df: DataFrame, vec_col: str, out_col: str = "codes") -> DataFrame:
    """Add (mn, mx, codes array<int>) quantizing ``vec_col``.

    A constant vector (mx == mn) encodes to all-zero codes and decodes to
    the constant (scale 0 guard).
    """
    return (
        df.withColumn("mn", F.expr(f"cast(array_min({vec_col}) as double)"))
        .withColumn("mx", F.expr(f"cast(array_max({vec_col}) as double)"))
        .withColumn(
            out_col,
            F.expr(
                f"transform({vec_col}, x -> if(mx = mn, 0, "
                f"least({LEVELS}, greatest(0, "
                f"cast(floor((cast(x as double) - mn) * {LEVELS} / (mx - mn)) as int)))))"
            ),
        )
    )


def sq8_decode(df: DataFrame, codes_col: str = "codes", out_col: str = "vec_q") -> DataFrame:
    """Reconstruct array<double> midpoints from (mn, mx, codes)."""
    return df.withColumn(
        out_col,
        F.expr(
            f"transform({codes_col}, c -> if(mx = mn, mn, "
            f"mn + (cast(c as double) + 0.5d) * (mx - mn) / {LEVELS}))"
        ),
    )


def sq8_roundtrip(df: DataFrame, vec_col: str, out_col: str = "vec_q") -> DataFrame:
    """vec -> int8 codes -> midpoint reconstruction, keeping original columns."""
    return sq8_decode(sq8_encode(df, vec_col), out_col=out_col).drop(
        "mn", "mx", "codes"
    )
