"""Delta + zigzag coding as window/column functions (SURVEY W1-W4, F4).

The reference's codecs delta-code ids/coordinates/refs against the
previous value within a block (VexOutput.java:51-59,139-162,
PBFOutput.java:205-216) and zigzag-map signed deltas to unsigned
varints (serializer/VarInt.java:57-75). The engine stores materialized
values (Parquet's DELTA_BINARY_PACKED does the byte-level work), but
the TRANSFORMS themselves are still useful operators — e.g. building
byte-exact export blocks — and map exactly onto window functions:

    encode:  delta_i = v_i − lag(v) over (partition by block order by seq)
             (first row of a block carries the full value — the
             per-block reset of VexInput.java:102-108)
    decode:  v_i = sum(delta) over (partition by block order by seq
                                    rows unbounded preceding)

Zigzag is pure bit arithmetic: z = (n << 1) XOR (n >> 63) and back
n = (z >>> 1) XOR −(z & 1) — Column expressions, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def delta_encode(
    df: DataFrame, value_col: str, block_col: str, order_col: str, out_col: str = "delta"
) -> DataFrame:
    """Per-block delta encoding; the block's first row keeps its value."""
    w = Window.partitionBy(block_col).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    return df.withColumn(
        out_col,
        F.when(prev.isNull(), F.col(value_col)).otherwise(F.col(value_col) - prev),
    )


def delta_decode(
    df: DataFrame, delta_col: str, block_col: str, order_col: str, out_col: str = "value"
) -> DataFrame:
    """Inverse: running sum of deltas within the block."""
    w = (
        Window.partitionBy(block_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(delta_col).over(w))


def zigzag_encode(n: Column) -> Column:
    """Signed → unsigned-style mapping (VarInt.java:57-66): small
    magnitudes (either sign) become small non-negatives."""
    return F.shiftleft(n, 1).bitwiseXOR(F.shiftright(n, 63))


def zigzag_decode(z: Column) -> Column:
    """Inverse (VarInt.java:68-75): (z >>> 1) XOR −(z & 1)."""
    return F.shiftrightunsigned(z, 1).bitwiseXOR(-(z.bitwiseAND(F.lit(1))))
