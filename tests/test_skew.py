"""Skew utilities: salted results must equal unsalted exactly."""

import pandas as pd
from pyspark.sql import functions as F

from osm_lib_spark.operators.skew import salted_join, two_level_agg, with_salt


def _hot_key_df(spark):
    # one pathologically hot key (90% of rows) + uniform tail
    hot = spark.range(9000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    tail = spark.range(1000).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(tail)


def test_two_level_agg_equals_plain(spark):
    df = _hot_key_df(spark)
    plain = (
        df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        two_level_agg(
            df,
            ["k"],
            partial_aggs=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
            final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            salt=16,
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)


def test_two_level_collect_list(spark):
    """Holistic agg through salting: partial collect, final flatten."""
    df = _hot_key_df(spark)
    salted = two_level_agg(
        df,
        ["k"],
        partial_aggs=[F.collect_list("v").alias("pl")],
        final_aggs=[F.array_sort(F.flatten(F.collect_list("pl"))).alias("vals")],
        salt=8,
    )
    plain = df.groupBy("k").agg(F.array_sort(F.collect_list("v")).alias("vals"))
    got = {r.k: r.vals for r in salted.collect()}
    exp = {r.k: r.vals for r in plain.collect()}
    assert got == exp


def test_salted_join_equals_plain(spark):
    large = _hot_key_df(spark)
    small = spark.createDataFrame(
        [(7, "hot"), (3, "cold"), (99, "absent-from-large")], "k long, label string"
    )
    plain = (
        large.join(small, "k")
        .toPandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    salted = (
        salted_join(large, small, "k", salt=8)
        .select(*plain.columns)
        .toPandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)


def test_salt_is_deterministic(spark):
    df = _hot_key_df(spark)
    a = with_salt(df, 16).toPandas().sort_values(["k", "v"]).reset_index(drop=True)
    b = with_salt(df, 16).toPandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["_salt"].nunique() > 8  # actually spreads
