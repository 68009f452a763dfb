"""Scale-path operators: salted joins preserve semantics while spreading
hot keys; co-bucketed tables join without exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.operators.skew import (
    salted_join,
    write_bucketed,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    # synthetic skew: one hot key carries half the fact rows
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "skew_key",
        F.when(F.col("l_linenumber") % 2 == 0, F.lit(1))
         .otherwise(F.col("l_orderkey")))
    dim = (li.select(F.col("skew_key")).distinct()
             .withColumn("dim_payload", F.col("skew_key") * 10))
    plain = (li.join(dim, "skew_key")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("dim_payload").alias("s")).first())
    salted = (salted_join(li, dim, "skew_key", n_salt=8)
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("dim_payload").alias("s")).first())
    assert (plain.n, plain.s) == (salted.n, salted.s)
    # hot-key rows survive the salting intact (1 dim match per fact row)
    hot_rows = li.filter(F.col("skew_key") == 1).count()
    spread = (salted_join(li, dim, "skew_key", n_salt=8)
              .filter(F.col("skew_key") == 1).count())
    assert spread == hot_rows > 0


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem") \
            .select("l_orderkey", "l_quantity")
        orders = load_table(spark, sf_dir, "orders") \
            .select("o_orderkey", "o_totalprice")
        write_bucketed(li, "bkt_lineitem", "l_orderkey", 8)
        write_bucketed(orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                       "bkt_orders", "l_orderkey", 8)
        joined = spark.table("bkt_lineitem").join(
            spark.table("bkt_orders"), "l_orderkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: co-bucketed join returns the same rows as the plain join
        assert joined.count() == li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
