"""Pipeline layer test (SURVEY.md §3.3): read → transform (DataFrame +
SQL steps) → partitioned sink → re-read round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.pipeline import Pipeline
from sparketl.tables import table

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "revenue_by_nation")
    p = Pipeline("revenue_by_nation")

    @p.step("line_revenue")
    def line_revenue(spark_, ctx):
        li = table(spark_, SF_DIR, "lineitem")
        o = table(spark_, SF_DIR, "orders")
        c = table(spark_, SF_DIR, "customer")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select(
                "c_nationkey",
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            )
        )

    p.sql(
        "by_nation",
        """
        select c_nationkey, round(sum(rev), 2) as revenue, count(*) as n
        from line_revenue
        group by c_nationkey
        """,
    )
    p.write("by_nation", out, partition_by=("c_nationkey",))

    ctx = p.run(spark)
    assert set(ctx) == {"line_revenue", "by_nation"}

    back = spark.read.parquet(out)
    want = {r.c_nationkey: (r.revenue, r.n) for r in ctx["by_nation"].collect()}
    got = {r.c_nationkey: (r.revenue, r.n) for r in back.collect()}
    assert got == want and len(got) > 0
    # partitioned layout actually produced (pruning-capable sink)
    import os

    assert any(d.startswith("c_nationkey=") for d in os.listdir(out))
