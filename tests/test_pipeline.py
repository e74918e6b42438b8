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


def test_curation_pipeline_through_tool_layer(spark, tmp_path):
    """The curation flow (quality gate -> exact dedup -> hash split) as
    Pipeline stages with a split-partitioned sink — the tool-layer
    shape of the declared llm_curation_pipeline query.  The written
    train/val tree must contain exactly the docs the declared split
    query assigns."""
    from sparketl.operators.llm import _TOKS_S, _h_spark
    from sparketl.tables import table as _table

    out = str(tmp_path / "curated")
    p = Pipeline("curate")

    @p.step("quality")
    def quality(spark_, ctx):
        d = _table(spark_, SF_DIR, "documents")
        return d.select(
            "doc_id", "lang", "source", "text",
            F.size(F.expr(_TOKS_S)).alias("n_tok"),
            F.size(F.expr(f"array_distinct({_TOKS_S})")).alias("n_distinct"),
        ).where("n_tok >= 5 and (1.0 - cast(n_distinct as double)/n_tok) <= 0.6")

    p.sql(
        "dedup",
        """
        select * from quality
        where doc_id in (select min(doc_id) from quality group by md5(text))
        """,
    )

    @p.step("split")
    def split(spark_, ctx):
        return ctx["dedup"].withColumn(
            "split",
            F.when(
                F.expr(_h_spark("doc_id", "'split'")) % 100 < 90, F.lit("train")
            ).otherwise(F.lit("val")),
        ).select("doc_id", "lang", "source", "split")

    p.write("split", out, partition_by=("split",))
    ctx = p.run(spark)

    import os

    assert {d for d in os.listdir(out) if d.startswith("split=")} == {
        "split=train",
        "split=val",
    }
    back = spark.read.parquet(out)
    want = {(r.doc_id, r.split) for r in ctx["split"].collect()}
    got = {(r.doc_id, r.split) for r in back.collect()}
    assert got == want and len(got) > 0
    # partition pruning: reading one split touches only that directory
    train_only = spark.read.parquet(out).where("split = 'train'")
    assert train_only.count() == sum(1 for _, s in want if s == "train")
