"""Physical-plan audits (SURVEY.md §4, SCALING.md): the optimizations
the 100-TB story depends on must actually appear in the executed plans —
predicate pushdown to the parquet scan, column pruning, broadcast joins
on dimensions, whole-stage codegen on the hot relational path, and no
accidental cartesian products.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from sparketl import registry
from tests.conftest import SF_DIR


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def q(spark):
    def build(name: str):
        return registry.QUERIES[name](spark, SF_DIR)

    return build


def test_predicate_pushdown_reaches_scan(q):
    plan = plan_str(q("scan_predicate_pushdown"))
    assert "PushedFilters: [" in plan
    # at least one real filter pushed (not an empty list)
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), plan


def test_projection_pruning_reaches_scan(q):
    plan = plan_str(q("scan_projection_pruning"))
    # lineitem has 11 columns; the pruned scan must read far fewer
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert read_schema.count(":") <= 4, read_schema


def test_dimension_joins_broadcast(q):
    for name in ("join_broadcast_dim", "join_star_multiway"):
        plan = plan_str(q(name))
        assert "BroadcastHashJoin" in plan, f"{name}:\n{plan}"
        assert "CartesianProduct" not in plan, name


def test_curation_plans_have_scale_shapes(q):
    """The curation operators' 100-TB claims (SCALING.md) must appear
    in the executed plans: broadcast eval vocabulary + broadcast
    drop-list anti-join, and WindowGroupLimit pushing per-group top-N
    below the shuffle for the sampling/mixing selections."""
    p = plan_str(q("llm_contamination_ngram"))
    assert "BroadcastHashJoin" in p, p
    p = plan_str(q("llm_dedup_apply"))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    p = plan_str(q("llm_dedup_incremental"))
    assert "LeftAnti" in p, p
    for name in ("llm_sample_stratified", "llm_domain_mix"):
        p = plan_str(q(name))
        assert "WindowGroupLimit" in p, f"{name}:\n{p}"


def test_flagship_is_codegen_hash_agg(q):
    df = q("flagship_q1_pricing_summary")
    plan = plan_str(df)
    assert "HashAggregate" in plan
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "PushedFilters: [" in plan
    # whole-stage codegen spans exist — visible only in the FINAL
    # adaptive plan, so execute first (AQE shows 0 subtrees pre-run)
    df.collect()
    final = plan_str(df, mode="simple")
    assert "isFinalPlan=true" in final and "*(1)" in final, final


def test_similarity_topk_broadcasts_queries(q):
    # query set broadcast => corpus streams once, no corpus shuffle
    # (memo cleared so the plan under test is the build, not a cached
    # InMemoryRelation from an earlier test's run)
    from sparketl.operators.llm import clear_ann_eval_memo

    clear_ann_eval_memo()
    plan = plan_str(q("llm_similarity_topk"))
    assert "BroadcastNestedLoopJoin" in plan, plan
    clear_ann_eval_memo()


def test_no_cartesian_outside_declared_cross(spark):
    """Only join_cross (and the broadcast NL joins, which are bounded by
    a broadcast side) may plan a cartesian; everything else must not."""
    offenders = []
    for name, fn in registry.QUERIES.items():
        if name == "join_cross":
            continue
        try:
            plan = plan_str(fn(spark, SF_DIR), mode="simple")
        except Exception:  # plan-time only; runtime covered by oracle gate
            continue
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_bucketed_join_elides_shuffle(spark):
    """Both sides of a fact-fact join on the bucket key read with
    identical HashPartitioning from their bucketed layouts => the join
    itself needs NO Exchange (the 100-TB repeated-join story)."""
    from sparketl.sources.connectors import _bucketed_table
    from sparketl.tables import table

    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    t_o = _bucketed_table(spark, SF_DIR, "orders", o, "o_orderkey")
    t_l = _bucketed_table(spark, SF_DIR, "lineitem", li, "l_orderkey")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_o).join(
            spark.table(t_l),
            spark.table(t_l).l_orderkey == spark.table(t_o).o_orderkey,
        )
        plan = plan_str(joined, mode="simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


DECORRELATION_CASES = [
    # (query, join type Catalyst must rewrite the subquery into)
    ("tpch_q4_priority_exists", "LeftSemi"),     # EXISTS
    ("tpch_q18_large_orders", "LeftSemi"),       # IN (agg-HAVING subquery)
    ("tpch_q20_nested_in", "LeftSemi"),          # nested IN
    ("tpch_q16_supplier_cnt", "LeftAnti"),       # NOT IN (non-null key)
    ("tpch_q22_dormant_customers", "LeftAnti"),  # NOT EXISTS
]


@pytest.mark.parametrize("name,jt", DECORRELATION_CASES)
def test_subqueries_decorrelate(q, name, jt):
    """EXISTS / IN / NOT EXISTS / NOT IN subqueries must compile to
    semi/anti HASH joins (RewritePredicateSubquery), never to per-row
    subquery execution or a cartesian."""
    plan = plan_str(q(name), mode="simple")
    assert jt in plan, f"{name}: expected {jt} join\n{plan}"
    assert "CartesianProduct" not in plan, name


def test_q21_single_pass_aggregate_shape(q):
    """Q21 is hand-decorrelated (round 6): both correlated predicates
    collapse into min/max tests inside ONE per-orderkey aggregation, so
    the plan must contain NO semi/anti join and only the three
    equi-joins of the fused form (lineitem⋈orders, agg⋈supplier) —
    never a per-predicate re-consumption of the fact table."""
    plan = plan_str(q("tpch_q21_waiting_supplier"), mode="simple")
    assert "LeftAnti" not in plan and "LeftSemi" not in plan, plan
    assert "CartesianProduct" not in plan
    # the fact table is scanned exactly once in the fused plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_correlated_scalar_subquery_decorrelates(q):
    """Q17's per-part average must become an aggregate joined on the
    correlation key (RewriteCorrelatedScalarSubquery) — the plan shows
    the avg as a plain HashAggregate feeding a join, and the only
    scalar-subquery nodes allowed are uncorrelated one-row broadcasts."""
    plan = plan_str(q("tpch_q17_small_qty_order"), mode="simple")
    assert "HashAggregate" in plan and "Join" in plan, plan
    assert "CartesianProduct" not in plan


def test_q2_correlated_min_decorrelates(q):
    """Q2's per-part minimum-cost subquery (whose body is itself a
    4-table region-filtered join) must decorrelate into an aggregate
    joined back on partkey — never per-row execution or a cartesian —
    and the nation/region dims must ride in as broadcasts."""
    plan = plan_str(q("tpch_q2_min_cost_supplier"), mode="simple")
    assert "HashAggregate" in plan and "Join" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_q8_star_join_broadcasts_all_dims(q):
    """Q8 joins five dimension tables (nation twice) around the
    lineitem-orders fact chain; every dim side must broadcast so the
    only real shuffle is fact-fact."""
    plan = plan_str(q("tpch_q8_market_share"), mode="simple")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan


def test_q11_threshold_is_uncorrelated_scalar(q):
    """Q11's 2x-mean threshold must plan as a one-row uncorrelated
    subquery feeding a filter over the grouped CTE — one aggregate
    pass reused, not a join explosion."""
    plan = plan_str(q("tpch_q11_important_stock"), mode="simple")
    assert "Subquery" in plan or "subquery" in plan, plan
    assert "CartesianProduct" not in plan


def test_theta_join_keeps_equi_prefix(q):
    """The theta join's nation equi-prefix must make it a hash or
    sort-merge join with the balance residual as the join condition —
    NOT a nested-loop over the full cross space."""
    plan = plan_str(q("join_theta_nonequi"), mode="simple")
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_partitioned_sink_read_prunes_partitions(spark):
    """Static partition pruning on the partitioned-sink re-read: a
    status filter must land in the scan's PartitionFilters (directory
    pruning — the point of partitionBy), not the data filter."""
    from sparketl.sources.connectors import _scratch_dir
    from sparketl.tables import table
    from pyspark.sql import functions as F

    orders = table(spark, SF_DIR, "orders")
    path = _scratch_dir(SF_DIR, "orders_by_status_plans")
    (
        orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = plan_str(back)
    assert "PartitionFilters: [" in plan, plan
    pruned = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderstatus" in pruned, plan


def test_bloom_prefilter_plan_shape(q):
    """The bloom pre-filter's 100-TB claims: the bitmap rides into a
    BROADCAST hash join (never a shuffle of the batch by word_idx),
    the documents scans read only (doc_id, text), and the batch/known
    split predicates are pushed into the parquet scans."""
    plan = plan_str(q("llm_dedup_bloom_prefilter"))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    for read_schema in plan.split("ReadSchema: ")[1:]:
        cols = read_schema.splitlines()[0]
        assert cols.count(":") <= 2, cols  # doc_id + text only
    pushed = [
        p.split("]", 1)[0] for p in plan.split("PushedFilters: [")[1:]
    ]
    assert any(p.strip() for p in pushed), plan


def test_unigram_nll_plan_shape(q):
    """NLL: the corpus-total join must be a broadcast of the one-row
    aggregate (a nested-loop over a 1-row build side, never an
    exchange of the token stream for a scalar), and aggregation is
    partial (map-side combine) before the word shuffle."""
    plan = plan_str(q("llm_unigram_nll"))
    assert (
        "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    ), plan
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower(), plan


def test_round7_operator_plan_shapes(q):
    """The round-7 operators' 100-TB claims must appear in the plans:
    semantic dedup's verdict join broadcasts the drop list (corpus
    never shuffles/sorts for the left-outer), kmeans' recompute is a
    partial (map-side-combined) hash aggregate over a literal-codebook
    narrow map, and the classifier plan contains no join or window —
    one round-robin spread plus the scan, nothing else."""
    p = plan_str(q("llm_semantic_dedup"))
    assert "BroadcastHashJoin" in p and "LeftOuter" in p, p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p, p
    p = plan_str(q("llm_kmeans_iterate"))
    assert "HashAggregate" in p and "partial_" in p, p
    assert "Join" not in p, p
    p = plan_str(q("llm_quality_classifier"))
    assert "Join" not in p and "Window" not in p, p
    assert "ROUND_ROBIN" in p or "RoundRobin" in p, p


def test_ann_session_caches_are_weak(spark):
    """ADVICE r14 #5: the ANN memo/codebook caches key a
    WeakKeyDictionary on the SparkSession so entries die with their
    session — a plain id(spark) dict both pinned dead sessions and
    risked id-reuse collisions."""
    import weakref

    from sparketl.operators import llm_ann

    assert isinstance(llm_ann._ANN_EVAL_MEMO, weakref.WeakKeyDictionary)
    assert isinstance(llm_ann._CEN_CACHE, weakref.WeakKeyDictionary)
    # the session in use is a valid weak key and round-trips
    llm_ann._ANN_EVAL_MEMO.setdefault(spark, {})["probe"] = None
    assert "probe" in llm_ann._ANN_EVAL_MEMO[spark]
    del llm_ann._ANN_EVAL_MEMO[spark]["probe"]
