"""E2 SQL-front-door parity sweep (round-7, VERDICT r6 next-round #3).

Every declared query has two faces: the DataFrame builder (E1, the
graded face) and the ``sparketl.dialect.sql`` text front door (E2).
This sweep runs a representative batch of declared queries AS SQL TEXT
through the Presto->Spark translator against the registered fixture
views and asserts canonical-frame equality (sorted columns, sorted
string-rendered rows — the driver's own compare) with the DataFrame
face at sf0.001.

The SQL text used is each query's ORACLE string: it is ANSI-portable
by construction (DuckDB executes it), and feeding it through
``translate()`` exercises the dialect layer end-to-end (identifier
quoting, function rewrites, subscripts) on real multi-clause queries
rather than single-expression probes.  Queries whose oracle leans on
DuckDB-only surface (list_*, generate_series-in-FROM, recursive CTEs,
QUALIFY, materialized CTE hints, epoch_us, strftime...) are not
SQL-portable by design and stay covered by test_dialect.py's targeted
execution tests; PARITY_QUERIES below is the frozen portable set —
102 queries spanning scans, predicates, joins, aggregates, grouping
sets, windows, set ops, strings, datetimes, math, arrays, JSON,
event-time, TPC-H shapes and dedup (visible at module import so
coverage drift fails loudly: a renamed or deleted query breaks the
parametrize list).

The round-7 sweep that produced this list found one real dialect gap,
now fixed and covered here via str_basic: Spark's two-arg
ltrim/rtrim takes (trimStr, string) — REVERSED from Presto/ANSI
(string, chars) — so the translator rewrites to
TRIM(LEADING/TRAILING chars FROM s).  One documented divergence keeps
tpch_q22_dormant_customers out of the list: Spark parses the literal
`100.0` as DECIMAL(4,1) (as Presto does) so `bigint_sum / 100.0`
yields DECIMAL, while the DataFrame face and DuckDB produce DOUBLE —
equal values, different canonical rendering.  The SQL face is the
Presto-faithful one there.
"""

from __future__ import annotations

import pytest

from sparketl import dialect, registry
from sparketl.oracle import canonical_frame
from sparketl.tables import load_tables
from tests.conftest import SF_SMOKE_DIR

PARITY_QUERIES = [
    "agg_basic_grouped",
    "agg_bivariate",
    "agg_bool",
    "agg_count_if",
    "agg_counts",
    "agg_cube_rollup",
    "agg_filter_clause",
    "agg_geometric_mean",
    "agg_grouping_sets",
    "agg_having",
    "agg_linear_regression",
    "agg_moments",
    "approx_count_distinct",
    "approx_hll_sketch_merge",
    "cond_case_coalesce",
    "distinct_projection",
    "filter_where",
    "flagship_q1_pricing_summary",
    "funnel_conversion",
    "join_broadcast_dim",
    "join_cross",
    "join_full_outer",
    "join_inner_hash",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_range_interval",
    "join_right_outer",
    "join_skew_salted",
    "join_star_multiway",
    "join_theta_nonequi",
    "limit_offset",
    "llm_dedup_exact",
    "llm_dedup_incremental",
    "math_exp_log",
    "math_mod_sign",
    "math_nan_inf",
    "math_trig",
    "num_decimal_exact",
    "numeric_histogram",
    "path_bigrams",
    "pred_between_in_like",
    "pred_comparison_boolean",
    "pred_null_safe",
    "proj_compute",
    "scan_parquet_full",
    "scan_predicate_pushdown",
    "scan_projection_pruning",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union_all",
    "set_union_distinct",
    "sink_bucketed_colocated_join",
    "sink_compacted_files",
    "sink_parquet_partitioned",
    "sink_partition_overwrite_dynamic",
    "sort_global_topn",
    "source_csv",
    "source_csv_malformed",
    "source_jsonlines",
    "source_orc_roundtrip",
    "source_text_roundtrip",
    "str_basic",
    "str_codepoints",
    "stream_dedup",
    "stream_kafka_roundtrip",
    "stream_static_enrich",
    "stream_watermark_late_drop",
    "struct_row_access",
    "tpch_q10_returns",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_cust_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_order",
    "tpch_q19_disjunctive_join",
    "tpch_q20_nested_in",
    "tpch_q21_waiting_supplier",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_exists",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "try_expr",
    "udf_grouped_agg_pandas",
    "udf_grouped_map_apply",
    "udf_map_in_pandas",
    "udf_pandas_scalar",
    "udf_sql_registered",
    "win_first_last_nth",
    "win_lag_lead",
    "win_ntile",
    "win_percent_rank_cume_dist",
    "win_rank_dense_rank",
    "win_row_number",
    "win_running_sum",
    "win_sliding_frames",
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    load_tables(spark, SF_SMOKE_DIR)


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_sql_front_door_matches_dataframe_face(spark, name):
    osql = registry.ORACLES[name]
    got = dialect.sql(spark, osql).toPandas()
    want = registry.QUERIES[name](spark, SF_SMOKE_DIR).toPandas()
    assert sorted(got.columns) == sorted(want.columns), name
    assert canonical_frame(got) == canonical_frame(want), name


# ---------------------------------------------------------------------------
# Round-8 (VERDICT r7 #4): NATIVE Presto-text faces for the families
# whose oracles are DuckDB-only (arrays, maps, JSON, approx, URL, bit
# ops).  The SQL in sparketl.presto_faces is what a user of the
# reference tool actually has in their pipeline repo — ARRAY[...]
# literals, MAP(ARRAY, ARRAY), element_at, map_agg/set_agg,
# approx_most_frequent, url_extract_*, bitwise_* — replayed through
# the translator and compared to the DataFrame face (exact canonical
# equality by default; subset / tolerance modes documented per face).

from sparketl.presto_faces import FACE_MODE, PRESTO_FACES  # noqa: E402


@pytest.mark.parametrize("name", sorted(PRESTO_FACES))
def test_presto_native_face_matches_dataframe_face(spark, name):
    got = dialect.sql(spark, PRESTO_FACES[name]).toPandas()
    want = registry.QUERIES[name](spark, SF_SMOKE_DIR).toPandas()
    mode = FACE_MODE.get(name, "exact")
    if mode == "exact":
        assert sorted(got.columns) == sorted(want.columns), name
        assert canonical_frame(got) == canonical_frame(want), name
    elif mode.startswith("subset:"):
        cols = mode.split(":", 1)[1].split(",")
        assert canonical_frame(got[cols]) == canonical_frame(want[cols]), name
    elif mode == "tolerance":
        ap50 = float(got["ap50"].iloc[0])
        exact = float(want["exact_p50"].iloc[0])
        assert abs(ap50 - exact) <= 0.02 * exact, name
    else:  # pragma: no cover - registry typo guard
        raise AssertionError(f"unknown FACE_MODE {mode!r} for {name}")


def test_presto_faces_cover_only_declared_queries():
    unknown = set(PRESTO_FACES) - set(registry.QUERIES)
    assert not unknown, f"faces for unregistered queries: {unknown}"
    assert set(FACE_MODE) <= set(PRESTO_FACES)
