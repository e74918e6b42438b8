"""sparketl — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capability surface of a Presto-style
batch ETL tool (reference: Capricorn-q/presto-etl-tool; the reference
checkout is an empty repository — see SURVEY.md §0 — so the contract is
SURVEY.md §2's 146-operator inventory, graded against a DuckDB oracle).

Design stance (SURVEY.md §7): declarative wrappers over DataFrame /
Spark SQL. No custom IR, no custom Catalyst rules — Catalyst already
provides predicate pushdown, column pruning, join reordering, AQE and
whole-stage codegen for every operator in the inventory (SURVEY.md §4.1).

Scale stance: every operator is written for a 1000-executor / 100 TB
deployment even though tests run on local[32]:
  * dimension tables are broadcast, fact-fact joins shuffle on keys,
  * no driver-side ``collect()`` inside any operator,
  * quadratic algorithms (brute-force similarity) ship with a documented
    LSH / bucketed alternative,
  * sinks are directory-partitioned for partition pruning.
"""

from sparketl.registry import QUERIES, ORACLES, query
from sparketl.session import get_spark, configure_session
from sparketl.tables import load_tables, table

__all__ = [
    "QUERIES",
    "ORACLES",
    "query",
    "get_spark",
    "configure_session",
    "load_tables",
    "table",
]
