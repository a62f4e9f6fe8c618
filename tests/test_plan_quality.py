"""Physical-plan quality gates: the properties that matter at 100 TB.

These assert what `.explain` shows — filters reaching the parquet scan
(PushedFilters), column pruning (ReadSchema), broadcast joins for dims,
and no Python row-at-a-time UDFs (only ArrowEvalPython / codegen stages)
— so a regression that silently de-optimizes a plan fails CI, not a
production run.
"""

from pyspark.sql import functions as F

from entity_linking_spark.queries import queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark, sf_dir):
    df = queries()["filter_truncate"](spark, sf_dir)
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert scan, plan
    assert "lang" in scan[0]  # the IN ('en','de') predicate reached the scan


def test_column_pruning(spark, sf_dir):
    df = queries()["entity_freq"](spark, sf_dir)
    plan = _plan(df)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    # only the grouping column is read, not the whole orders table
    assert "o_orderstatus" in rs
    assert "o_totalprice" not in rs


def test_dim_join_broadcasts(spark, sf_dir):
    df = queries()["dict_lookup_coalesce"](spark, sf_dir)
    assert "BroadcastHashJoin" in _plan(df)


def test_no_row_at_a_time_python(spark, sf_dir):
    # pair_scores_jw uses the Jaro-Winkler UDF: must be Arrow-batched
    # (ArrowEvalPython), never BatchEvalPython (per-row pickling)
    df = queries()["pair_scores_jw"](spark, sf_dir)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(queries()["semi_join_pages"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_agg_has_map_side_combine(spark, sf_dir):
    # AQE's printed plan omits codegen stars pre-finalization, so assert
    # the scale property directly: a partial (map-side) aggregate runs
    # before the exchange — the shuffle carries combined rows, not raw ones
    plan = _plan(queries()["pricing_summary"](spark, sf_dir))
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # partial below exchange in tree print
