"""Physical-plan audits: the scale properties SURVEY.md §4 promises.

Correctness tests prove the operators compute the right answer;
these prove they compute it with the plan we'd want at 100 TB.
"""

from __future__ import annotations

from cdc_plg_spark import registry
from cdc_plg_spark.plans.inspect import assert_in_plan, plan_str, pushed_filters

registry.load_all()


def q(name, spark, sf_dir):
    return registry.get(name).fn(spark, sf_dir)


def test_filter_pushdown_reaches_scan(spark, sf_small):
    df = q("filter_pred", spark, sf_small)
    pf = pushed_filters(df)
    assert "l_linestatus" in pf and "l_quantity" in pf, pf


def test_projection_prunes_scan_columns(spark, sf_small):
    df = q("project", spark, sf_small)
    p = plan_str(df, "formatted")
    # ReadSchema must not include unprojected columns
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read and "o_custkey" not in read[0] and "o_orderstatus" not in read[0], read


def test_dim_join_broadcasts(spark, sf_small):
    assert_in_plan(q("join_inner_hash", spark, sf_small), "BroadcastHashJoin")


def test_large_join_sort_merges(spark, sf_small):
    assert_in_plan(q("join_sortmerge", spark, sf_small), "SortMergeJoin")


def test_agg_has_partial_phase(spark, sf_small):
    p = plan_str(q("agg_hash_groupby", spark, sf_small), "formatted")
    assert p.count("HashAggregate") >= 2, p  # partial + final


def test_topk_is_take_ordered(spark, sf_small):
    assert_in_plan(q("topk_global", spark, sf_small), "TakeOrderedAndProject")


def test_flagship_single_shuffle_before_agg(spark, sf_small):
    # flagship: window shuffle on user_id + broadcast join; the dim join
    # must not introduce a second large exchange
    p = plan_str(q("flagship_cdc_compaction", spark, sf_small), "formatted")
    assert "BroadcastHashJoin" in p, p


def test_whole_stage_codegen_on_core_path(spark, sf_small):
    df = q("agg_hash_groupby", spark, sf_small)
    df.collect()  # AQE shows codegen spans only in the finalized plan
    p = plan_str(df, "simple")
    # '*(n)' prefixes mark whole-stage-codegen'd spans in simple mode
    assert "*(1)" in p and "*(2)" in p, p
    assert "isFinalPlan=true" in p, p
