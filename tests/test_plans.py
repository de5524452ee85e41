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


def test_scan_parquet_prunes_and_pushes(spark, sf_small):
    df = q("scan_parquet", spark, sf_small)
    p = plan_str(df, "formatted")
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    # 5 projected source columns only — o_comment etc. must not be read
    assert read and "o_comment" not in read[0] and "o_orderpriority" not in read[0], read


def test_topk_search_broadcasts_queries(spark, sf_small):
    # the query set must broadcast; the corpus scan must not shuffle
    # before scoring
    assert_in_plan(q("sim_topk_search", spark, sf_small),
                   "BroadcastNestedLoopJoin")


def test_asof_join_is_single_pass(spark, sf_small):
    # as-of = range-join + per-key top-1: exactly one window sort over
    # the candidate set, no cartesian re-expansion
    p = plan_str(q("join_asof", spark, sf_small), "formatted")
    assert "Window" in p or "WindowGroupLimit" in p, p


def test_stream_static_enrich_broadcasts(spark, sf_dir):
    """The static dimension must broadcast per micro-batch (no stream
    state, no shuffle of the stream side for the join)."""
    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.streaming.core import read_events_stream
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir)
    dim = (load_table(spark, "customer", sf_dir)
           .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    j = ev.join(F.broadcast(dim), "user_id")
    # streaming plans can't explain() until started; check the logical plan
    assert "ResolvedHint" in j._jdf.queryExecution().analyzed().toString() or \
           "UnresolvedHint" in j._jdf.queryExecution().logical().toString()


def test_exact_sum_stays_primitive(spark, sf_small):
    """The money-sum hot path must aggregate BIGINT, not Decimal —
    the whole point of the cents encoding (BASELINE.md)."""
    p = plan_str(q("agg_hash_groupby", spark, sf_small), "formatted")
    assert "partial_sum" in p, p
    # decimal accumulation would show sum(cast(... as decimal
    assert "as decimal(18,2))), " not in p, p


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    """Both sides bucketed+sorted on the join key: the join must be a
    SortMergeJoin reading bucket-aligned — NO shuffle exchange anywhere
    in the plan (the post-join aggregate's distribution is satisfied by
    the bucket partitioning too), and no Sort beyond the bucket order."""
    df = q("join_bucketed_colocated", spark, sf_small)
    df.collect()
    p = plan_str(df, "simple")
    assert "SortMergeJoin" in p, p
    assert "Exchange hashpartitioning" not in p, p
    assert "Bucketed: true" in p, p


def test_partitioned_layout_prunes(spark, sf_small):
    """The (yr, status)-partitioned object-store layout must serve a
    yr-filtered read with partition pruning: the scan's PartitionFilters
    carry the predicate and the data filter list stays empty."""
    from cdc_plg_spark.catalog import cache_dir
    from pyspark.sql import functions as F

    q("sink_object_store", spark, sf_small).collect()  # ensure layout exists
    back = (spark.read.parquet(cache_dir("scan_objstore", sf_small))
            .filter(F.col("yr") == 1995))
    p = plan_str(back, "formatted")
    part = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert part and "yr" in part[0], p


def test_chunking_is_shuffle_free(spark, sf_small):
    """Chunk fan-out (sequence+explode+substring) must stay a narrow
    map over the scan: no Exchange anywhere, and only the two needed
    columns read."""
    df = q("text_chunking", spark, sf_small)
    p = plan_str(df, "simple")
    assert "Exchange" not in p, p
    assert "Generate explode" in p, p


def test_deterministic_sampling_is_shuffle_free(spark, sf_small):
    """Hash-based split assignment and stratified sampling are pure
    narrow maps — no Exchange in either plan."""
    for name in ("sample_train_test_split", "sample_stratified"):
        p = plan_str(q(name, spark, sf_small), "simple")
        assert "Exchange" not in p, (name, p)


def test_funnel_single_keyed_shuffle(spark, sf_small):
    """The conditional-agg funnel must shuffle once on user_id plus one
    single-partition exchange for the global rollup — never a per-stage
    self-join (no Join operator at all)."""
    p = plan_str(q("analytics_funnel", spark, sf_small), "simple")
    assert "Join" not in p, p
    assert p.count("Exchange") <= 3, p  # user_id hash + global + AQE read


def test_ivf_candidate_join_is_equi(spark, sf_small):
    """IVF ANN prunes via an equi join on cell id — the plan must show
    a broadcast HASH join (bounded candidates). The embedded recall
    audit legitimately adds exactly two broadcast nested loops (the
    exact baseline over the broadcast 10-query sample, and the 1-row
    audit scalar); the CANDIDATE path itself must stay hash-equi, so
    any third nested loop is a regression."""
    p = plan_str(q("sim_ann_ivf", spark, sf_small), "simple")
    assert "BroadcastHashJoin" in p, p
    assert p.count("BroadcastNestedLoopJoin") <= 2, p


def test_ivf_checked_assignment_shuffles_once(spark, sf_small):
    """The value-verified IVF twin's cell assignment must collapse the
    K candidate rows per corpus vector map-side (partial max_by before
    the exchange) — the shuffle moves one row per vector, not K."""
    p = plan_str(q("sim_ann_ivf_checked", spark, sf_small), "formatted")
    assert "partial_max_by" in p or "partial_maxby" in p.replace("_", ""), p
    assert "BroadcastHashJoin" in p, p


def test_dynamic_partition_pruning_fires(spark, sf_small):
    """Joining the (yr, status)-partitioned layout to a filtered dim on
    the partition column must inject a dynamicpruning expression into
    the fact scan's PartitionFilters — at 100 TB this is the difference
    between scanning one year and scanning the whole table when the
    year list only materializes at runtime."""
    from cdc_plg_spark.catalog import cache_dir

    q("sink_object_store", spark, sf_small).collect()  # ensure layout
    fact = spark.read.parquet(cache_dir("scan_objstore", sf_small))
    dim = (spark.createDataFrame([(1995, "keep"), (1996, "drop")],
                                 "yr int, tag string")
           .filter("tag = 'keep'"))
    j = fact.join(dim, "yr").groupBy("tag").count()
    p = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p.lower(), p


def test_sorted_neighborhood_window_is_partitioned(spark, sf_small):
    """The W=2 neighbor window must run partitioned by the block-key
    prefix — an empty-partition-spec window would pull the whole corpus
    into one task (the round-1 scale bug). No single-partition exchange
    anywhere in the plan."""
    p = plan_str(q("dedup_sorted_neighborhood", spark, sf_small), "simple")
    assert "Exchange SinglePartition" not in p, p


def test_jdbc_batch_packing_is_per_writer(spark, sf_small):
    """Batch packing must mirror df.write.jdbc: each writer partition
    packs its own rows (window partitioned by writer_id), never a
    global row_number."""
    p = plan_str(q("sink_jdbc_batch", spark, sf_small), "simple")
    assert "Exchange SinglePartition" not in p, p


def test_rfm_has_no_global_sort(spark, sf_small):
    """RFM quartiles must come from bucket-partitioned ranks + broadcast
    offsets — three single-partition NTILE sorts (the round-1 form)
    serialize the customer dimension through one task."""
    p = plan_str(q("analytics_rfm_segmentation", spark, sf_small), "simple")
    assert "Exchange SinglePartition" not in p, p
