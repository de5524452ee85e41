"""Behavioral tests for the LLM-pipeline operators: cross-operator
invariants the DuckDB oracle can't express (LSH recall, MinHash
containment of true near-dups, SimHash locality).
"""

from __future__ import annotations

from cdc_plg_spark import registry

registry.load_all()


def run(name, spark, sf_dir):
    return registry.get(name).fn(spark, sf_dir).toPandas()


def test_minhash_finds_high_jaccard_pairs(spark, sf_dir):
    """Pairs with exact token-set Jaccard ≥ 0.9 must be recovered by
    the MinHash/LSH candidate generator (banding theory: ≥99.9% each;
    deterministic here — no RNG anywhere in the pipeline)."""
    exact = run("dedup_ngram_jaccard", spark, sf_dir)
    mh = run("dedup_fuzzy_minhash", spark, sf_dir)
    hi = exact[exact.jaccard >= 0.9]
    mh_pairs = {(r.doc1, r.doc2) for r in mh.itertuples()}
    assert len(hi) > 0, "fixture should contain high-jaccard near-dups"
    found = sum((r.doc1, r.doc2) in mh_pairs for r in hi.itertuples())
    assert found / len(hi) >= 0.95, (found, len(hi))


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    """Multi-table LSH top-5 must recover a usable fraction of the
    exact top-5 (fixture vectors are near-random, so ~0.5 is the
    honest ceiling at ~1/3 scan fraction; deterministic planes)."""
    bf = run("sim_topk_search", spark, sf_dir)
    ann = run("sim_ann_lsh", spark, sf_dir)
    bfs = {(r.query_id, r.corpus_id) for r in bf.itertuples()}
    anns = {(r.query_id, r.corpus_id) for r in ann.itertuples()}
    assert len(bfs) == 50  # 10 queries × 5
    recall = len(bfs & anns) / len(bfs)
    assert recall >= 0.4, recall
    # ANN must never return a better-than-exact result
    best_bf = bf.groupby("query_id")["cos"].max()
    best_ann = ann.groupby("query_id")["cos"].max()
    for qid, v in best_ann.items():
        assert v <= best_bf[qid] + 1e-9


def test_simhash_exact_dups_collide(spark, sf_dir):
    """Documents with identical text must have identical simhash."""
    sh = run("dedup_simhash", spark, sf_dir)
    exact = run("dedup_exact", spark, sf_dir)
    # exact dedup kept one doc per content class; duplicates exist iff
    # fewer classes than docs
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet".replace("//", "/"))
    n_docs = docs.count()
    if len(exact) < n_docs:
        # rebuild content classes and check simhash constancy per class
        pdf = run("dedup_exact", spark, sf_dir)
        full = docs.toPandas()[["doc_id", "text"]]
        full["h"] = full["text"].map(hash)
        merged = full.merge(sh, on="doc_id")
        nun = merged.groupby("h")["simhash"].nunique()
        assert (nun == 1).all()


def test_exact_dedup_idempotent(spark, sf_dir):
    """Dedup of the dedup output is a fixpoint."""
    first = run("dedup_exact", spark, sf_dir)
    assert first.content_hash.nunique() == len(first)


def test_approx_quantile_close_to_exact(spark, sf_dir):
    """The sketch percentile must land within 0.5% relative error of
    the exact percentile at sf0.01 (accuracy=10000 => eps=1e-4)."""
    from pyspark.sql import functions as F

    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.registry import get

    approx = {r["l_returnflag"]: (r["p50_approx"], r["p99_approx"])
              for r in get("agg_approx_quantile").fn(spark, sf_dir).collect()}
    li = load_table(spark, "lineitem", sf_dir)
    exact = {r["l_returnflag"]: (r["p50"], r["p99"])
             for r in (li.groupBy("l_returnflag")
                       .agg(F.percentile("l_extendedprice", 0.5).alias("p50"),
                            F.percentile("l_extendedprice", 0.99).alias("p99"))
                       .collect())}
    assert approx.keys() == exact.keys()
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / e < 0.005, (k, a, e)


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    """IVF top-5 (nprobe 6 of 16 cells ≈ 37% scan) must recover a
    usable fraction of the exact top-5 on the near-random fixture
    vectors (measured 0.78 with farthest-point seeds + 4 Lloyd passes,
    up from 0.62 at K=8 low-id seeds and the same scan fraction;
    clustered real embeddings trade far better), and never claim a
    better-than-exact hit."""
    bf = run("sim_topk_search", spark, sf_dir)
    ann = run("sim_ann_ivf", spark, sf_dir)
    bfs = {(r.query_id, r.corpus_id) for r in bf.itertuples()}
    anns = {(r.query_id, r.corpus_id) for r in ann.itertuples()}
    recall = len(bfs & anns) / len(bfs)
    assert recall >= 0.65, recall
    best_bf = bf.groupby("query_id")["cos"].max()
    best_ann = ann.groupby("query_id")["cos"].max()
    for qid, v in best_ann.items():
        assert v <= best_bf[qid] + 1e-9


def test_cc_clusters_cover_pairs(spark, sf_dir):
    """Connected-components invariants: both endpoints of every
    near-dup pair land in the same cluster; cluster_id is the minimum
    member; exactly one canonical doc per cluster."""
    pairs = run("dedup_ngram_jaccard", spark, sf_dir)
    cc = run("dedup_cluster_cc", spark, sf_dir)
    lab = dict(zip(cc.doc_id, cc.cluster_id))
    assert len(pairs) > 0
    for r in pairs.itertuples():
        assert lab[r.doc1] == lab[r.doc2], (r.doc1, r.doc2)
    grp = cc.groupby("cluster_id")
    assert (grp["doc_id"].min() == grp["doc_id"].min().index).all()
    assert (grp["is_canonical"].sum() == 1).all()
    # transitivity produced real multi-doc clusters
    assert (grp.size() > 1).any()


def test_hll_sketch_accuracy(spark, sf_dir):
    """Weekly user estimates from merged daily HLL sketches must land
    within 5% of the exact weekly distinct count (standard HLL error at
    default lgK=12 is ~1.6%)."""
    from pyspark.sql import functions as F
    from cdc_plg_spark.catalog import load_table

    approx = run("agg_sketch_reaggregate", spark, sf_dir)
    ev = load_table(spark, sf_dir=sf_dir, name="events")
    exact = (ev.groupBy(F.date_trunc("week", "ts").alias("week"), "event_type")
             .agg(F.countDistinct("user_id").alias("exact_users"))).toPandas()
    m = approx.merge(exact, on=["week", "event_type"])
    assert len(m) == len(approx) and len(m) > 0
    rel = (m.approx_users - m.exact_users).abs() / m.exact_users
    assert (rel <= 0.05).all(), m[rel > 0.05]


def test_domain_quota_invariants(spark, sf_dir):
    """sample_domain_quota: never more than K docs per source, ranks
    contiguous from 1, and deterministic across runs."""
    from cdc_plg_spark import registry

    fn = registry.get("sample_domain_quota").fn
    a = fn(spark, sf_dir).toPandas()
    per = a.groupby("source")["rn"].agg(["count", "min", "max"])
    assert (per["count"] <= 25).all()
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()
    b = fn(spark, sf_dir).toPandas()
    assert a.sort_values(["source", "rn"]).reset_index(drop=True).equals(
        b.sort_values(["source", "rn"]).reset_index(drop=True))


def test_pack_token_budget_invariants(spark, sf_dir):
    """sample_pack_token_budget: bins are contiguous per source and a
    bin's token total only exceeds the budget by at most one document's
    overhang (greedy sequential fill semantics)."""
    from cdc_plg_spark import registry

    pdf = registry.get("sample_pack_token_budget").fn(spark, sf_dir).toPandas()
    for (src, b), grp in pdf.groupby(["source", "bin"]):
        total = grp["n_tok"].sum()
        # all but the last doc fit under budget when it was opened
        assert total - grp["n_tok"].iloc[-1] <= 512, (src, b, total)
    for src, grp in pdf.groupby("source"):
        bins = sorted(grp["bin"].unique())
        assert bins == list(range(len(bins))), (src, bins)


def test_decontaminate_flags_real_overlap(spark, sf_dir):
    """text_decontaminate: every flagged doc genuinely shares an
    8-token shingle with the eval partition (recomputed in pandas)."""
    from cdc_plg_spark import registry
    from cdc_plg_spark.catalog import load_table

    flagged = registry.get("text_decontaminate").fn(spark, sf_dir).toPandas()
    docs = load_table(spark, "documents", sf_dir).toPandas()

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 8]) for i in range(len(w) - 7)}

    ev = set()
    for t in docs[docs.doc_id % 50 == 0].text:
        ev |= shingles(t)
    by_id = dict(zip(docs.doc_id, docs.text))
    for _, row in flagged.iterrows():
        sh = shingles(by_id[row.doc_id])
        assert len(sh & ev) == row.n_shared, row.doc_id


def test_centroid_counts_cover_corpus(spark, sf_dir):
    """embedding_centroid_per_label: per-label counts are constant
    across dims and sum to the corpus size."""
    from cdc_plg_spark import registry
    from cdc_plg_spark.catalog import load_table

    pdf = registry.get("embedding_centroid_per_label").fn(spark, sf_dir).toPandas()
    n_vecs = load_table(spark, "embeddings", sf_dir).count()
    per_label = pdf.groupby("label")["n"].nunique()
    assert (per_label == 1).all()
    assert pdf.groupby("label")["n"].first().sum() == n_vecs


def test_minhash_signature_null_text(spark):
    """NULL text must produce a NULL signature (latent crash guard:
    np.asarray(None) raised TypeError in the numpy sweep — real
    corpora carry NULL documents even though sf fixtures don't)."""
    from cdc_plg_spark.operators.dedup import _MINHASH_K, _minhash_signature

    df = spark.createDataFrame(
        [("a", "hello world hello"), ("b", None)],
        "doc_id string, text string")
    sigs = {r["doc_id"]: r["sig"] for r in
            df.select("doc_id", _minhash_signature().alias("sig")).collect()}
    assert sigs["b"] is None
    assert len(sigs["a"]) == _MINHASH_K


def test_ppm_codec_roundtrip():
    """The real PPM encode/decode/resize kernels (no Spark needed):
    byte-exact round-trip for arbitrary pixel arrays, comment-tolerant
    header parsing, format validation, resize identity."""
    import numpy as np

    from cdc_plg_spark.operators.multimodal import (
        decode_ppm, encode_ppm, resize_nearest,
    )

    rng = np.random.RandomState(42)
    for (w, h) in [(1, 1), (3, 7), (64, 48)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, back = decode_ppm(encode_ppm(px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(back, px)
    # multi-comment headers parse; pixel plane offset is exact
    payload = b"P6\n# one\n#two\n2 2\n255\n" + bytes(range(12))
    w2, h2, px = decode_ppm(payload)
    assert (w2, h2) == (2, 2)
    assert px.flatten().tolist() == list(range(12))
    # resize: identity at same size; nearest sampling at downscale
    px = rng.randint(0, 256, size=(6, 6, 3), dtype=np.uint8)
    assert np.array_equal(resize_nearest(px, 6, 6), px)
    small = resize_nearest(px, 3, 3)
    assert np.array_equal(small, px[::2, ::2, :])
    import pytest as _pt
    with _pt.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pt.raises(ValueError, match="unsupported maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_pq_ann_recall_vs_bruteforce(spark, sf_dir):
    """PQ (8x8-dim subspaces, 32 trained codewords, shortlist-40 ADC
    + exact re-rank) must recover a usable fraction of the exact
    top-5 (measured 0.82 on the fixture; the raw-L2 variant without
    unit-normalization sat at 0.42 — pinned by the >= 0.65 floor),
    and never claim a better-than-exact hit.  The re-rank means every
    surviving cos is an EXACT cosine, so hits must match brute force
    bit-for-bit after rounding."""
    bf = run("sim_topk_search", spark, sf_dir)
    pq = run("sim_ann_pq", spark, sf_dir)
    bfs = {(r.query_id, r.corpus_id) for r in bf.itertuples()}
    pqs = {(r.query_id, r.corpus_id) for r in pq.itertuples()}
    recall = len(bfs & pqs) / len(bfs)
    assert recall >= 0.65, recall
    bf_cos = {(r.query_id, r.corpus_id): r.cos for r in bf.itertuples()}
    for r in pq.itertuples():
        if (r.query_id, r.corpus_id) in bf_cos:
            assert abs(r.cos - bf_cos[(r.query_id, r.corpus_id)]) < 1e-9
    best_bf = bf.groupby("query_id")["cos"].max()
    for qid, v in pq.groupby("query_id")["cos"].max().items():
        assert v <= best_bf[qid] + 1e-9


def test_pq_checked_twin_consistency(spark, sf_dir):
    """The deterministic-codebook twin's ADC ordering invariants:
    exactly 5 rows per query, rk dense 1..5, adist non-decreasing in
    rk (the fixed-order sum must sort consistently), and every code
    the encode produced indexes a real codeword."""
    t = run("sim_ann_pq_checked", spark, sf_dir)
    assert set(t.groupby("query_id").size()) == {5}
    for _, g in t.groupby("query_id"):
        g = g.sort_values("rk")
        assert list(g.rk) == [1, 2, 3, 4, 5]
        assert (g.adist.diff().dropna() >= -1e-12).all()


def test_pq_refuses_non_divisible_embedding_dim(spark, tmp_path):
    """ADVICE r9: sim_ann_pq hardcoded dim 64 (sub = 64 // M); a
    fixture regen with a dim the M subspaces don't divide would have
    F.slice past the array end into silently-short sub-vectors and
    quietly wrong ADC distances.  Now sub derives from the trained
    codebooks and an indivisible dim fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    n, dim = 40, 60                       # 60 % 8 != 0
    (spark.range(n)
     .select(F.col("id").alias("vec_id"),
             F.array(*[(F.col("id") * 31 + i) % 17 / 16.0
                       for i in range(dim)]).alias("embedding"))
     .coalesce(1)                          # tiny fixture: one shard
     .write.parquet(str(tmp_path / "embeddings.parquet")))
    with pytest.raises(ValueError, match="not divisible"):
        registry.get("sim_ann_pq").fn(spark, str(tmp_path))


def test_temperature_mix_upweights_small_domains(spark, sf_dir):
    """alpha=0.5 mix properties: the smallest language keeps
    (almost) everything — threshold 65535/65536 — while larger ones
    keep ~sqrt(n_min/n_d); the realized keep fraction per language
    tracks its threshold within binomial noise; thresholds are
    engine-integer (no float on the comparison path)."""
    full = run("text_stats", spark, sf_dir)         # per-lang n_docs
    mix = run("sample_temperature_mix", spark, sf_dir)
    n_full = dict(zip(full.lang, full.n_docs))
    n_min = min(n_full.values())
    got = mix.groupby("lang").agg(kept=("doc_id", "size"),
                                  th=("keep_per_64k", "first"))
    for lang, row in got.iterrows():
        n_d = n_full[lang]
        want_th = min(65536 * int((n_min * n_d) ** 0.5) // n_d, 65535)
        assert row.th == want_th, lang
        # realized fraction ~ th/65536 (4 sigma binomial slack)
        import math
        p = row.th / 65536
        slack = 4 * math.sqrt(p * (1 - p) * n_d) + 1
        assert abs(row.kept - p * n_d) <= slack, lang
    smallest = min(n_full, key=n_full.get)
    assert got.loc[smallest].th == 65535


def test_global_shuffle_is_deterministic_and_balanced(spark, sf_dir):
    """Shard assignment: pure function of doc_id (two runs identical),
    256-way domain, and no shard hogs — the max shard is within 8x of
    the uniform share (md5 uniformity at fixture size)."""
    a = run("sample_global_shuffle", spark, sf_dir)
    b = run("sample_global_shuffle", spark, sf_dir)
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))
    assert a.shard.between(0, 255).all()
    sizes = a.groupby("shard").size()
    assert sizes.max() <= max(8 * len(a) / 256, 10)
    # okey is a prefix refinement of the shard byte
    assert (a.okey.str[:2].apply(lambda h: int(h, 16)) == a.shard).all()


def test_temperature_mix_threshold_math_cross_engine(spark, tmp_path):
    """The mix's parity rests on one claim: LEAST(65536 *
    CAST(FLOOR(SQRT(n_min * n_d AS DOUBLE)) AS BIGINT) // n_d, 65535)
    is bit-identical in Spark and DuckDB.  Pin it directly over 20k
    seeded random (n_min, n_d) pairs spanning 1 .. 1e9 docs per
    domain plus 10k pairs with n_d up to 2^46 (r10 VERDICT: the old
    float-divide Spark side was only provably equal below ~2^37
    docs/domain; the integer `div` rewrite must hold far past that)
    plus adversarial near-perfect-square products where a
    non-exactly-rounded sqrt would flip the floor.  Upper bound
    2^46: 65536 * sqrt(n_min * n_d) <= 2^16 * 2^46 = 2^62 keeps the
    numerator inside BIGINT in both engines."""
    import random

    import duckdb

    rng = random.Random(42)
    pairs = [(rng.randint(1, 10**9), rng.randint(1, 10**9))
             for _ in range(20000)]
    # huge-domain tier: past 2^37 where float-division parity broke
    pairs += [(rng.randint(1, 2**46), rng.randint(2**37, 2**46))
              for _ in range(10000)]
    pairs += [(k, k) for k in (1, 2, 3, 65535, 65536, 10**9,
                               2**37, 2**37 + 1, 2**46)]
    # near-perfect-square products: n_min*n_d = m^2 +/- 1
    for m in (10, 1000, 31623, 999983, 2**23, 2**23 - 1):
        pairs += [(1, m * m - 1), (1, m * m), (1, m * m + 1)]
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]

    pdf_rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    sdf = spark.createDataFrame(pdf_rows, "i long, n_min long, n_d long")
    from pyspark.sql import functions as F
    got_spark = {r["i"]: r["th"] for r in sdf.select(
        "i",
        F.least(
            F.expr("(65536 * cast(floor(sqrt("
                   "cast(n_min as double) * n_d)) as bigint))"
                   " div n_d"),
            F.lit(65535).cast("long")).alias("th")
    ).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE p(i BIGINT, n_min BIGINT, n_d BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pdf_rows)
    got_duck = dict(con.execute(
        "SELECT i, LEAST(65536 * CAST(FLOOR(SQRT(CAST(n_min AS DOUBLE)"
        " * n_d)) AS BIGINT) // n_d, 65535) FROM p").fetchall())
    con.close()

    diff = {i: (got_spark[i], got_duck[i]) for i in got_spark
            if got_spark[i] != got_duck[i]}
    assert not diff, f"{len(diff)} threshold mismatches, e.g. " \
                     f"{sorted(diff.items())[:3]}"


def test_cc_raises_on_unconverged_deep_component(spark):
    """The min-label CC kernel must RAISE when the fixpoint is not
    reached within the iteration backstop — returning the current
    labels would silently mis-cluster a high-diameter component
    (ADVICE r11).  A 12-node path graph needs ~11 propagation rounds;
    with max_iters=3 it cannot converge."""
    import pytest
    from pyspark.sql import functions as F

    from cdc_plg_spark.operators.dedup import _min_label_cc

    n = 12
    nodes = spark.range(n).select(F.col("id").alias("node"),
                                  F.col("id").alias("lab"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = chain.unionByName(
        chain.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with pytest.raises(RuntimeError, match="did not converge"):
        _min_label_cc(nodes, edges, max_iters=3)
    # and with room it converges: one component, all labeled 0
    labs = {r["lab"] for r in
            _min_label_cc(nodes, edges, max_iters=n + 2).collect()}
    assert labs == {0}


def test_incremental_dedup_consistent_with_batch_pairs(spark, sf_dir):
    """The incremental exhibit must agree with the batch pair exhibit
    on WHO is a near-dup: a batch doc (doc_id % 10 == 0) is is_dup
    exactly when the full-corpus pair run links it to at least one
    history doc (the candidate sets are provably equal — the salted
    self-join preserves the pair set, and both sides share
    _checked_sig_bands).  Also: every batch doc appears exactly once,
    and matched_doc is the deterministic best (max n_match, min id)."""
    pairs = run("dedup_fuzzy_minhash_checked", spark, sf_dir)
    inc = run("dedup_incremental_vs_index", spark, sf_dir)

    exp_best = {}
    for r in pairs.itertuples():
        for b, h in ((r.doc1, r.doc2), (r.doc2, r.doc1)):
            if b % 10 == 0 and h % 10 != 0:
                cur = exp_best.get(b)
                cand = (-r.n_match, h)
                if cur is None or cand < cur:
                    exp_best[b] = cand

    assert inc.doc_id.is_unique
    assert set(inc.doc_id) == {d for d in inc.doc_id}  # all batch docs once
    got_dup = set(inc[inc.is_dup].doc_id)
    assert got_dup == set(exp_best), (
        len(got_dup ^ set(exp_best)), "membership disagrees")
    for r in inc[inc.is_dup].itertuples():
        nm, h = exp_best[r.doc_id]
        assert (r.matched_doc, r.n_match) == (h, -nm), r


def test_index_maintain_merge_is_idempotent(spark, sf_dir):
    """Re-applying the SAME epoch's batch to the LSH index must be a
    no-op value-wise (the CDC idempotence contract the MERGE key gives
    us): checksums after a double apply equal the single apply —
    which the oracle already proved equals a from-scratch index."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.lakehouse import TxLogTable
    from cdc_plg_spark.operators.dedup import (_MINHASH_BANDS,
                                               _checked_sig_bands)

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")

    def band_rows(src):
        _, bands = _checked_sig_bands(src)
        return bands.select(
            (F.col("doc_id") * _MINHASH_BANDS + F.col("band_idx"))
            .alias("row_key"), "doc_id", "band_idx", "band_hash")

    p = os.path.join(tempfile.mkdtemp(prefix="lsh_idx_idem_"), "t")
    t = TxLogTable.create(spark, p,
                          band_rows(d.filter(F.col("doc_id") % 10 != 0)),
                          "row_key", n_files=4)
    batch = band_rows(d.filter(F.col("doc_id") % 10 == 0))

    def state():
        return {r["band_idx"]: (r["n"], r["hc"], r["ic"]) for r in
                t.read().groupBy("band_idx")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("band_hash").alias("hc"),
                      F.sum("doc_id").alias("ic")).collect()}

    t.merge(batch)
    once = state()
    t.merge(batch)        # replayed epoch — the crash-retry case
    assert state() == once


def test_epoch_screen_visibility_is_monotone(spark, sf_dir):
    """The epoch-ordered run sees history PLUS earlier arrivals, the
    one-shot screen sees history only — so every doc the one-shot
    flags must be flagged by the epoch run, with an equal-or-better
    best match (candidate sets only grow)."""
    one = run("dedup_incremental_vs_index", spark, sf_dir)
    ep = run("dedup_incremental_epochs", spark, sf_dir)
    one_d = {r.doc_id: r.n_match for r in one[one.is_dup].itertuples()}
    ep_d = {r.doc_id: r.n_match for r in ep[ep.is_dup].itertuples()}
    missing = set(one_d) - set(ep_d)
    assert not missing, missing
    worse = {d for d in one_d if ep_d[d] < one_d[d]}
    assert not worse, worse
