from __future__ import annotations

import math

from sparksimjoin.audit import cluster_audit


def _rows(df):
    return {r["component"]: r.asDict() for r in df.collect()}


def test_cluster_audit_basic(spark):
    """Chain component (density 2/3 — the bad-merge signature), clique
    pair, singleton (NULL density), and a cross-component edge that
    must be ignored."""
    comp = spark.createDataFrame(
        [("a", "A"), ("b", "A"), ("c", "A"), ("d", "D"), ("e", "D"), ("f", "F")],
        "id string, component string",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", 0.9),
            ("b", "c", 0.7),   # chain a-b-c: a~c only by transitivity
            ("d", "e", 0.95),
            ("c", "d", 0.8),   # cross-component (A vs D): ignored
        ],
        "l_id string, r_id string, _sim_score double",
    )
    out = _rows(cluster_audit(comp, edges))
    assert set(out) == {"A", "D", "F"}

    a = out["A"]
    assert a["n_records"] == 3 and a["n_edges"] == 2
    assert math.isclose(a["density"], 2 / 3)
    assert a["min_sim"] == 0.7
    assert math.isclose(a["avg_sim"], 0.8)

    d = out["D"]
    assert d["n_records"] == 2 and d["n_edges"] == 1
    assert d["density"] == 1.0 and d["min_sim"] == 0.95

    f = out["F"]
    assert f["n_records"] == 1 and f["n_edges"] == 0
    assert f["density"] is None and f["min_sim"] is None and f["avg_sim"] is None


def test_cluster_audit_orientation_insensitive(spark):
    """Each undirected edge counts once regardless of orientation."""
    comp = spark.createDataFrame(
        [("a", "A"), ("b", "A")], "id string, component string"
    )
    fwd = spark.createDataFrame(
        [("a", "b", 0.8)], "l_id string, r_id string, _sim_score double"
    )
    rev = spark.createDataFrame(
        [("b", "a", 0.8)], "l_id string, r_id string, _sim_score double"
    )
    out_f = _rows(cluster_audit(comp, fwd))["A"]
    out_r = _rows(cluster_audit(comp, rev))["A"]
    assert out_f == out_r
    assert out_f["n_edges"] == 1 and out_f["density"] == 1.0


def test_cluster_audit_matches_pipeline_edges(spark):
    """Audit over a real join + CC output: every component's support
    stats must be internally consistent (n_edges <= C(n,2), density in
    (0, 1], min_sim >= threshold, singletons edge-free)."""
    from sparksimjoin import WhitespaceTokenizer, jaccard_join
    from sparksimjoin.clustering import connected_components
    from sparksimjoin.fixtures import make_person_tables

    import pyspark.sql.functions as F

    pdf_a, _ = make_person_tables(n_a=150, seed=7)
    d = spark.createDataFrame(pdf_a)
    edges = jaccard_join(
        d, d, "id", "id", "name", "name",
        WhitespaceTokenizer(), 0.6, allow_empty=False, self_join=True,
    )
    comp = connected_components(edges, "l_id", "r_id")
    all_ids = d.select(F.col("id"))
    comp_full = all_ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    audit = cluster_audit(comp_full, edges).collect()
    assert sum(r["n_records"] for r in audit) == 150
    total_edges = edges.count()
    assert sum(r["n_edges"] for r in audit) == total_edges  # all intra
    for r in audit:
        n, e = r["n_records"], r["n_edges"]
        if n == 1:
            assert e == 0 and r["density"] is None
        else:
            assert 1 <= e <= n * (n - 1) // 2
            assert 0.0 < r["density"] <= 1.0
            assert r["min_sim"] >= 0.6
            assert r["min_sim"] <= r["avg_sim"] <= 1.0


def test_cluster_audit_chain_equals_full_run_audit(spark, tmp_path):
    """Chain audit == auditing a full recompute's clusters against its
    own scored edges: the chain's scored checkpoints partition the
    complete edge set (the incremental equivalence theorem)."""
    from sparksimjoin.audit import cluster_audit_chain
    from sparksimjoin.checkpoint import CheckpointManager
    from sparksimjoin.fixtures import make_transcripts
    from sparksimjoin.incremental import run_incremental
    from sparksimjoin.pipeline import PipelineConfig, run_pipeline

    cfg = PipelineConfig(threshold=0.6, audit=True)
    t_pdf, _ = make_transcripts(n_conv=120, seed=11)
    convs = sorted(t_pdf["conv_id"].unique())
    base_ids = set(convs[:90])
    base = spark.createDataFrame(t_pdf[t_pdf.conv_id.isin(base_ids)])
    new = spark.createDataFrame(t_pdf[~t_pdf.conv_id.isin(base_ids)])
    full = spark.createDataFrame(t_pdf)

    full_wd = str(tmp_path / "full")
    run_pipeline(spark, full, full_wd, cfg)
    full_audit = CheckpointManager(spark, full_wd).read("audit")

    run_pipeline(spark, base, str(tmp_path / "base"), cfg)
    run_incremental(spark, new, str(tmp_path / "base"), str(tmp_path / "inc"), cfg)
    # cfg.audit=True checkpointed the chain audit inside run_incremental
    inc_ckpt = CheckpointManager(spark, str(tmp_path / "inc"))
    inc_audit = inc_ckpt.read("audit")
    # and the standalone walker gives the same frame
    walker = cluster_audit_chain(spark, str(tmp_path / "inc"))

    key = lambda r: (str(r["component"]),)  # noqa: E731
    want = sorted((r.asDict() for r in full_audit.collect()), key=key)
    got_ckpt = sorted((r.asDict() for r in inc_audit.collect()), key=key)
    got_walk = sorted((r.asDict() for r in walker.collect()), key=key)
    assert got_ckpt == want
    assert got_walk == want
    assert any(r["n_records"] > 1 for r in want)  # non-trivial corpus


def test_cluster_audit_chain_two_links(spark, tmp_path):
    """Walker over a depth-2 chain (base <- b1 <- b2): the loop must
    hop two base pointers and still reproduce the full-run audit."""
    from sparksimjoin.audit import cluster_audit_chain
    from sparksimjoin.checkpoint import CheckpointManager
    from sparksimjoin.fixtures import make_transcripts
    from sparksimjoin.incremental import run_incremental
    from sparksimjoin.pipeline import PipelineConfig, run_pipeline

    cfg = PipelineConfig(threshold=0.6)
    t_pdf, _ = make_transcripts(n_conv=120, seed=13)
    convs = sorted(t_pdf["conv_id"].unique())
    cut1, cut2 = set(convs[:70]), set(convs[70:95])
    base = spark.createDataFrame(t_pdf[t_pdf.conv_id.isin(cut1)])
    b1 = spark.createDataFrame(t_pdf[t_pdf.conv_id.isin(cut2)])
    b2 = spark.createDataFrame(t_pdf[~t_pdf.conv_id.isin(cut1 | cut2)])
    full = spark.createDataFrame(t_pdf)

    full_wd = str(tmp_path / "full")
    run_pipeline(spark, full, full_wd, PipelineConfig(threshold=0.6, audit=True))
    want_df = CheckpointManager(spark, full_wd).read("audit")

    run_pipeline(spark, base, str(tmp_path / "base"), cfg)
    run_incremental(spark, b1, str(tmp_path / "base"), str(tmp_path / "i1"), cfg)
    run_incremental(spark, b2, str(tmp_path / "i1"), str(tmp_path / "i2"), cfg)
    got_df = cluster_audit_chain(spark, str(tmp_path / "i2"))

    key = lambda r: (str(r["component"]),)  # noqa: E731
    want = sorted((r.asDict() for r in want_df.collect()), key=key)
    got = sorted((r.asDict() for r in got_df.collect()), key=key)
    assert got == want
