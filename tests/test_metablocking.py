from __future__ import annotations

import itertools

import pytest

from sparksimjoin.metablocking import blocking_graph, meta_block
from sparksimjoin.tokenizers import QgramTokenizer

ROWS = [
    (1, "green navy steel tomato"),
    (2, "green navy steel rose"),
    (3, "green navy plum rose"),
    (4, "azure plum mint cyan"),
    (5, "azure plum mint cyan"),
    (6, "snow"),            # df=1 token -> no blocks
    (7, None),
    (8, "green green navy"),  # duplicate tokens collapse
]


def _brute_graph(rows, max_block_size):
    toks = {i: set((t or "").split()) for i, t in rows}
    df = {}
    for s in toks.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    kept = {t for t, c in df.items() if 2 <= c <= max_block_size}
    rt = {i: s & kept for i, s in toks.items()}
    edges = {}
    for a, b in itertools.combinations(sorted(rt), 2):
        c = len(rt[a] & rt[b])
        if c:
            edges[(a, b)] = (c, len(rt[a]), len(rt[b]))
    return {
        k: (c, bl, br, c / (bl + br - c)) for k, (c, bl, br) in edges.items()
    }


def _brute_prune(graph, prune, factor=1.0):
    if prune is None:
        return set(graph)
    ws = {k: v[0] for k, v in graph.items()}  # prune_on cbs
    if prune == "wep":
        mean = sum(ws.values()) / len(ws)
        return {k for k, w in ws.items() if w >= factor * mean}
    nsum, ndeg = {}, {}
    for (a, b), w in ws.items():
        for n in (a, b):
            nsum[n] = nsum.get(n, 0) + w
            ndeg[n] = ndeg.get(n, 0) + 1
    return {
        (a, b)
        for (a, b), w in ws.items()
        if w >= factor * nsum[a] / ndeg[a] or w >= factor * nsum[b] / ndeg[b]
    }


@pytest.mark.parametrize("cap", [2, 3, 100])
def test_graph_brute_force(spark, cap):
    df = spark.createDataFrame(ROWS, "id long, name string")
    got = {
        (r.l_id, r.r_id): (r.cbs, r.bl, r.br, r.js)
        for r in blocking_graph(df, "id", "name", max_block_size=cap).collect()
    }
    want = _brute_graph(ROWS, cap)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert abs(got[k][3] - want[k][3]) < 1e-12


@pytest.mark.parametrize("prune,factor", [
    ("wep", 1.0), ("wep", 1.5), ("wnp", 1.0), ("wnp", 0.8), (None, 1.0),
])
def test_prune_brute_force(spark, prune, factor):
    df = spark.createDataFrame(ROWS, "id long, name string")
    got = {
        (r.l_id, r.r_id)
        for r in meta_block(
            df, "id", "name", prune=prune, factor=factor, max_block_size=100
        ).collect()
    }
    want = _brute_prune(_brute_graph(ROWS, 100), prune, factor)
    assert got == want


def test_purged_blocks_metric(spark):
    df = spark.createDataFrame(ROWS, "id long, name string")
    metrics = {}
    out = meta_block(df, "id", "name", max_block_size=2, metrics_out=metrics)
    out.count()
    # df("green")=4, df("navy")=4, df("plum")=3 exceed cap 2
    assert int(metrics["purged_blocks"]) == 3


def test_js_scheme_weight_column(spark):
    df = spark.createDataFrame(ROWS, "id long, name string")
    rows = meta_block(df, "id", "name", scheme="js", prune=None).collect()
    assert all(abs(r.weight - r.js) < 1e-15 for r in rows)


def test_qgram_tokenizer_path(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "abce"), (3, "zzzz")],
                               "id long, name string")
    got = {(r.l_id, r.r_id): r.cbs for r in
           blocking_graph(df, "id", "name",
                          QgramTokenizer(qval=2, padding=False)).collect()}
    # shared unpadded 2-grams of abcd/abce: ab, bc -> cbs 2
    assert got == {(1, 2): 2}


def test_validation(spark):
    df = spark.createDataFrame(ROWS, "id long, name string")
    for bad in (
        dict(scheme="xx"), dict(prune="yy"), dict(factor=0.0),
        dict(prune_on="zz"), dict(max_block_size=1),
    ):
        with pytest.raises(ValueError):
            meta_block(df, "id", "name", **bad)
