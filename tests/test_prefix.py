"""Distributed exclusive prefix sum (stages/prefix.py) and the
fixed-token-budget chunk assignment built on it (terms.token_chunks)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


DOCS = [
    (0, "the cat sat on the mat", "en", "s0", 22),
    (1, "", "en", "s0", 0),
    (2, "cat cat cat cat", "en", "s1", 15),
    (3, "the cat sat on the mat", "en", "s1", 22),
    (4, "one two three four five six", "en", "s2", 27),
    (5, "alpha beta alpha beta gamma", "fr", "s2", 27),
]


def _ds(rows, blocks: int = 3):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    return rd.from_arrow(t).repartition(blocks)


def _table(ds) -> pa.Table:
    batches = [b for b in ds.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
    if not batches:
        sch = ds.schema()
        return (sch.base_schema if hasattr(sch, "base_schema")
                else sch).empty_table()
    return pa.concat_tables(batches).combine_chunks()


def test_running_total_randomized(ray_session):
    import ray.data as rd

    from smqtk_indexing_ray.stages.prefix import running_total

    rng = np.random.default_rng(11)
    n = 500
    keys = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 10, size=n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(11)
    out = _table(running_total(ds, order="k", value="v")).to_pydict()
    got = dict(zip(out["k"], out["before"]))
    order = np.argsort(keys)
    expect_before = np.concatenate(
        ([0], np.cumsum(vals[order][:-1], dtype=np.int64)))
    for k, b in zip(keys[order], expect_before):
        assert got[int(k)] == int(b)


def test_running_total_multikey_descending(ray_session):
    """Composite (value DESC, id ASC) order with heavy ties on the
    primary key — the Pareto-layout shape."""
    import ray.data as rd

    from smqtk_indexing_ray.stages.prefix import running_total

    rng = np.random.default_rng(13)
    n = 400
    vals = rng.integers(0, 5, size=n).astype(np.int64)   # many ties
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": ids, "v": vals})).repartition(9)
    out = _table(running_total(ds, order=["v", "id"], value="v",
                               descending=[True, False])).to_pydict()
    got = dict(zip(out["id"], out["before"]))
    order = np.lexsort((ids, -vals))
    expect = np.concatenate(
        ([0], np.cumsum(vals[order][:-1], dtype=np.int64)))
    for i, b in zip(ids[order], expect):
        assert got[int(i)] == int(b)


def test_corpus_rollup_matches_duckdb(ray_session):
    """All four grouping levels vs DuckDB GROUPING SETS, with cells
    split across blocks."""
    import duckdb
    import ray.data as rd

    from smqtk_indexing_ray.pipelines.analysis import corpus_rollup

    rng = np.random.default_rng(17)
    n = 900
    t = pa.table({
        "source": pa.array(rng.choice(["cc", "wiki", "books"], n)),
        "lang": pa.array(rng.choice(["en", "fr", "zh"], n)),
        "n_chars": pa.array(rng.integers(1, 500, n).astype(np.int64)),
    })
    got = corpus_rollup(
        rd.from_arrow(t).repartition(7)).to_pandas().sort_values(
        ["source", "lang"], ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        "SELECT coalesce(source, 'ALL') AS source,"
        " coalesce(lang, 'ALL') AS lang, count(*) AS n_docs,"
        " CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents"
        " GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())"
        " ORDER BY source, lang").df()
    assert list(got.source) == list(want.source)
    assert list(got.lang) == list(want.lang)
    assert list(got.n_docs) == list(want.n_docs)
    assert list(got.total_chars) == list(want.total_chars)


def test_running_total_empty(ray_session):
    import ray.data as rd

    from smqtk_indexing_ray.stages.prefix import running_total

    sch = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    ds = rd.from_arrow(sch.empty_table())
    out = _table(running_total(ds, order="k", value="v", schema=sch))
    assert out.num_rows == 0
    assert out.schema.field("before").type == pa.int64()


def test_token_chunks_matches_window_oracle(ray_session):
    from smqtk_indexing_ray.pipelines.terms import token_chunks

    counts = {r[0]: len(r[1].split()) for r in DOCS}
    run = 0
    expect = {}
    for d in sorted(counts):
        expect[d] = (counts[d], run, run // 4)
        run += counts[d]
    out = _table(token_chunks(_ds(DOCS), budget=4,
                              num_partitions=3)).to_pydict()
    got = {d: (n, b, c) for d, n, b, c in zip(
        out["doc_id"], out["n_tokens"], out["tokens_before"],
        out["chunk_id"])}
    assert got == expect


def test_token_chunks_many_blocks(ray_session):
    """Carries must chain across many blocks (multi-block prefix)."""
    from smqtk_indexing_ray.pipelines.terms import token_chunks

    rng = np.random.default_rng(3)
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(rng.integers(0, 9))),
             "en", "s", 0) for i in range(200)]
    counts = [len(r[1].split()) for r in rows]
    before = np.concatenate(([0], np.cumsum(counts[:-1])))
    out = _table(token_chunks(_ds(rows).repartition(13), budget=16,
                              num_partitions=13)).to_pydict()
    got = {d: (n, b, c) for d, n, b, c in zip(
        out["doc_id"], out["n_tokens"], out["tokens_before"],
        out["chunk_id"])}
    for i in range(200):
        assert got[i] == (counts[i], int(before[i]), int(before[i]) // 16)


def test_token_chunks_budget_validation(ray_session):
    from smqtk_indexing_ray.pipelines.terms import token_chunks

    with pytest.raises(ValueError, match="budget"):
        token_chunks(_ds(DOCS), budget=0)
