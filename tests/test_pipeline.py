"""End-to-end dedup pipeline tests on the planted-duplicate corpus.

Analog of the reference's seeded algorithmic tests
(/root/reference/tests/impls/nn_index/test_lsh.py:754-979): a seeded corpus
with known structure, a brute-force oracle, and recall assertions at the
reference configuration (128-perm MinHash, 64-bit SimHash).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.functions import shingle_flat, tokenize_flat
from smqtk_indexing_ray.pipelines.dedup import dedup_pipeline
from smqtk_indexing_ray.sources.pages import (
    PagesSpec,
    generate_pages_table,
    generate_truth_table,
)


def _pair_recall(pred: dict[int, int], truth_df: pd.DataFrame) -> float:
    """Fraction of planted same-cluster pairs that end up together."""
    got = tot = 0
    grp = truth_df[truth_df["class"] != "single"].groupby("true_cluster")
    for _, g in grp:
        ids = g["doc_id"].to_numpy()
        n = len(ids)
        if n < 2:
            continue
        tot += n * (n - 1) // 2
        labels = pd.Series([pred[i] for i in ids])
        for m in labels.value_counts():
            got += m * (m - 1) // 2
    return got / tot if tot else 1.0


def _pair_precision(pred: dict[int, int], truth_df: pd.DataFrame) -> float:
    """Fraction of predicted same-cluster pairs that are truly planted."""
    df = truth_df.copy()
    df["pred"] = df["doc_id"].map(pred)
    got = tot = 0
    for _, g in df.groupby("pred"):
        n = len(g)
        if n < 2:
            continue
        tot += n * (n - 1) // 2
        for m in g["true_cluster"].value_counts():
            got += m * (m - 1) // 2
    return got / tot if tot else 1.0


@pytest.fixture(scope="module")
def pipeline_run(ray_session):
    import ray.data as rd

    spec = PagesSpec(n_docs=2000, seed=42, hot_blocks=1)
    pages = rd.from_arrow(generate_pages_table(spec))
    truth = generate_truth_table(spec).to_pandas()
    cfg = DedupConfig(signature_concurrency=2, batch_size=512)
    res = dedup_pipeline(pages, cfg, num_partitions=4)
    out = res.output.to_pandas()
    return out, truth


class TestDedupPipeline:
    def test_all_rows_present(self, pipeline_run):
        out, truth = pipeline_run
        assert len(out) == len(truth)
        assert set(out.columns) == {"doc_id", "url", "warc_ts", "lang",
                                    "cluster_id", "keep"}

    def test_recall_ge_099(self, pipeline_run):
        out, truth = pipeline_run
        pred = dict(zip(out["doc_id"], out["cluster_id"]))
        recall = _pair_recall(pred, truth)
        assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99"

    def test_precision(self, pipeline_run):
        out, truth = pipeline_run
        pred = dict(zip(out["doc_id"], out["cluster_id"]))
        prec = _pair_precision(pred, truth)
        assert prec >= 0.98, f"dup-pair precision {prec:.4f} < 0.98"

    def test_exact_dups_always_clustered(self, pipeline_run):
        out, truth = pipeline_run
        pred = dict(zip(out["doc_id"], out["cluster_id"]))
        ex = truth[truth["class"] == "exact"]
        for _, g in ex.groupby("true_cluster"):
            labels = {pred[i] for i in g["doc_id"]}
            assert len(labels) == 1

    def test_one_keeper_per_cluster(self, pipeline_run):
        out, _ = pipeline_run
        per = out.groupby("cluster_id")["keep"].sum()
        assert (per == 1).all()

    def test_keeper_is_min_ts_then_doc(self, pipeline_run):
        out, _ = pipeline_run
        for _, g in out[out["cluster_id"].isin(
                out["cluster_id"].value_counts().head(20).index)].groupby(
                    "cluster_id"):
            g = g.sort_values(["warc_ts", "doc_id"])
            assert bool(g.iloc[0]["keep"])

    def test_hot_cluster_single_component(self, pipeline_run):
        out, truth = pipeline_run
        pred = dict(zip(out["doc_id"], out["cluster_id"]))
        hot_ids = truth[truth["class"] == "hot"]["doc_id"]
        labels = {pred[i] for i in hot_ids}
        assert len(labels) == 1


@pytest.mark.usefixtures("ray_session")
def test_brute_force_jaccard_oracle():
    """Every pair with true shingle-set Jaccard >= 0.6 must cluster
    together (detection p > 0.988 at b=32, r=4 per pair; transitivity
    pushes group recall higher)."""
    import ray.data as rd

    spec = PagesSpec(n_docs=300, seed=7, hot_blocks=0)
    tbl = generate_pages_table(spec)
    cfg = DedupConfig(signature_concurrency=2, batch_size=256)

    truth_tbl = generate_truth_table(spec)
    texts = truth_tbl["true_text"].to_pylist()
    tok, off = tokenize_flat(pa.array(texts), lowercase=cfg.lowercase,
                             hash_key=cfg.hash_key)
    sh, soff = shingle_flat(tok, off, cfg.shingle_k)
    sets = [set(sh[soff[i]:soff[i + 1]].tolist()) for i in range(len(texts))]
    doc_ids = truth_tbl["doc_id"].to_pylist()

    res = dedup_pipeline(rd.from_arrow(tbl), cfg, num_partitions=4)
    out = res.output.to_pandas()
    pred = dict(zip(out["doc_id"], out["cluster_id"]))

    missed = total = 0
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = inter / len(sets[i] | sets[j])
            if jac >= 0.6:
                total += 1
                if pred[doc_ids[i]] != pred[doc_ids[j]]:
                    missed += 1
    assert total > 50, "fixture should contain plenty of true near-dup pairs"
    assert missed / total <= 0.01, f"oracle recall {1 - missed/total:.4f}"


@pytest.mark.usefixtures("ray_session")
def test_containment_pairs_flags_planted_contain_class():
    """MinHash containment estimator vs the generator's planted
    containment class: every (A, wrapper) pair scores near 1.0 and
    strictly above its padding-diluted Jaccard; unrelated singles stay
    silent."""
    import ray.data as rd

    from smqtk_indexing_ray.config import DedupConfig
    from smqtk_indexing_ray.pipelines.dedup import containment_pairs
    from smqtk_indexing_ray.sources import PagesSpec, generate_pages_table
    from smqtk_indexing_ray.sources.pages import generate_truth_table

    spec = PagesSpec(n_docs=1000, seed=19, hot_blocks=0)
    pages = generate_pages_table(spec)
    truth = generate_truth_table(spec).to_pandas()

    got = containment_pairs(
        rd.from_arrow(pages).repartition(5), DedupConfig(),
        threshold=0.85).to_pandas()
    flagged = set(map(tuple, np.sort(
        got[["u", "v"]].to_numpy(), axis=1)))

    # planted containment pairs: within each 'contain' cluster, member
    # 0 (A) is embedded in every other member
    want = set()
    for cid, g in truth[truth["class"] == "contain"].groupby(
            "true_cluster"):
        ids = sorted(g.doc_id)
        a = ids[0]
        for b in ids[1:]:
            want.add((a, b))
    assert len(want) >= 10
    hits = want & flagged
    assert len(hits) / len(want) >= 0.9, (len(hits), len(want))

    # the containment score beats the diluted jaccard on those pairs
    sel = got.set_index(
        got[["u", "v"]].apply(lambda r: tuple(sorted(r)), axis=1))
    for p in hits:
        row = sel.loc[[p]].iloc[0]
        assert row.est_containment >= 0.85
        assert row.est_containment >= row.est_jaccard - 1e-9

    # singles never appear
    singles = set(truth[truth["class"] == "single"].doc_id)
    for (a, b) in flagged:
        assert not (a in singles and b in singles)
