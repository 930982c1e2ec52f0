"""Kernel-registry tests — the analog of the reference's plugin-resolution
contract (impls registered under ``smqtk_plugins`` entry points and resolved
by config string, /root/reference/pyproject.toml:72-84,
/root/reference/smqtk_indexing/interfaces/lsh_functor.py:8-11): a pipeline
must be reconfigurable by NAME only, including with kernels registered
outside the library.
"""

import numpy as np
import pyarrow as pa
import pytest

from smqtk_indexing_ray.config import DedupConfig
from smqtk_indexing_ray.pipelines.dedup import dedup_pipeline
from smqtk_indexing_ray.registry import (
    available_kernels,
    register_kernel,
    resolve_kernel,
)
from smqtk_indexing_ray.sources.pages import PagesSpec, generate_pages_table


class TestRegistryUnit:
    def test_builtins_listed(self):
        av = available_kernels()
        assert "minhash-simhash" in av["signature"]
        assert {"est-jaccard", "est-jaccard-or-simhash",
                "simhash"} <= set(av["verify"])
        assert {"min_doc", "earliest"} <= set(av["select"])

    def test_miss_raises_with_names(self):
        with pytest.raises(KeyError, match="min_doc"):
            resolve_kernel("select", "nope")

    def test_unknown_kind_rejected(self):
        with pytest.raises(ValueError, match="unknown kernel kind"):
            register_kernel("frobnicate", "x")

    def test_shadowing_last_wins(self):
        builtin = resolve_kernel("verify", "est-jaccard")

        @register_kernel("verify", "est-jaccard")
        def shadow(ej, ham, cfg):
            return ej >= 0.0

        try:
            assert resolve_kernel("verify", "est-jaccard") is shadow
        finally:
            register_kernel("verify", "est-jaccard")(builtin)
        assert resolve_kernel("verify", "est-jaccard") is builtin

    def test_config_roundtrip_carries_kernel_names(self):
        cfg = DedupConfig(verify_kernel="est-jaccard",
                          select_kernel="earliest")
        back = DedupConfig.from_dict(cfg.to_dict())
        assert back == cfg
        assert back.config_hash() == cfg.config_hash()
        assert DedupConfig().config_hash() != cfg.config_hash()


@pytest.fixture(scope="module")
def small_pages(ray_session):
    import ray.data as rd

    spec = PagesSpec(n_docs=300, seed=11)
    return rd.from_arrow(generate_pages_table(spec)).materialize()


class TestNameOnlySwap:
    """The verdict's done-criterion: construct a pipeline with a swapped
    kernel by name only (no library-code edits)."""

    def test_custom_verify_kernel_drops_all_edges(self, small_pages):
        @register_kernel("verify", "test-reject-all")
        def reject_all(ej, ham, cfg):
            return np.zeros(len(ej), dtype=bool)

        cfg = DedupConfig(signature_concurrency=2, batch_size=128,
                          verify_kernel="test-reject-all")
        out = dedup_pipeline(small_pages, cfg,
                             num_partitions=2).output.to_pandas()
        # no edge survives the gate -> every doc is its own cluster
        assert (out["cluster_id"] == out["doc_id"]).all()
        assert out["keep"].all()

    def test_custom_select_kernel_keep_all(self, small_pages):
        @register_kernel("select", "test-keep-all")
        def keep_all(labeled, *, labeled_cols, empty_fn, num_partitions):
            def flag(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "cluster_id" not in t.column_names:
                    e = empty_fn(labeled_cols)
                    return e.append_column("keep", pa.array([], pa.bool_()))
                return t.append_column(
                    "keep", pa.array(np.ones(t.num_rows, dtype=bool)))
            return labeled.map_batches(flag, batch_format="pyarrow")

        cfg = DedupConfig(signature_concurrency=2, batch_size=128)
        out = dedup_pipeline(small_pages, cfg, num_partitions=2,
                             rep_strategy="test-keep-all").output.to_pandas()
        assert out["keep"].all()
        # clustering itself is untouched by the select kernel
        assert (out["cluster_id"] <= out["doc_id"]).all()

    def test_earliest_select_via_config_string(self, small_pages):
        cfg_min = DedupConfig(signature_concurrency=2, batch_size=128)
        cfg_ear = DedupConfig(signature_concurrency=2, batch_size=128,
                              select_kernel="earliest")
        a = dedup_pipeline(small_pages, cfg_min,
                           num_partitions=2).output.to_pandas()
        b = dedup_pipeline(small_pages, cfg_ear,
                           num_partitions=2).output.to_pandas()
        # same clustering, same number of representatives; warc_ts is a
        # monotone function of doc_id in the generator so the earliest
        # member IS the min doc_id — keep flags agree row-for-row.
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert (a["cluster_id"] == b["cluster_id"]).all()
        assert (a["keep"] == b["keep"]).all()


@pytest.mark.usefixtures("ray_session")
def test_earliest_select_tolerates_null_timestamps():
    """read_pages fills missing warc_ts with typed nulls; the earliest
    strategy must treat them as +inf (lose to any dated clustermate)
    and still keep exactly one doc per cluster — the sorted-attach
    rewrite initially crashed here (review regression)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from smqtk_indexing_ray.config import DedupConfig
    from smqtk_indexing_ray.pipelines import dedup_pipeline

    n = 60
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "url": pa.array([f"u://{i}" for i in range(n)]),
        "warc_ts": pa.array([None] * n, pa.timestamp("us")),
        "html": pa.array([None] * n, pa.binary()),
        "text": pa.array([f"doc body shared {i % 20} words here "
                          f"repeated tokens" for i in range(n)]),
        "lang": pa.array(["en"] * n),
    })
    res = dedup_pipeline(rd.from_arrow(t), DedupConfig(),
                         num_partitions=4, rep_strategy="earliest")
    df = res.output.to_pandas()
    assert len(df) == n
    per = df.groupby("cluster_id")["keep"].sum()
    assert (per == 1).all()
    # undated rows fall back to min-doc_id representatives
    reps = df[df.keep]
    assert (reps.doc_id.to_numpy()
            == reps.cluster_id.to_numpy()).all()


def test_entry_point_kernel_from_external_module(tmp_path, monkeypatch):
    """A third-party package's kernels are discovered via the
    ``smqtk_indexing_ray.kernels`` entry-point group without being
    imported first (the reference's smqtk_plugins contract,
    pyproject.toml:72-84): a module-valued entry registers through its
    own decorators at import; a callable-valued ``kind:name`` entry is
    registered directly and never overrides an existing name."""
    import sys

    from smqtk_indexing_ray import registry

    ext = tmp_path / "ext_kernels_mod.py"
    ext.write_text(
        "from smqtk_indexing_ray.registry import register_kernel\n"
        "@register_kernel('verify', 'ep-always')\n"
        "def always(ej, ham, cfg):\n"
        "    return ej >= 0\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))

    class _EP:
        def __init__(self, name, loader):
            self.name = name
            self._loader = loader

        def load(self):
            return self._loader()

    def _load_module():
        import importlib
        return importlib.import_module("ext_kernels_mod")

    def marker(ej, ham, cfg):
        return ej < 0

    eps = [
        _EP("ext_kernels_mod", _load_module),          # module-valued
        _EP("select:ep-select", lambda: marker),       # callable-valued
        _EP("verify:est-jaccard", lambda: marker),     # must NOT override
        _EP("broken", lambda: (_ for _ in ()).throw(   # must warn, not kill
            RuntimeError("boom"))),
    ]
    monkeypatch.setattr(registry, "_iter_entry_points", lambda: eps)
    monkeypatch.setattr(registry, "_EP_SCANNED", False)
    for key in [("verify", "ep-always"), ("select", "ep-select")]:
        registry._REGISTRY.pop(key, None)
    sys.modules.pop("ext_kernels_mod", None)

    with pytest.warns(UserWarning, match="broken"):
        got = registry.resolve_kernel("verify", "ep-always")
    assert got.__name__ == "always"
    assert registry.resolve_kernel("select", "ep-select") is marker
    # builtin not clobbered by the callable-valued collision
    assert registry.resolve_kernel("verify", "est-jaccard") is not marker
    assert "ep-select" in registry.available_kernels("select")

    # cleanup so later tests see pristine state
    for key in [("verify", "ep-always"), ("select", "ep-select")]:
        registry._REGISTRY.pop(key, None)
    sys.modules.pop("ext_kernels_mod", None)
