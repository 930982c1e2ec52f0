"""pattern_scrub + embedding_cluster_labels: kernel parity and
composition contracts."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from smqtk_indexing_ray.pipelines.scrub import SCRUB_DEFAULT, pattern_scrub


def _docs_ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


class TestPatternScrub:
    def test_pii_masked_and_counted(self):
        ds = pattern_scrub(_docs_ds([
            (1, "mail me at bob@example.com or 10.0.0.1 thanks"),
            (2, "no pii here"),
            (3, None),
        ]))
        out = {r["doc_id"]: r for r in ds.take_all()}
        assert out[1]["clean_text"] == "mail me at [EMAIL] or [IP] thanks"
        assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1
        assert out[1]["n_redactions"] == 2
        assert out[2]["clean_text"] == "no pii here"
        assert out[2]["n_redactions"] == 0
        assert out[3]["clean_text"] == ""  # null text -> ''

    def test_patterns_chain_in_order(self):
        # a replacement from pattern 1 must be visible to pattern 2
        pats = (("a", r"aa", "bb"), ("b", r"bb", "cc"))
        ds = pattern_scrub(_docs_ds([(1, "aa")]), patterns=pats)
        row = ds.take_all()[0]
        assert row["clean_text"] == "cc"
        assert row["n_a"] == 1 and row["n_b"] == 1

    def test_duckdb_parity_on_chained_output(self):
        import duckdb

        texts = [
            "x bob@a.io y 1.2.3.4 z bob@a.io",
            "edge 999.999.999.999 and 1.2.3",
            "a@b.co.uk tail",
            "",
        ]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        got = (pattern_scrub(rd.from_arrow(t), patterns=SCRUB_DEFAULT)
               .to_pandas().sort_values("doc_id", ignore_index=True))
        con = duckdb.connect()
        con.register("documents", t)
        rx_e = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
        rx_i = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
        want = con.execute(f"""
            WITH s0 AS (SELECT doc_id, coalesce(text,'') AS t
                        FROM documents),
            s1 AS (SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '{rx_e}')) AS BIGINT)
                     AS n_email,
                   regexp_replace(t, '{rx_e}', '[EMAIL]', 'g') AS t
                   FROM s0),
            s2 AS (SELECT doc_id, n_email,
                   CAST(len(regexp_extract_all(t, '{rx_i}')) AS BIGINT)
                     AS n_ipv4,
                   regexp_replace(t, '{rx_i}', '[IP]', 'g') AS t FROM s1)
            SELECT doc_id, t AS clean_text, n_email, n_ipv4,
                   n_email + n_ipv4 AS n_redactions
            FROM s2 ORDER BY doc_id
        """).df()
        assert list(got["clean_text"]) == list(want["clean_text"])
        assert list(got["n_email"]) == list(want["n_email"])
        assert list(got["n_ipv4"]) == list(want["n_ipv4"])
        assert list(got["n_redactions"]) == list(want["n_redactions"])


class TestEmbeddingClusterLabels:
    def _emb_ds(self, vecs):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }))

    def test_two_clusters_and_singleton(self):
        from smqtk_indexing_ray.pipelines.ann import embedding_cluster_labels

        # 0~1 form one cluster, 2~3 another, 4 orthogonal singleton
        vecs = [[1, 0, 0], [0.99, 0.1, 0], [0, 1, 0], [0.1, 0.99, 0],
                [0, 0, 1]]
        out = embedding_cluster_labels(self._emb_ds(vecs), threshold=0.9)
        lab = {r["vec_id"]: r["cluster_id"] for r in out.take_all()}
        assert lab[0] == lab[1] == 0
        assert lab[2] == lab[3] == 2
        assert lab[4] == 4

    def test_transitive_chain_merges(self):
        from smqtk_indexing_ray.pipelines.ann import embedding_cluster_labels

        # cos(0,1) = cos(1,2) = 0.8, cos(0,2) = 0.28: with threshold
        # 0.75 only the chain links — one component via transitivity
        vecs = [[1, 0], [0.8, 0.6], [0.28, 0.96]]
        out = embedding_cluster_labels(self._emb_ds(vecs), threshold=0.75)
        lab = {r["vec_id"]: r["cluster_id"] for r in out.take_all()}
        assert lab[0] == lab[1] == lab[2] == 0
