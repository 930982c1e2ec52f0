"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Schema per BASELINE.json ``input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``
plus an explicit ``doc_id:int64`` (see note below).

Design for scale: the corpus is generated in independent **blocks** of
:data:`BLOCK` documents; every block is a pure function of
``(seed, block_id)`` (``np.random.default_rng([seed, block_id])``), so
generation parallelizes over a ``ray.data.range(n_blocks)`` and is
byte-stable regardless of partitioning, task retries, or execution order.
Planted duplicate classes live entirely inside one block (ground-truth
cluster = ``block_id * BLOCK + first_slot``), except the deliberate **hot
cluster**: the first ``hot_blocks`` blocks all carry near-copies of one
template (true_cluster = -1), planting the million-member-bucket skew case
called out in SURVEY.md §4.2.

doc_id note: at the 10^12-doc design scale a 64-bit *hash* of ``url`` would
collide (birthday bound ~2.7e4 collisions), so document ids are assigned
structurally — ``block_id * BLOCK + slot`` here; ``(shard_id << 40) | row``
for a real crawl — and ``url`` only rejoins at the final sink.

Duplicate classes (FIXTURES.md F1):
  exact      identical text, distinct url/warc_ts
  near       1-3% token substitutions            (shingle Jaccard ~0.85-0.95)
  boiler     shared template, contiguous ~15% payload span swapped (J ~0.7)
  contain    doc A embedded verbatim in longer doc B (suffix-array class)
  single     unrelated text (false-positive control)
  hot        the cross-block hot-template cluster
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

BLOCK = 100
_TS_BASE_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds
_LANGS = np.array(["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"])

# slot plan inside one regular block: (class, group_size) — sums to BLOCK
_GROUP_PLAN: list[tuple[str, int]] = (
    [("single", 1)] * 55
    + [("exact", 2), ("exact", 2), ("exact", 3), ("exact", 3)]
    + [("near", 2), ("near", 3), ("near", 2), ("near", 3),
       ("near", 2), ("near", 3), ("near", 2), ("near", 3)]
    + [("boiler", 5), ("boiler", 5)]
    + [("contain", 2), ("contain", 3)]
)
assert sum(n for _, n in _GROUP_PLAN) == BLOCK


@dataclass(frozen=True)
class PagesSpec:
    """Parameters of a synthetic corpus. ``n_docs`` rounds up to BLOCK."""

    n_docs: int = 10_000
    seed: int = 42
    vocab_size: int = 20_000
    hot_blocks: int = 0          # first N blocks form one giant cluster
    html_frac: float = 0.3       # fraction of rows that carry html bytes
    null_text_frac: float = 0.05 # of html rows, text=None (extraction fills)

    @property
    def n_blocks(self) -> int:
        return max(1, -(-self.n_docs // BLOCK))


def _words(idx: np.ndarray) -> list[str]:
    return [f"w{i:05d}" for i in idx]


def _draw_tokens(rng: np.random.Generator, n: int, vocab: int) -> np.ndarray:
    # power-law-ish rank sampling (Zipf-like head concentration), vectorized
    return (vocab * rng.random(n) ** 2.2).astype(np.int64)


def _doc_text(tokens: np.ndarray) -> str:
    return " ".join(_words(tokens))


def _mutate(rng: np.random.Generator, tokens: np.ndarray, frac: float,
            vocab: int) -> np.ndarray:
    out = tokens.copy()
    n_mut = max(1, int(len(tokens) * frac))
    pos = rng.choice(len(tokens), size=min(n_mut, len(tokens)), replace=False)
    out[pos] = _draw_tokens(rng, len(pos), vocab)
    return out


def generate_block(block_id: int, spec: PagesSpec) -> tuple[pa.Table, pa.Table]:
    """Generate one block -> (pages table, ground-truth table). Pure."""
    rng = np.random.default_rng([spec.seed, block_id])
    texts: list[str] = []
    classes: list[str] = []
    clusters: list[int] = []

    if block_id < spec.hot_blocks:
        # hot cluster: near-copies of one template seeded by corpus seed only
        trng = np.random.default_rng([spec.seed, 999_983])
        template = _draw_tokens(trng, 180, spec.vocab_size)
        for _ in range(BLOCK):
            texts.append(_doc_text(_mutate(rng, template, 0.01, spec.vocab_size)))
            classes.append("hot")
            clusters.append(-1)
    else:
        for cls, size in _GROUP_PLAN:
            first_slot = len(texts)
            gid = block_id * BLOCK + first_slot
            if cls == "single":
                n = int(40 + 260 * rng.random() ** 2)
                texts.append(_doc_text(_draw_tokens(rng, n, spec.vocab_size)))
                classes.append(cls)
                clusters.append(gid)
                continue
            n = int(60 + 200 * rng.random() ** 2)
            base = _draw_tokens(rng, n, spec.vocab_size)
            if cls == "exact":
                base_text = _doc_text(base)
                for _ in range(size):
                    texts.append(base_text)
            elif cls == "near":
                texts.append(_doc_text(base))
                for _ in range(size - 1):
                    texts.append(_doc_text(
                        _mutate(rng, base, 0.01 + 0.02 * rng.random(),
                                spec.vocab_size)))
            elif cls == "boiler":
                # shared template; each member swaps one contiguous ~15% span
                span = max(4, int(0.15 * n))
                pos = int(rng.integers(0, n - span))
                for _ in range(size):
                    doc = base.copy()
                    doc[pos:pos + span] = _draw_tokens(rng, span, spec.vocab_size)
                    texts.append(_doc_text(doc))
            elif cls == "contain":
                # member 0 = A; others embed A verbatim with ~12% pre/post pad
                texts.append(_doc_text(base))
                for _ in range(size - 1):
                    pad = max(2, int(0.12 * n))
                    pre = _draw_tokens(rng, pad, spec.vocab_size)
                    post = _draw_tokens(rng, pad, spec.vocab_size)
                    texts.append(_doc_text(np.concatenate([pre, base, post])))
            classes.extend([cls] * size)
            clusters.extend([gid] * size)

    doc_ids = np.arange(block_id * BLOCK, block_id * BLOCK + BLOCK, dtype=np.int64)
    urls = [f"https://example.org/{block_id:08d}/{s:02d}" for s in range(BLOCK)]
    warc_ts = _TS_BASE_US + doc_ids * 60_000_000  # one minute apart
    langs = _LANGS[rng.integers(0, len(_LANGS), size=BLOCK)]

    has_html = rng.random(BLOCK) < spec.html_frac
    null_text = has_html & (rng.random(BLOCK) < spec.null_text_frac / max(spec.html_frac, 1e-9))
    htmls: list[bytes | None] = []
    out_texts: list[str | None] = []
    for i in range(BLOCK):
        if has_html[i]:
            htmls.append(b"<html><head><title></title></head><body><p>"
                         + texts[i].encode() + b"</p></body></html>")
        else:
            htmls.append(None)
        out_texts.append(None if null_text[i] else texts[i])

    pages = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(out_texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
    truth = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "url": pa.array(urls, type=pa.string()),
        "true_cluster": pa.array(clusters, type=pa.int64()),
        "class": pa.array(classes, type=pa.string()),
        # the text that extraction must reproduce byte-identically
        "true_text": pa.array(texts, type=pa.string()),
    })
    return pages, truth


def pages_dataset(spec: PagesSpec, *, blocks_per_task: int = 64):
    """The corpus as a Ray Dataset — generation runs distributed."""
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        tables = [generate_block(int(b), spec)[0] for b in batch["id"]]
        return pa.concat_tables(tables)

    return rd.range(spec.n_blocks).map_batches(
        gen, batch_size=blocks_per_task, batch_format="numpy")


def truth_dataset(spec: PagesSpec, *, blocks_per_task: int = 64):
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        tables = [generate_block(int(b), spec)[1] for b in batch["id"]]
        return pa.concat_tables(tables)

    return rd.range(spec.n_blocks).map_batches(
        gen, batch_size=blocks_per_task, batch_format="numpy")


def generate_pages_table(spec: PagesSpec) -> pa.Table:
    """Driver-side generation for tests (small n only)."""
    return pa.concat_tables(
        generate_block(b, spec)[0] for b in range(spec.n_blocks))


def generate_truth_table(spec: PagesSpec) -> pa.Table:
    return pa.concat_tables(
        generate_block(b, spec)[1] for b in range(spec.n_blocks))
