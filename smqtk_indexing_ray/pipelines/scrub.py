"""Pattern-based text scrubbing: configurable label -> (regex,
replacement) redaction applied in one vectorized pass per document.

The training-data scrub a webtext pipeline runs before tokenization:
PII masking (emails, IPv4s, phone-ish digit runs) and boilerplate-phrase
removal (the "click here / all rights reserved" class).  The reference
has no text front-end at all — this extends the §2.7 webtext front-end
(SURVEY.md) the same way `pipelines/terms.py line_dedup` does.

Engine parity: both Arrow (`pyarrow.compute.replace_substring_regex` /
`count_substring_regex`) and DuckDB (`regexp_replace(..., 'g')` /
`regexp_extract_all`) compile RE2, so the same pattern string produces
identical non-overlapping leftmost matches on both sides — the SQL
oracle is exact, including on the chained output (each pattern applies
to the PREVIOUS pattern's output, in declaration order, on both sides).

Counts are int64 and the totals are int64 sums — bit-exact parity, no
float rounding involved.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from smqtk_indexing_ray.stages._util import stamp_schema

#: Default scrub set: the two PII patterns every corpus scrub starts
#: with.  Callers extend/replace with corpus-specific boilerplate
#: patterns — each entry is (label, RE2 pattern, replacement literal).
SCRUB_DEFAULT: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
)


def pattern_scrub(docs, patterns: tuple[tuple[str, str, str], ...]
                  = SCRUB_DEFAULT):
    """Apply every (label, pattern, replacement) in order to ``text``;
    emit the scrubbed text plus one ``n_<label>`` match count per
    pattern and the total ``n_redactions``.

    Purely batch-local (no shuffle): one compiled-RE2 count + replace
    kernel pair per pattern per batch.  Patterns chain — pattern i+1
    sees pattern i's replacements, exactly like chained
    ``regexp_replace`` CTEs in the oracle.
    """
    from smqtk_indexing_ray.context import ensure_data_context
    ensure_data_context()

    labels = [p[0] for p in patterns]
    schema = pa.schema(
        [("doc_id", pa.int64()), ("clean_text", pa.string())]
        + [(f"n_{lb}", pa.int64()) for lb in labels]
        + [("n_redactions", pa.int64())])

    def scrub(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        txt = pc.fill_null(t["text"], "")
        cols: dict = {"doc_id": t["doc_id"]}
        counts = []
        for label, rx, repl in patterns:
            n = pc.cast(pc.count_substring_regex(txt, pattern=rx),
                        pa.int64())
            counts.append(n)
            txt = pc.replace_substring_regex(txt, pattern=rx,
                                             replacement=repl)
        cols["clean_text"] = pc.cast(txt, pa.string())
        total = counts[0]
        for n in counts[1:]:
            total = pc.add(total, n)
        for lb, n in zip(labels, counts):
            cols[f"n_{lb}"] = n
        cols["n_redactions"] = total
        return pa.table(cols).select([f.name for f in schema])

    out = docs.select_columns(["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")
    return stamp_schema(out, schema)
