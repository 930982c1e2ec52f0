"""Vectorized JSON field extraction over Arrow string columns.

The reference ships no JSON scalar functions (SURVEY.md §2.7 maps the
brief's "string/date/math/array/json scalar fns" row and finds only
math in ``metrics.py`` and bit ops in ``utils/bits.py``); webtext and
event pipelines need them constantly — event payloads, crawler
side-channel metadata, page annotations all arrive as JSON strings.

The kernel is polars' Rust JSON parser applied columnarly
(``Series.str.json_path_match`` — zero Python-per-row work, null on
missing field / invalid document, exactly DuckDB's ``->>'$.path'``
semantics).  An Arrow-regex fallback covers polars-free environments
for top-level INTEGER fields only (the one shape the fallback regex can
extract without a real parser) and raises loudly otherwise.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

try:  # baked into this container; the fallback is for portability
    import polars as _pl
except ImportError:  # pragma: no cover - not exercised in-container
    _pl = None


def json_field_str(arr: pa.Array | pa.ChunkedArray,
                   path: str) -> pa.Array:
    """Extract a JSON path (``$.field`` / ``$.a.b``) from each string,
    as strings: scalars unquoted, null where the document is null,
    invalid JSON, or the path is absent.
    """
    if _pl is None:  # pragma: no cover
        raise NotImplementedError(
            "json_field_str needs polars; only json_field_int64 has a "
            "regex fallback")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = _pl.from_arrow(arr).str.json_path_match(path).to_arrow()
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) \
        else out


def json_field_int64(arr: pa.Array | pa.ChunkedArray,
                     field: str) -> pa.Array:
    """Extract top-level integer ``field`` from each JSON string as
    int64; null where the document is null/invalid, the field is
    absent, or its value is not an integer literal (a QUOTED integer
    string round-trips to its int, matching DuckDB ``->>`` + cast).
    """
    if _pl is not None:
        s = json_field_str(arr, f"$.{field}")
        # a non-integer value (float/str/object) nulls out rather than
        # truncating: round-trip only pure integer literals
        ok = pc.match_substring_regex(s, r"^-?\d+$")
        return pc.cast(pc.if_else(pc.fill_null(ok, False), s, None),
                       pa.int64())
    # regex fallback: top-level unnested scalar ints only
    if isinstance(arr, pa.ChunkedArray):  # pragma: no cover
        arr = arr.combine_chunks()
    got = pc.extract_regex(  # pragma: no cover
        arr, f'"{field}"\\s*:\\s*(?P<v>-?\\d+)[,}}\\s]')
    return pc.cast(pc.struct_field(got, "v"),  # pragma: no cover
                   pa.int64())
