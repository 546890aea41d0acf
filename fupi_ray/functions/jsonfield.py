"""Vectorized scalar-field extraction from a JSON string column.

The reference ingests JSONL via duckdb's ``read_json_auto``
(fupi/data.py) — whole-record parsing at load time. This kernel covers
the other common shape at pipeline scale: a table column holding small
JSON objects (event properties, API payloads) from which ONE scalar
field is needed. Parsing every row with ``json.loads`` is a per-row
Python loop in the hot path; this extractor runs one Arrow RE2 pass
(``pc.extract_regex``) over the whole column and falls back to exact
``json.loads`` ONLY for the rows where a regex cannot be trusted —
nested containers or escaped strings, detected vectorized — so the
result equals duckdb's ``json_extract`` on every input while the flat
fast path (the overwhelming majority in event data) never touches
Python.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# value sub-patterns per extraction type (JSON grammar, no containers)
_NUM = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
_PATTERNS = {
    "int": rf"(?P<v>{_NUM})",
    "float": rf"(?P<v>{_NUM})",
    # string fast path only when the value has no backslash escapes;
    # escaped rows are routed to the exact fallback by the guard below
    "string": r'"(?P<v>[^"\\]*)"',
    "bool": r"(?P<v>true|false)",
}


def _key_pattern(key: str, value_type: str) -> str:
    # RE2 has no lookbehind: anchor on the quoted key followed by a
    # colon. Key chars are regex-escaped; RE2-over-UTF8 matches bytes
    # exactly like duckdb's regexp functions.
    esc = "".join("\\" + c if not c.isalnum() else c for c in key)
    return rf'"{esc}"\s*:\s*{_PATTERNS[value_type]}'


def _needs_exact(arr: pa.Array, key: str) -> np.ndarray:
    """Rows where the one-pass regex might lie: any nesting (a ``{`` or
    ``[`` beyond the opening brace — the key could sit inside a child
    object), any backslash (escaped quotes shift string boundaries;
    also the only way ``"key"`` can hide inside a string VALUE), or the
    quoted key appearing more than once (duplicate keys: JSON semantics
    keep the LAST, the regex would take the first). One vectorized
    count pass each; event-style flat objects never trip it."""
    s = pc.fill_null(arr, "")
    nested = pc.greater(
        pc.count_substring(s, "{"), 1
    )  # opening brace itself counts once
    listy = pc.greater(pc.count_substring(s, "["), 0)
    escaped = pc.greater(pc.count_substring(s, "\\"), 0)
    dupkey = pc.greater(pc.count_substring(s, f'"{key}"'), 1)
    return pc.or_(
        pc.or_(pc.or_(nested, listy), escaped), dupkey
    ).to_numpy(zero_copy_only=False)


def json_scalar_field(
    col, key: str, value_type: str = "int"
) -> pa.Array:
    """Extract ``key``'s scalar value from every JSON object in
    ``col``; returns int64 / float64 / string / bool with nulls where
    the key is absent, the value is null, or the row is not an object.

    Equivalent duckdb: ``CAST(col->>'key' AS BIGINT/DOUBLE/VARCHAR/
    BOOLEAN)``. Exact on ALL inputs: rows with nested containers or
    escape sequences (where the single regex pass could mis-anchor)
    are re-parsed with ``json.loads`` — detected vectorized, so flat
    event payloads pay zero per-row Python.
    """
    if value_type not in _PATTERNS:
        raise ValueError(f"value_type must be one of {sorted(_PATTERNS)}")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    st = pc.extract_regex(arr, _key_pattern(key, value_type))
    raw = pc.struct_field(st, "v")
    exact_rows = np.flatnonzero(_needs_exact(arr, key))
    if len(exact_rows):
        vals = raw.to_pylist()
        for i in exact_rows:
            v = arr[int(i)].as_py()
            try:
                obj = json.loads(v) if v is not None else None
            except (ValueError, TypeError):
                obj = None
            got = obj.get(key) if isinstance(obj, dict) else None
            if value_type == "bool":
                vals[int(i)] = (
                    ("true" if got else "false") if isinstance(got, bool) else None
                )
            elif value_type == "string":
                vals[int(i)] = got if isinstance(got, str) else None
            elif isinstance(got, bool) or not isinstance(got, (int, float)):
                vals[int(i)] = None
            else:
                vals[int(i)] = repr(got)
        raw = pa.array(vals, pa.string())
    if value_type == "int":
        # via float so fractional values ("1.5") land like duckdb's
        # json ->> BIGINT lane instead of erroring the checked cast
        f = pc.cast(raw, pa.float64())
        return pc.cast(pc.round(f), pa.int64())
    if value_type == "float":
        return pc.cast(raw, pa.float64())
    if value_type == "bool":
        return pc.equal(raw, "true")
    return pc.cast(raw, pa.string())
