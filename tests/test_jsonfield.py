"""JSON scalar-field extraction (functions/jsonfield.py): the one-pass
regex fast path must agree with exact ``json.loads`` on every shape,
including the rows the vectorized guard routes to the fallback
(nesting, arrays, escapes)."""

import json

import pyarrow as pa
import pytest

from fupi_ray.functions.jsonfield import json_scalar_field


def _exact(rows, key, typ):
    out = []
    for r in rows:
        try:
            obj = json.loads(r) if r is not None else None
        except (ValueError, TypeError):
            obj = None
        got = obj.get(key) if isinstance(obj, dict) else None
        if typ == "bool":
            out.append(got if isinstance(got, bool) else None)
        elif typ == "string":
            out.append(got if isinstance(got, str) else None)
        elif isinstance(got, bool) or not isinstance(got, (int, float)):
            out.append(None)
        elif typ == "int":
            out.append(round(float(got)))
        else:
            out.append(float(got))
    return out


FLAT = [
    '{"k": 87}',
    '{"k": 0}',
    '{"k": -12}',
    '{"other": 1}',
    '{"k": null}',
    None,
    "",
    "not json",
    '{"k": 3, "m": 9}',
    '{"m": 9, "k": 4}',
]
TRICKY = [
    '{"a": {"k": 99}}',                     # nested object: its k is NOT ours
    '{"k": 5, "a": {"k": 99}}',             # ours first, decoy nested
    '{"a": {"k": 99}, "k": 6}',             # decoy first, ours second
    '{"s": "fake \\"k\\": 123", "k": 7}',   # escaped quotes shift boundaries
    '{"list": [1, 2, 3], "k": 8}',          # array triggers the guard
    '{"k": [1, 2]}',                        # our key holds a container: null
]


@pytest.mark.parametrize("typ", ["int", "float"])
def test_numeric_flat_and_tricky(typ):
    rows = FLAT + TRICKY
    got = json_scalar_field(pa.array(rows, pa.string()), "k", typ).to_pylist()
    assert got == _exact(rows, "k", typ)


def test_float_values():
    rows = ['{"k": 1.5}', '{"k": -2.25e2}', '{"k": 87}']
    got = json_scalar_field(pa.array(rows, pa.string()), "k", "float").to_pylist()
    assert got == [1.5, -225.0, 87.0]


def test_string_values_incl_escapes():
    rows = [
        '{"k": "plain"}',
        '{"k": ""}',
        '{"k": "with \\"quotes\\""}',  # fallback path: exact unescape
        '{"k": 7}',                    # number where string asked: null
        '{"other": "x"}',
        None,
    ]
    got = json_scalar_field(pa.array(rows, pa.string()), "k", "string").to_pylist()
    assert got == _exact(rows, "k", "string")
    assert got[2] == 'with "quotes"'


def test_bool_values():
    rows = ['{"k": true}', '{"k": false}', '{"k": 1}', '{"a": [true], "k": true}', None]
    got = json_scalar_field(pa.array(rows, pa.string()), "k", "bool").to_pylist()
    assert got == _exact(rows, "k", "bool")


def test_regex_key_is_escaped():
    rows = ['{"a.b": 5, "aXb": 7}']
    got = json_scalar_field(pa.array(rows, pa.string()), "a.b", "int").to_pylist()
    assert got == [5]


def test_chunked_input_and_bad_type():
    col = pa.chunked_array([pa.array(['{"k": 1}']), pa.array(['{"k": 2}'])])
    assert json_scalar_field(col, "k", "int").to_pylist() == [1, 2]
    with pytest.raises(ValueError):
        json_scalar_field(pa.array([], pa.string()), "k", "uuid")


def test_duplicate_key_takes_last_like_json():
    rows = ['{"k": 1, "k": 2}', '{"k": 9}']
    got = json_scalar_field(pa.array(rows, pa.string()), "k", "int").to_pylist()
    assert got == [2, 9]
