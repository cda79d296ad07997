"""Regression tests for the round-1 ADVICE findings: fast-path (vector/plan)
vs slow-path divergences.  All pure Arrow — no Ray session needed."""

from __future__ import annotations

import pyarrow as pa
import pytest

from jsonschema_ray.core import parse
from jsonschema_ray.stages.validate import SlowPathValidator, VectorValidator
from jsonschema_ray.vector.plan import UnsupportedPlanError, compile_plan

KEY = ["id", "keyword", "message"]


def _diff(schema_json: str, table: pa.Table):
    """Run both engines, return (fast_df, slow_df) sorted for comparison."""
    vv = VectorValidator(schema_json, table.schema, id_cols=("id",))
    sv = SlowPathValidator(schema_json, id_cols=("id",))
    a = vv(table).to_pandas().sort_values(KEY).reset_index(drop=True)
    b = sv(table).to_pandas().sort_values(KEY).reset_index(drop=True)
    return a, b


# -- ADVICE high #1: float bounds/multipleOf must use decimal lexemes -------


def test_multiple_of_decimal_float():
    # 0.3 IS a multiple of 0.1 under decimal-lexeme semantics (3/10 ÷ 1/10 = 3);
    # the binary expansion Fraction(0.3)/Fraction(0.1) is not an integer.
    schema = '{"type":"object","properties":{"x":{"multipleOf":0.1}}}'
    t = pa.table(
        {
            "id": pa.array(["r0", "r1", "r2"], pa.string()),
            "x": pa.array([0.3, 0.25, None], pa.float64()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    assert list(a["id"]) == ["r1"]  # only 0.25 violates
    assert "5/2 is not multiple of 1/10" in a["message"][0]


def test_minimum_message_decimal_rational():
    schema = '{"type":"object","properties":{"y":{"minimum":0.3},"z":{"maximum":0.1}}}'
    t = pa.table(
        {
            "id": pa.array(["r0", "r1"], pa.string()),
            "y": pa.array([0.2, 0.5], pa.float64()),
            "z": pa.array([0.05, 0.3], pa.float64()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    msgs = list(a["message"])
    assert any("value 1/5 is smaller than 3/10" in m for m in msgs)
    assert any("value 3/10 is bigger than 1/10" in m for m in msgs)


# -- ADVICE high #2: additionalProperties schema form must not be dropped ---


def test_additional_properties_schema_form_vectorized_diff():
    """The schema form compiles against every unmatched column (ADVICE
    round-1 case: violations on extra columns must not be dropped)."""
    schema = (
        '{"type":"object","properties":{"id":{"type":"string"}},'
        '"additionalProperties":{"type":"number"}}'
    )
    t = pa.table(
        {
            "id": pa.array(["r0", "r1"], pa.string()),
            "x": pa.array(["oops", None], pa.string()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    assert list(a["id"]) == ["r0"]
    assert a["keyword"][0] == "type"
    assert (
        a["message"][0]
        == 'object: "x": additionalProperties: string: type is not allowed'
    )


def test_additional_properties_bool_true_still_vectorizes():
    schema = parse(
        '{"type":"object","properties":{"id":{"type":"string"}},'
        '"additionalProperties":true}'
    )
    arrow_schema = pa.schema([("id", pa.string()), ("x", pa.string())])
    plan = compile_plan(schema, arrow_schema)
    assert plan.static_violations == []


# -- ADVICE medium #3: mixed-type enum must not flag matching values --------


def test_mixed_type_enum():
    schema = (
        '{"type":"object","properties":'
        '{"s":{"enum":["a",1]},"n":{"enum":["a",1]}}}'
    )
    t = pa.table(
        {
            "id": pa.array(["r0", "r1", "r2"], pa.string()),
            "s": pa.array(["a", "b", None], pa.string()),
            "n": pa.array([1, 2, None], pa.int64()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    flagged = set(zip(a["id"], a["keyword"]))
    assert ("r1", "enum") in flagged  # s="b" and n=2 both violate
    assert not any(i == "r0" for i, _ in flagged)  # "a" and 1 both match


def test_enum_bool_never_equals_int():
    # JSON true != 1 (type tags differ, equal.go:177-185).
    schema = '{"type":"object","properties":{"n":{"enum":[true]}}}'
    t = pa.table(
        {
            "id": pa.array(["r0"], pa.string()),
            "n": pa.array([1], pa.int64()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    assert list(a["id"]) == ["r0"]


def test_enum_nonintegral_float_on_int_column():
    schema = '{"type":"object","properties":{"n":{"enum":[1.5]}}}'
    t = pa.table(
        {
            "id": pa.array(["r0", "r1"], pa.string()),
            "n": pa.array([1, 2], pa.int64()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    assert set(a["id"]) == {"r0", "r1"}  # no int can equal 1.5


# -- ADVICE low #4: min/maxProperties need distinct keywords/messages -------


def test_min_max_properties_distinct_messages():
    schema = '{"type":"object","minProperties":2,"maxProperties":2}'
    t = pa.table(
        {
            "id": pa.array(["r0", "r1", "r2"], pa.string()),
            "a": pa.array([None, "x", "x"], pa.string()),
            "b": pa.array([None, None, "y"], pa.string()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    by_id = dict(zip(a["id"], zip(a["keyword"], a["message"])))
    assert by_id["r0"][0] == "minProperties"
    assert "length is smaller than 2" in by_id["r0"][1]
    assert by_id["r2"][0] == "maxProperties"
    assert "length is bigger than 2" in by_id["r2"][1]
    assert "r1" not in by_id


# -- round-2: patternProperties in the vectorized plan ----------------------


def test_pattern_properties_vectorized_diff():
    """patternProperties compiled against static column names: fast path
    must match the slow path, including the `pattern "re"` wrap context."""
    schema = (
        '{"type":"object",'
        '"patternProperties":{"^t": {"minLength": 4}, "ool$": {"pattern": "^[a-z]+$"}},'
        '"properties":{"tool":{"maxLength": 6}}}'
    )
    t = pa.table(
        {
            "id": pa.array(["r0", "r1", "r2", "r3"], pa.string()),
            "tool": pa.array(["ok", "Bad", "toolongvalue", None], pa.string()),
            "other": pa.array(["x", "y", "z", "w"], pa.string()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    # r0 "ok": ^t minLength 4 fails first (declaration order)
    by_id = dict(zip(a["id"], a["message"]))
    assert 'pattern "^t": string: length is smaller than 4' in by_id["r0"]
    assert "r3" not in by_id  # NULL = absent key: no pattern applies


def test_pattern_properties_additional_false_coverage():
    """A column matched only by a patternProperties regex is NOT an
    additional property (validate.go:484-496)."""
    from jsonschema_ray.core import parse as _parse
    from jsonschema_ray.vector.plan import compile_plan

    schema = _parse(
        '{"type":"object","properties":{"id":{"type":"string"}},'
        '"patternProperties":{"^x_": {}},"additionalProperties":false}'
    )
    arrow_schema = pa.schema(
        [("id", pa.string()), ("x_extra", pa.string()), ("rogue", pa.string())]
    )
    plan = compile_plan(schema, arrow_schema)
    flagged = {c for c, _kw, _m in plan.static_violations}
    assert flagged == {"rogue"}


def test_pattern_properties_fuzz_differential():
    """Randomized rows through a schema mixing properties/patternProperties
    with overlap: fast ≡ slow on every row."""
    import numpy as np

    rng = np.random.default_rng(21)
    schema = (
        '{"type":"object",'
        '"patternProperties":{"^v": {"minimum": 0}, "2$": {"maximum": 50}},'
        '"properties":{"v2":{"multipleOf": 2}}}'
    )
    n = 200
    t = pa.table(
        {
            "id": pa.array([f"r{i}" for i in range(n)], pa.string()),
            "v1": pa.array(rng.integers(-5, 10, n), pa.int64()),
            "v2": pa.array(rng.integers(-5, 100, n), pa.int64()),
            "w2": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.head(20).to_string(), b.head(20).to_string())
    assert len(a) > 0


# -- round-2: property-level composition in the vectorized plan -------------


def test_property_composition_vectorized_diff():
    """allOf/anyOf/oneOf/not compile to mask algebra; messages and
    fail-fast order must match the exact engine."""
    schema = (
        '{"type":"object","properties":{'
        '"a":{"allOf":[{"minLength":2},{"pattern":"^x"}]},'
        '"b":{"anyOf":[{"minimum":10},{"maximum":0}]},'
        '"c":{"oneOf":[{"minimum":5},{"multipleOf":2}]},'
        '"d":{"not":{"pattern":"bad"}}}}'
    )
    t = pa.table(
        {
            "id": pa.array(["r0", "r1", "r2", "r3", "r4", "r5"], pa.string()),
            "a": pa.array(["xy", "q", None, "xlong", "yy", None], pa.string()),
            "b": pa.array([5, 20, -3, None, 11, 20], pa.int64()),
            "c": pa.array([7, 4, 6, 3, None, 7], pa.int64()),
            "d": pa.array(["fine", "so bad", None, "ok", "bad", "bad"], pa.string()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    msgs = set(a["message"])  # fail-fast: each row reports its FIRST hit
    assert any("allOf: [1]: string: does not match pattern ^x" in m for m in msgs)
    assert any("anyOf: must match at least once" in m for m in msgs)
    assert any("oneOf: must match exactly once" in m for m in msgs)
    assert any("oneOf: must match at least once" in m for m in msgs)
    assert 'object: "d": not: must not match' in msgs  # r5: only d violates


# -- round-2: list-column (array) keywords in the vectorized plan -----------


def test_array_keywords_vectorized_diff():
    """min/maxItems, uniqueItems and single-schema items vectorize over
    the flattened child array; messages recompute the first offending
    element through the exact engine."""
    schema = (
        '{"type":"object","properties":{"e":'
        '{"minItems":2,"maxItems":4,"uniqueItems":true,'
        '"items":{"type":"number","minimum":0}}}}'
    )
    t = pa.table(
        {
            "id": pa.array(["r0", "r1", "r2", "r3", "r4", "r5"], pa.string()),
            "e": pa.array(
                [
                    [1.0, 2.0],          # ok
                    [1.0],               # minItems
                    [1.0, 1.0, 3.0],     # uniqueItems
                    [1.0, -2.0],         # items minimum on [1]
                    [1.0, 2.0, 3.0, 4.0, 5.0],  # maxItems
                    None,                # absent key: nothing fires
                ],
                pa.list_(pa.float64()),
            ),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    by_id = dict(zip(a["id"], zip(a["keyword"], a["message"])))
    assert by_id["r1"] == ("minItems", 'object: "e": array: length is smaller than 2')
    assert by_id["r2"][0] == "uniqueItems"
    assert "items 0 and 1 are equal" in by_id["r2"][1]
    assert by_id["r3"][0] == "minimum"
    assert by_id["r3"][1] == 'object: "e": array: [1]: number: value -2/1 is smaller than 0/1'
    assert by_id["r4"] == ("maxItems", 'object: "e": array: length is bigger than 4')
    assert "r0" not in by_id and "r5" not in by_id


def test_array_null_elements_diff():
    """NULL elements are JSON nulls: they violate a non-null items type
    and pair up under uniqueItems — fast ≡ slow on both."""
    schema_t = '{"type":"object","properties":{"e":{"items":{"type":"integer"}}}}'
    schema_u = '{"type":"object","properties":{"e":{"uniqueItems":true}}}'
    t = pa.table(
        {
            "id": pa.array(["r0", "r1"], pa.string()),
            "e": pa.array([[1, None, 3], [None, None]], pa.list_(pa.int64())),
        }
    )
    for schema in (schema_t, schema_u):
        a, b = _diff(schema, t)
        assert a.equals(b), (schema, a.to_string(), b.to_string())
        assert len(a) > 0


# -- round-2: dependentSchemas in the vectorized plan -----------------------


def test_dependent_schemas_vectorized_diff():
    """dependentSchemas of flat shape compile conditioned on the trigger
    key's presence; fast ≡ slow including the `dependent "k"` wrap and
    the before-the-key-loop fail-fast position."""
    schema = (
        '{"type":"object","properties":{"id":{"type":"string"}},'
        '"dependencies":{"a":{"properties":{"n":{"minimum":10}},"required":["b"]}}}'
    )
    t = pa.table(
        {
            "id": pa.array(["r0", "r1", "r2", "r3"], pa.string()),
            "a": pa.array(["x", None, "x", "x"], pa.string()),
            "b": pa.array([None, None, "y", "y"], pa.string()),
            "n": pa.array([50, 3, 3, 50], pa.int64()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    by_id = dict(zip(a["id"], a["message"]))
    # r0: a present, b missing → dependent required fires
    assert by_id["r0"] == 'object: dependent "a": object: required property "b" is missing'
    # r1: a absent → no dependent checks despite n < 10
    assert "r1" not in by_id
    # r2: a present, n=3 violates the dependent minimum
    assert 'dependent "a": object: "n": number: value 3/1 is smaller than 10/1' in by_id["r2"]
    assert "r3" not in by_id


def test_dependent_schemas_rich_shape_falls_back():
    from jsonschema_ray.core import parse as _parse
    from jsonschema_ray.vector.plan import compile_plan

    schema = _parse(
        '{"type":"object","dependencies":{"a":{"minProperties":2}}}'
    )
    arrow_schema = pa.schema([("id", pa.string()), ("a", pa.string())])
    with pytest.raises(UnsupportedPlanError):
        compile_plan(schema, arrow_schema)


# -- ADVICE low #5: dependentRequired keyword parity ------------------------


def test_dependent_required_keyword_parity():
    schema = (
        '{"type":"object","properties":{"id":{"type":"string"}},'
        '"dependencies":{"a":["b"]}}'
    )
    t = pa.table(
        {
            "id": pa.array(["r0", "r1"], pa.string()),
            "a": pa.array(["x", None], pa.string()),
            "b": pa.array([None, None], pa.string()),
        }
    )
    a, b = _diff(schema, t)
    assert a.equals(b), (a.to_string(), b.to_string())
    assert list(a["id"]) == ["r0"]
    assert a["keyword"][0] == "required"  # matches _keyword_of on both paths
