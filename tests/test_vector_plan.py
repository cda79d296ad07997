"""Differential test: vectorized plan ≡ slow-path row evaluator, plus
sketch accuracy checks (no Ray needed)."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA_JSON,
    transcripts_path,
)
from jsonschema_ray.stages.sketches import HLL, TDigest
from jsonschema_ray.stages.validate import SlowPathValidator, VectorValidator


@pytest.fixture(scope="module")
def planted_table():
    d = transcripts_path("/root/testdata/sf0.001")
    return pa.concat_tables(pq.read_table(f) for f in sorted(glob.glob(d + "/*.parquet")))


@pytest.mark.parametrize("mode", ["first", "all"])
def test_vector_equals_slow_path(planted_table, mode):
    vv = VectorValidator(TRANSCRIPT_SCHEMA_JSON, planted_table.schema, mode=mode)
    out_v = vv(planted_table).to_pandas()
    if mode == "first":
        sv = SlowPathValidator(TRANSCRIPT_SCHEMA_JSON)
        out_s = sv(planted_table).to_pandas()
        key = ["conv_id", "turn_idx", "keyword", "message"]
        a = out_v.sort_values(key).reset_index(drop=True)
        b = out_s.sort_values(key).reset_index(drop=True)
        assert a.equals(b)
        assert len(a) > 0
    else:
        assert len(out_v) >= 0


def test_vector_plan_catches_each_planted_kind(planted_table):
    vv = VectorValidator(TRANSCRIPT_SCHEMA_JSON, planted_table.schema)
    kws = set(vv(planted_table).to_pandas()["keyword"])
    assert {"enum", "minLength", "minimum"} <= kws


def test_hll_accuracy():
    rng = np.random.default_rng(7)
    for true_n in (100, 10_000, 200_000):
        vals = rng.integers(0, true_n * 10, size=true_n * 3)
        vals = np.unique(vals)[:true_n]
        h = HLL(p=12)
        # split across "batches" and merge, like the pipeline does
        parts = np.array_split(vals, 7)
        sketches = []
        for p in parts:
            s = HLL(p=12)
            s.update_values(p)
            sketches.append(s)
        for s in sketches:
            h = h.merge(s)
        est = h.estimate()
        assert abs(est - len(vals)) / len(vals) < 0.05, (true_n, est)


def test_hll_serialization_roundtrip():
    h = HLL(p=12)
    h.update_values(np.arange(1000))
    h2 = HLL.from_bytes(h.to_bytes())
    assert np.array_equal(h.registers, h2.registers)


def test_misra_gries_heavy_hitters():
    """Past-capacity regime: zipf-ish stream, sketch must surface every
    true heavy hitter with counts within the n/(capacity+1) bound, under
    chunked accumulate + merge (the pipeline's partial pattern)."""
    from collections import Counter

    from jsonschema_ray.stages.sketches import MisraGries

    rng = np.random.default_rng(3)
    vals = (rng.zipf(1.3, size=200_000) % 5000).astype(np.int64)
    truth = Counter(vals.tolist())
    merged = MisraGries(capacity=64)
    for chunk in np.array_split(vals, 9):
        part = MisraGries(capacity=64)
        part.update_values(chunk)
        merged = merged.merge(part)
    bound = merged.error_bound()
    assert bound <= 2 * (len(vals) // 65)  # merge adds bounds, stays O(n/cap)
    reported = dict(merged.counts)
    for v, c in truth.most_common(5):
        assert c > bound  # these ARE heavy hitters for this distribution
        assert v in reported, (v, c, bound)
        assert reported[v] <= c  # lower bound
        assert c - reported[v] <= bound
    rt = MisraGries.from_bytes(merged.to_bytes())
    assert rt.counts == merged.counts and rt.n == merged.n


def test_tdigest_quantiles():
    rng = np.random.default_rng(11)
    data = rng.lognormal(3.0, 1.0, size=100_000)
    td = TDigest()
    merged = TDigest()
    for chunk in np.array_split(data, 13):
        part = TDigest()
        part.update(chunk)
        merged = merged.merge(part)
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(data, q)
        est = merged.quantile(q)
        assert abs(est - exact) / exact < 0.05, (q, exact, est)


def _greedy_compress_reference(means, weights, delta):
    """Point-at-a-time k1 greedy merge (the pre-vectorization reference
    implementation) — pins the searchsorted cluster walk in TDigest."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()

    def k(q):
        return (delta / (2 * np.pi)) * np.arcsin(2 * min(max(q, 0.0), 1.0) - 1)

    out_m, out_w = [], []
    cur_m, cur_w = means[0], weights[0]
    w_so_far = 0.0
    for i in range(1, len(means)):
        q0 = w_so_far / total
        q1 = (w_so_far + cur_w + weights[i]) / total
        if k(q1) - k(q0) <= 1.0:
            cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
            cur_w += weights[i]
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_so_far += cur_w
            cur_m, cur_w = means[i], weights[i]
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def test_tdigest_compress_matches_greedy_reference():
    rng = np.random.default_rng(23)
    for data in (
        rng.normal(0, 1, 5000),
        rng.lognormal(2, 1.5, 5000),
        np.repeat(rng.integers(0, 20, 50).astype(np.float64), 100),  # heavy ties
        np.array([1.0]),
        np.array([3.0, 3.0, 3.0]),
    ):
        td = TDigest(delta=100)
        td.means = data.astype(np.float64).copy()
        td.weights = np.ones(len(data))
        td._compress()
        rm, rw = _greedy_compress_reference(
            data.astype(np.float64), np.ones(len(data)), 100
        )
        assert len(td.means) == len(rm), (len(td.means), len(rm))
        np.testing.assert_allclose(td.weights, rw, rtol=0, atol=1e-9)
        np.testing.assert_allclose(td.means, rm, rtol=1e-12, atol=1e-12)


# -- hypothesis fuzz: vector plan ≡ slow path on arbitrary rows -------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _texts = st.one_of(
        st.none(),
        st.text(max_size=30),
        st.just(""),
        st.just("x" * 2001),
        st.text(alphabet="é中\U0001F600a ", max_size=12),
    )
    _convs = st.one_of(
        st.none(),
        st.from_regex(r"conv-[0-9]{8}", fullmatch=True),
        st.text(alphabet="conv-0123456789x", max_size=16),
    )
    _roles = st.one_of(
        st.none(), st.sampled_from(["system", "user", "assistant", "tool", "robot", ""])
    )
    _tools = st.one_of(
        st.none(), st.sampled_from(["search", "python", "browser", "nonsense", ""])
    )
    _turns = st.one_of(
        st.none(), st.integers(min_value=-5, max_value=5), st.just(100000001)
    )
    _row = st.fixed_dictionaries(
        {
            "conv_id": _convs,
            "turn_idx": _turns,
            "role": _roles,
            "text": _texts,
            "tool": _tools,
            "ts": st.one_of(st.none(), st.integers(min_value=0, max_value=2**40)),
        }
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(_row, min_size=1, max_size=8))
    def test_fuzz_vector_equals_slow_path(rows):
        t = pa.table(
            {
                "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
                "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
                "role": pa.array([r["role"] for r in rows], pa.string()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "tool": pa.array([r["tool"] for r in rows], pa.string()),
                "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            }
        )
        vv = VectorValidator(TRANSCRIPT_SCHEMA_JSON, t.schema, mode="first")
        sv = SlowPathValidator(TRANSCRIPT_SCHEMA_JSON)
        key = ["conv_id", "turn_idx", "keyword", "message"]
        a = vv(t).to_pandas().sort_values(key).reset_index(drop=True)
        b = sv(t).to_pandas().sort_values(key).reset_index(drop=True)
        assert a.equals(b), (a.to_string(), b.to_string())

    # -- schema fuzz: random flat schemas × random rows ---------------------

    _base_sub_opts = {
        "type": st.sampled_from(
            ["string", "integer", "number", ["string", "null"], ["integer"]]
        ),
        "minLength": st.integers(0, 5),
        "maxLength": st.integers(0, 8),
        "pattern": st.sampled_from(["^a", "b$", "[0-9]+", "^$"]),
        "minimum": st.sampled_from([0, 3, 2.5, -1]),
        "maximum": st.sampled_from([4, 100, 7.5]),
        "multipleOf": st.sampled_from([1, 2, 0.5, 3]),
        # extreme members exercise the per-value conversion fallback:
        # 10**19 overflows int64, 1e300 fails int columns, 2**53+1 is
        # past float64's exact-integer range
        "enum": st.lists(
            st.sampled_from(
                ["aa", "b", 1, 2, 2.5, True, None, 10**19, 1e300, 2**53 + 1]
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda v: (type(v).__name__, str(v)),
        ),
    }
    _base_sub = st.fixed_dictionaries({}, optional=_base_sub_opts)
    _sub_schemas = st.fixed_dictionaries(
        {},
        optional={
            **_base_sub_opts,
            "allOf": st.lists(_base_sub, min_size=1, max_size=2),
            "anyOf": st.lists(_base_sub, min_size=1, max_size=2),
            "oneOf": st.lists(_base_sub, min_size=1, max_size=2),
            "not": _base_sub,
            "minItems": st.integers(0, 3),
            "maxItems": st.integers(0, 4),
            "uniqueItems": st.booleans(),
            "items": st.fixed_dictionaries(
                {},
                optional={
                    "type": st.sampled_from(["number", "integer", ["number", "null"]]),
                    "minimum": st.sampled_from([0, 1.5, -1]),
                    "maximum": st.sampled_from([2, 3.5]),
                    "multipleOf": st.sampled_from([1, 0.5]),
                },
            ),
        },
    )
    _schemas = st.fixed_dictionaries(
        {},
        optional={
            "properties": st.dictionaries(
                st.sampled_from(["s1", "s2", "n1", "n2", "l1"]), _sub_schemas, max_size=3
            ),
            "patternProperties": st.dictionaries(
                st.sampled_from(["^s", "1$", "n"]), _sub_schemas, max_size=2
            ),
            "required": st.lists(
                st.sampled_from(["s1", "s2", "n1", "n2", "zz"]),
                max_size=3,
                unique=True,
            ),
            "additionalProperties": st.one_of(st.booleans(), _base_sub),
            "dependencies": st.dictionaries(
                st.sampled_from(["s1", "n1"]),
                st.one_of(
                    st.lists(
                        st.sampled_from(["s2", "n2"]), min_size=1, max_size=2, unique=True
                    ),
                    st.fixed_dictionaries(
                        {},
                        optional={
                            "properties": st.dictionaries(
                                st.sampled_from(["s2", "n2"]), _sub_schemas, max_size=2
                            ),
                            "required": st.lists(
                                st.sampled_from(["s2", "n2"]), max_size=2, unique=True
                            ),
                        },
                    ),
                ),
                max_size=2,
            ),
        },
    )
    _fuzz_rows = st.lists(
        st.fixed_dictionaries(
            {
                "s1": st.one_of(st.none(), st.sampled_from(["aa", "b", "a1", ""])),
                "s2": st.one_of(st.none(), st.sampled_from(["aa", "xb", "123"])),
                "n1": st.one_of(st.none(), st.integers(-2, 8)),
                "n2": st.one_of(
                    st.none(),
                    st.sampled_from(
                        # 2^53 floats probe the lossy-double enum hazard
                        [0.5, 2.0, 2.5, 7.5, -1.0, 9007199254740992.0, 1e300]
                    ),
                ),
                "l1": st.one_of(
                    st.none(),
                    st.lists(
                        st.one_of(
                            st.none(), st.sampled_from([0.0, 1.0, 1.5, 3.0, -1.0])
                        ),
                        max_size=5,
                    ),
                ),
            }
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=300, deadline=None)
    @given(_schemas, _fuzz_rows)
    def test_fuzz_random_schema_vector_equals_slow_path(schema_dict, rows):
        import json as _json

        from jsonschema_ray.vector.plan import UnsupportedPlanError

        schema_json = _json.dumps({"type": "object", **schema_dict})
        t = pa.table(
            {
                "id": pa.array([f"r{i}" for i in range(len(rows))], pa.string()),
                "s1": pa.array([r["s1"] for r in rows], pa.string()),
                "s2": pa.array([r["s2"] for r in rows], pa.string()),
                "n1": pa.array([r["n1"] for r in rows], pa.int64()),
                "n2": pa.array([r["n2"] for r in rows], pa.float64()),
                "l1": pa.array([r["l1"] for r in rows], pa.list_(pa.float64())),
            }
        )
        try:
            vv = VectorValidator(schema_json, t.schema, id_cols=("id",))
        except UnsupportedPlanError:
            return  # slow-path-only shape: out of scope here
        if vv.plan.static_violations:
            # schema-level (table-scoped) violations are deliberately
            # reported once per partition by the pipeline, not per row —
            # the per-row differential doesn't apply
            return
        sv = SlowPathValidator(schema_json, id_cols=("id",))
        key = ["id", "keyword", "message"]
        a = vv(t).to_pandas().sort_values(key).reset_index(drop=True)
        b = sv(t).to_pandas().sort_values(key).reset_index(drop=True)
        assert a.equals(b), (schema_json, a.to_string(), b.to_string())

except ImportError:  # pragma: no cover
    pass
