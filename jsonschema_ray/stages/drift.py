"""Distribution-drift checks: two-sample KS and chi-square vs a baseline.

Per the north star: a baseline *profile* of a reference (clean) table is
built once and held in actor/driver state; candidate tables are tested
against it:

* **chi-square** over categorical columns (role, tool) — exact category
  counts from mergeable per-batch partials;
* **Kolmogorov–Smirnov** over integer-valued numeric features (text length
  in codepoints, turn_idx) — per-value exact histograms make the two-sample
  KS statistic *exact*, not approximated, while still being an associative
  partial merge (no shuffle; SURVEY.md §2.5).

Statistics are classical public formulas (e.g. NIST handbook): KS D =
sup|F1-F2|; chi-square X² = Σ (O-E)²/E with E scaled to the candidate's
total.  Violation rows use keyword ``drift`` (FIXTURES.md §4).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "drift_profile",
    "drift_compare",
    "drift_violations",
    "DriftScanner",
    "drift_scan",
    "save_baseline",
    "load_baseline",
    "DEFAULT_DRIFT_FEATURES",
]

DEFAULT_DRIFT_FEATURES = {
    "categorical": ["role", "tool"],
    "numeric": ["text_len", "turn_idx"],
}


def _feature_arrays(batch: pa.Table, features) -> dict[str, np.ndarray]:
    out = {}
    for col in features["categorical"]:
        vals = batch[col].fill_null("∅null").to_pylist()
        out[col] = vals
    for col in features["numeric"]:
        if col == "text_len":
            arr = pc.utf8_length(batch["text"]).drop_null().to_numpy(
                zero_copy_only=False
            )
        else:
            arr = batch[col].drop_null().to_numpy(zero_copy_only=False)
        out[col] = arr.astype(np.int64)
    return out


class _DriftPartial:
    """map_batches callable emitting mergeable count partials."""

    def __init__(self, features=None) -> None:
        self.features = features or DEFAULT_DRIFT_FEATURES

    def __call__(self, batch: pa.Table) -> pa.Table:
        arrays = _feature_arrays(batch, self.features)
        partial: dict = {}
        for col in self.features["categorical"]:
            vals, counts = np.unique(np.asarray(arrays[col], dtype=object), return_counts=True)
            partial[col] = dict(zip(vals.tolist(), counts.tolist()))
        for col in self.features["numeric"]:
            vals, counts = np.unique(arrays[col], return_counts=True)
            partial[col] = dict(zip(vals.tolist(), counts.tolist()))
        return pa.table({"partial": pa.array([pickle.dumps(partial)], pa.binary())})


def _merge_counts(parts: list[dict]) -> dict:
    acc: dict = {}
    for p in parts:
        for col, counts in p.items():
            dst = acc.setdefault(col, {})
            for k, v in counts.items():
                dst[k] = dst.get(k, 0) + v
    return acc


def drift_profile(ds, features=None) -> dict:
    """Exact per-feature count profile of a Dataset (the drift baseline)."""
    features = features or DEFAULT_DRIFT_FEATURES
    partials = ds.map_batches(
        _DriftPartial(features), batch_format="pyarrow"
    ).take_all()
    return _merge_counts([pickle.loads(r["partial"]) for r in partials])


def _ks_stat(a: dict, b: dict) -> float:
    keys = np.array(sorted(set(a) | set(b)), dtype=np.int64)
    ca = np.array([a.get(int(k), 0) for k in keys], dtype=np.float64)
    cb = np.array([b.get(int(k), 0) for k in keys], dtype=np.float64)
    if ca.sum() == 0 or cb.sum() == 0:
        return 0.0
    fa = np.cumsum(ca) / ca.sum()
    fb = np.cumsum(cb) / cb.sum()
    return float(np.max(np.abs(fa - fb)))


def _chi2_stat(baseline: dict, observed: dict) -> float:
    n_obs = sum(observed.values())
    n_base = sum(baseline.values())
    if n_obs == 0 or n_base == 0:
        return 0.0
    stat = 0.0
    for k in set(baseline) | set(observed):
        e = baseline.get(k, 0) / n_base * n_obs
        o = observed.get(k, 0)
        if e == 0:
            e = 0.5  # Yates-style floor for unseen categories
        stat += (o - e) ** 2 / e
    return float(stat)


def _psi_stat(baseline: dict, observed: dict) -> float:
    """Population stability index: Σ (p_o − p_b)·ln(p_o/p_b) over
    categories, with a 0.5-count floor on either side (the same unseen-
    category convention as :func:`_chi2_stat`) so empty cells stay
    finite.  Totals use RAW counts, so the floor only perturbs absent
    categories.  Classical banking/monitoring rule of thumb: <0.1 stable,
    0.1–0.25 moderate shift, >0.25 major shift."""
    import math

    n_base = sum(baseline.values())
    n_obs = sum(observed.values())
    if n_base == 0 or n_obs == 0:
        return 0.0
    s = 0.0
    for k in set(baseline) | set(observed):
        pb = max(baseline.get(k, 0), 0.5) / n_base
        po = max(observed.get(k, 0), 0.5) / n_obs
        s += (po - pb) * math.log(po / pb)
    return float(s)


def drift_compare(baseline: dict, candidate: dict, features=None) -> dict:
    """→ {column: {stat_name: value}} for every profiled feature."""
    features = features or DEFAULT_DRIFT_FEATURES
    out = {}
    for col in features["categorical"]:
        if col in baseline and col in candidate:
            out[col] = {
                "chi2": round(_chi2_stat(baseline[col], candidate[col]), 6),
                "psi": round(_psi_stat(baseline[col], candidate[col]), 6),
            }
    for col in features["numeric"]:
        if col in baseline and col in candidate:
            out[col] = {"ks": round(_ks_stat(baseline[col], candidate[col]), 6)}
    return out


def drift_violations(
    baseline: dict,
    candidate: dict,
    ks_threshold: float = 0.1,
    chi2_threshold: float = 50.0,
    psi_threshold: float = 0.25,
    features=None,
) -> pa.Table:
    """Violation rows (conv_id='', turn_idx=-1 → table-scoped) per drifted
    feature; thresholds are engine policy, stats are exact."""
    stats = drift_compare(baseline, candidate, features)
    rows = []
    for col, st in sorted(stats.items()):
        if "ks" in st and st["ks"] > ks_threshold:
            rows.append(
                {
                    "conv_id": "",
                    "turn_idx": -1,
                    "keyword": "drift",
                    "message": f"{col}: KS statistic {st['ks']:.6f} exceeds {ks_threshold}",
                }
            )
        if "chi2" in st and st["chi2"] > chi2_threshold:
            rows.append(
                {
                    "conv_id": "",
                    "turn_idx": -1,
                    "keyword": "drift",
                    "message": f"{col}: chi-square statistic {st['chi2']:.6f} exceeds {chi2_threshold}",
                }
            )
        if "psi" in st and st["psi"] > psi_threshold:
            rows.append(
                {
                    "conv_id": "",
                    "turn_idx": -1,
                    "keyword": "drift",
                    "message": f"{col}: PSI {st['psi']:.6f} exceeds {psi_threshold}",
                }
            )
    from .checks import VIOLATION_PA_SCHEMA

    return pa.Table.from_pylist(rows, schema=VIOLATION_PA_SCHEMA)


class DriftScanner:
    """Actor-pool stage: the baseline profile is fetched from the object
    store ONCE per actor (``__init__``), then every batch is scored against
    it — per-batch KS/chi-square give a streaming early-warning signal
    while the exact global statistic still comes from the merged partials
    (:func:`drift_profile` → :func:`drift_compare`).

    The north-star shape: broadcast the small side with ``ray.put`` and
    read it in actor state, never re-ship it per batch."""

    def __init__(self, baseline_ref, features=None) -> None:
        import ray

        self.baseline = ray.get(baseline_ref)
        self.features = features or DEFAULT_DRIFT_FEATURES

    def __call__(self, batch: pa.Table) -> pa.Table:
        partial = _DriftPartial(self.features)(batch)
        counts = pickle.loads(partial["partial"][0].as_py())
        stats = drift_compare(self.baseline, counts, self.features)
        rows = []
        for col, st in sorted(stats.items()):
            for name, v in sorted(st.items()):
                rows.append({"feature": col, "stat": name, "value": float(v), "n_rows": batch.num_rows})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("feature", pa.string()),
                    ("stat", pa.string()),
                    ("value", pa.float64()),
                    ("n_rows", pa.int64()),
                ]
            ),
        )


def drift_scan(ds, baseline: dict, features=None, concurrency=(1, 4), batch_size: int = 65536):
    """Per-batch drift statistics vs a broadcast baseline (actor pool)."""
    import ray

    bref = ray.put(baseline)
    return ds.map_batches(
        DriftScanner,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(baseline_ref=bref, features=features),
    )


def save_baseline(profile: dict, path: str) -> None:
    """Persist a drift baseline profile (atomic write) for cross-run use:
    profile the reference corpus once, then every future validation run
    loads the file instead of re-scanning."""
    import json
    import os

    # v2 envelope records each column's key TYPE: JSON stringifies int
    # keys, and a blind int() coercion on load would turn a categorical
    # column of numeric-LOOKING strings ("200"/"404" status codes) into
    # int keys that never match the candidate profile's string keys —
    # every category would read as unseen and a clean table as drifted
    def _keytype(counts: dict) -> str:
        # bool is a subclass of int — classify it first or int('True')
        # crashes the load
        if counts and all(isinstance(k, bool) for k in counts):
            return "bool"
        if counts and all(
            isinstance(k, (int, np.integer)) and not isinstance(k, bool)
            for k in counts
        ):
            return "int"
        return "str"

    payload = {
        "__drift_baseline__": 2,
        "columns": {
            col: {
                "keytype": _keytype(counts),
                "counts": {str(k): v for k, v in counts.items()},
            }
            for col, counts in profile.items()
        },
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def load_baseline(path: str) -> dict:
    import json

    with open(path) as f:
        raw = json.load(f)
    out: dict = {}
    if isinstance(raw, dict) and raw.get("__drift_baseline__") == 2:
        for col, ent in raw["columns"].items():
            if ent["keytype"] == "int":
                out[col] = {int(k): v for k, v in ent["counts"].items()}
            elif ent["keytype"] == "bool":
                out[col] = {k == "True": v for k, v in ent["counts"].items()}
            else:
                out[col] = dict(ent["counts"])
        return out
    # legacy (v1) file without key-type metadata: best-effort coercion —
    # digit-like keys become ints (correct for numeric features, wrong
    # for numeric-looking categoricals; re-save to upgrade)
    for col, counts in raw.items():
        fixed = {}
        for k, v in counts.items():
            try:
                fixed[int(k)] = v
            except ValueError:
                fixed[k] = v
        out[col] = fixed
    return out
