"""Ray-level pipeline tests: clean=0 violations, oracle parity with DuckDB
(the driver's gate, replicated), drift, resume, entry smoke."""

from __future__ import annotations

import os
import shutil

import pytest

from .oracle_harness import run_all

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield


def test_clean_has_zero_violations():
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations
    from jsonschema_ray.sources.transcripts import transcripts_path

    ds = rd.read_parquet(transcripts_path(SF001, "clean"))
    assert transcript_violations(ds).count() == 0


def test_entry_smoke():
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas()
    assert len(df) > 0
    assert list(df.columns) == ["conv_id", "turn_idx", "keyword", "message"]


def test_oracle_parity_all_queries():
    """Replicates the driver's CORRECTNESS gate at sf0.01."""
    res = run_all(SF01)
    failed = {k: v["issues"] for k, v in res.items() if v["issues"] and v["issues"] != ["(rows-only)"]}
    assert not failed, failed
    assert len(res) >= 11


def test_drift_detects_shift():
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.stages.drift import (
        drift_compare,
        drift_profile,
        drift_violations,
    )

    clean = drift_profile(rd.read_parquet(transcripts_path(SF001, "clean")))
    drifted = drift_profile(rd.read_parquet(transcripts_path(SF001, "drift")))
    self_cmp = drift_compare(clean, clean)
    assert self_cmp["text_len"]["ks"] == 0.0
    assert self_cmp["role"]["chi2"] == 0.0
    cmp = drift_compare(clean, drifted)
    assert cmp["text_len"]["ks"] > 0.5
    assert cmp["role"]["chi2"] > 100
    viol = drift_violations(clean, drifted)
    assert viol.num_rows >= 2
    assert set(viol.column_names) == {"conv_id", "turn_idx", "keyword", "message"}


def test_resumable_manifests(tmp_path):
    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.state import run_resumable

    out = str(tmp_path / "out")
    s1 = run_resumable(transcripts_path(SF001), out, shard_size=1)
    assert s1["shards_run"] >= 1 and s1["global_rerun"]
    s2 = run_resumable(transcripts_path(SF001), out, shard_size=1)
    assert s2["shards_run"] == 0 and s2["shards_skipped"] == s1["shards_total"]
    assert not s2["global_rerun"]
    assert s2["row_violations"] == s1["row_violations"]
    shutil.rmtree(out)


def test_profile_matches_exact():
    import duckdb
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.stages.stats import profile_dataset

    path = transcripts_path(SF001)
    prof = profile_dataset(rd.read_parquet(path))
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT COUNT(*), COUNT(*) - COUNT(tool),
                   MIN(turn_idx), MAX(turn_idx),
                   COUNT(DISTINCT conv_id) FROM read_parquet('{path}/*.parquet')"""
    ).fetchone()
    assert prof["tool"]["count"] == exact[0]
    assert prof["tool"]["nulls"] == exact[1]
    assert prof["turn_idx"]["min"] == exact[2]
    assert prof["turn_idx"]["max"] == exact[3]
    hll = prof["conv_id"]["distinct_hll"]
    assert abs(hll - exact[4]) / exact[4] < 0.05
    q = prof["turn_idx"]["quantiles"]
    assert q["0.5"] <= q["0.9"] <= q["0.99"]


def test_conv_checks_salted_matches_bucketed():
    """The skew-proof range-split variant must produce the identical
    violation multiset as the conv-colocated variant — stressed with
    range_size=4 so every conversation splits into many ranges."""
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.stages.checks import conv_checks_salted, conv_checks_violations

    path = transcripts_path("/root/testdata/sf0.001")
    cols = ["conv_id", "turn_idx", "keyword", "message"]
    a = conv_checks_violations(rd.read_parquet(path)).to_pandas()[cols]
    b = conv_checks_salted(rd.read_parquet(path), range_size=4).to_pandas()[cols]
    sa = a.sort_values(cols).reset_index(drop=True)
    sb = b.sort_values(cols).reset_index(drop=True)
    assert sa.equals(sb)


def test_conv_checks_salted_giant_conversation():
    """A single conversation far larger than range_size: duplicates, a gap,
    a start offset and out-of-order ts must all be found across range
    boundaries."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.checks import conv_checks_salted

    n = 5000
    turns = list(range(1, n))  # starts at 1, not 0
    turns.remove(2500)         # gap mid-conversation
    turns.append(700)          # duplicate
    ts = pd.to_datetime([i * 1000 for i in range(len(turns))], unit="us")
    ts_list = list(ts)
    # plant an out-of-order ts far from its range start
    dfi = sorted(range(len(turns)), key=lambda i: turns[i])
    low_pos = dfi[4000]
    ts_list[low_pos] = pd.Timestamp(0)
    t = pa.table(
        {
            "conv_id": pa.array(["conv-giant"] * len(turns)),
            "turn_idx": pa.array(turns, pa.int32()),
            "ts": pa.array(ts_list, pa.timestamp("us")),
        }
    )
    out = conv_checks_salted(rd.from_arrow(t), range_size=64).to_pandas()
    kw = out.groupby("keyword").size().to_dict()
    assert kw.get("uniqueItems", 0) == 1          # the duplicate turn 700
    assert kw.get("contiguity", 0) == 2           # start-at-1 + the 2500 gap
    assert kw.get("order", 0) >= 1                # planted low ts
    assert (out[out["keyword"] == "uniqueItems"]["turn_idx"] == 700).all()


def test_drift_scan_actor_pool_flags_drifted_variant():
    """Per-batch drift scan: the baseline lives in actor state (broadcast
    once); the drifted variant must score visibly higher than the clean one
    on at least one feature."""
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.stages.drift import drift_profile, drift_scan

    sf = "/root/testdata/sf0.001"
    baseline = drift_profile(rd.read_parquet(transcripts_path(sf, "clean")))
    clean = drift_scan(
        rd.read_parquet(transcripts_path(sf, "clean")), baseline, batch_size=2048
    ).to_pandas()
    drifted = drift_scan(
        rd.read_parquet(transcripts_path(sf, "drift")), baseline, batch_size=2048
    ).to_pandas()
    assert set(clean["feature"]) == {"role", "tool", "text_len", "turn_idx"}
    ks_clean = clean[clean["stat"] == "ks"]["value"].mean()
    ks_drift = drifted[drifted["stat"] == "ks"]["value"].mean()
    assert ks_drift > ks_clean * 2  # drifted variant stands out per batch


def test_conformance_suite_as_distributed_table():
    """Every suite case (minus format/refRemote) must match the expected
    verdict when validated as a Ray table — the distributed twin of
    test_core_suite."""
    from jsonschema_ray.sources.suite import suite_dataset, validate_suite

    out = validate_suite(suite_dataset()).to_pandas()
    assert len(out) > 500  # 557 suite cases minus skips, plus custom
    mismatches = out[~out["match"]]
    assert mismatches.empty, mismatches.head(10).to_string()
    # invalid cases must carry a violation message
    assert (out[~out["expect_valid"]]["message"] != "").all()


def test_asof_join_semantics():
    """Left rows with no prior right row get nulls; matches are the most
    recent strictly-earlier right row per key."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.joins import asof_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 2],
                "t": pa.array(pd.to_datetime([100, 200, 50], unit="s"), pa.timestamp("us")),
                "lid": [10, 11, 12],
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 2],
                "t": pa.array(pd.to_datetime([90, 150, 60], unit="s"), pa.timestamp("us")),
                "rid": [20, 21, 22],
            }
        )
    )
    out = (
        asof_join(left, right, by="k", on="t", left_cols=["lid"], right_cols=["rid"])
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert list(out["lid"]) == [10, 11, 12]
    assert list(out["rid_right"].fillna(-1).astype(int)) == [20, 21, -1]


def test_resumable_rerun_only_stale_shard(tmp_path):
    """A shard whose manifest fingerprint no longer matches re-runs alone;
    fresh shards stay skipped."""
    import json

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.state import run_resumable

    out = str(tmp_path / "out")
    s1 = run_resumable(transcripts_path(SF001), out, shard_size=1)
    assert s1["shards_total"] >= 1
    man = os.path.join(out, "shards", "shard=00000", "MANIFEST.json")
    with open(man) as f:
        m = json.load(f)
    m["fingerprint"] = "stale"
    with open(man, "w") as f:
        json.dump(m, f)
    s2 = run_resumable(transcripts_path(SF001), out, shard_size=1)
    assert s2["shards_run"] == 1
    assert s2["shards_skipped"] == s1["shards_total"] - 1
    assert s2["row_violations"] == s1["row_violations"]
    shutil.rmtree(out)


def test_mode_all_emits_every_keyword_per_row():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import TRANSCRIPT_ARROW_SCHEMA
    from jsonschema_ray.sources.transcripts import TRANSCRIPT_SCHEMA_JSON
    from jsonschema_ray.stages.validate import VectorValidator

    # one row violating pattern AND enum AND maxLength simultaneously
    t = pa.table(
        {
            "conv_id": pa.array(["bad-id"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["robot"], pa.string()),
            "text": pa.array(["x" * 3000], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            VectorValidator,
            batch_format="pyarrow",
            concurrency=1,
            fn_constructor_kwargs=dict(
                schema_json=TRANSCRIPT_SCHEMA_JSON,
                arrow_schema=TRANSCRIPT_ARROW_SCHEMA,
                mode="all",
            ),
        )
        .to_pandas()
    )
    assert set(out["keyword"]) == {"pattern", "enum", "maxLength"}
    assert len(out) == 3
    first = (
        rd.from_arrow(t)
        .map_batches(
            VectorValidator,
            batch_format="pyarrow",
            concurrency=1,
            fn_constructor_kwargs=dict(
                schema_json=TRANSCRIPT_SCHEMA_JSON,
                arrow_schema=TRANSCRIPT_ARROW_SCHEMA,
                mode="first",
            ),
        )
        .to_pandas()
    )
    assert len(first) == 1  # fail-fast parity: one violation per row


def test_drift_baseline_persistence(tmp_path):
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.stages.drift import (
        drift_compare,
        drift_profile,
        load_baseline,
        save_baseline,
    )

    prof = drift_profile(rd.read_parquet(transcripts_path(SF001, "clean")))
    p = str(tmp_path / "baseline.json")
    save_baseline(prof, p)
    back = load_baseline(p)
    cmp = drift_compare(back, prof)
    assert cmp["text_len"]["ks"] == 0.0  # round-trip is lossless
    assert cmp["role"]["chi2"] == 0.0


def test_resumable_recovers_from_stray_tmp(tmp_path):
    """A crash mid-shard leaves a .tmp dir; the rerun must replace it and
    complete normally (atomic-rename discipline)."""
    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.state import run_resumable

    out = str(tmp_path / "out")
    stray = os.path.join(out, "shards", "shard=00000.tmp")
    os.makedirs(stray)
    with open(os.path.join(stray, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    s = run_resumable(transcripts_path(SF001), out, shard_size=1)
    assert s["shards_run"] == s["shards_total"]
    assert not os.path.exists(stray)
    assert os.path.exists(os.path.join(out, "shards", "shard=00000", "MANIFEST.json"))
    shutil.rmtree(out)


def test_native_aggregate_fns():
    """HLL and t-digest plug into Dataset.aggregate / groupby().aggregate
    like the built-ins."""
    import duckdb
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.stages.sketches import hll_distinct_agg, tdigest_quantile_agg

    path = transcripts_path(SF001)
    ds = rd.read_parquet(path)
    res = ds.aggregate(
        hll_distinct_agg("conv_id"), tdigest_quantile_agg("turn_idx", 0.5)
    )
    con = duckdb.connect()
    nd, med = con.execute(
        f"""SELECT COUNT(DISTINCT conv_id), MEDIAN(turn_idx)
            FROM read_parquet('{path}/*.parquet')"""
    ).fetchone()
    assert abs(res["hll_distinct(conv_id)"] - nd) / nd < 0.05
    assert abs(res["tdigest_p50(turn_idx)"] - float(med)) <= 1.0
    # grouped form
    g = (
        ds.groupby("role")
        .aggregate(hll_distinct_agg("conv_id"))
        .to_pandas()
    )
    assert len(g) >= 4


def test_schema_level_violations_surface():
    """A table with an unexpected extra column and a missing required
    column must yield table-scoped schema-level violation rows."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    t = pa.table(
        {
            "conv_id": pa.array(["conv-00000001"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["hi"], pa.string()),
            "tool": pa.array([None], pa.string()),
            # no ts column; one unexpected column
            "surprise": pa.array([1], pa.int64()),
        }
    )
    import json

    from jsonschema_ray.sources.transcripts import TRANSCRIPT_SCHEMA_JSON

    strict = json.loads(TRANSCRIPT_SCHEMA_JSON)
    strict["additionalProperties"] = False
    out = transcript_violations(
        rd.from_arrow(t), schema_json=json.dumps(strict), checks=("rows",)
    ).to_pandas()
    static = out[out["turn_idx"] == -1]
    assert "additionalProperties" in set(static["keyword"])
    assert "required" in set(static["keyword"])
    msgs = " | ".join(static["message"])
    assert '"surprise"' in msgs and '"ts"' in msgs


def test_unsupported_schema_falls_back_to_slow_path():
    """A schema outside the vectorizable subset (top-level allOf) must
    still validate — via the exact per-row engine."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    schema = json.dumps(
        {
            "allOf": [
                {"type": "object", "required": ["conv_id"]},
                {"properties": {"turn_idx": {"minimum": 0}}},
            ]
        }
    )
    t = pa.table(
        {
            "conv_id": pa.array(["conv-00000001", None], pa.string()),
            "turn_idx": pa.array([-3, 0], pa.int32()),
            "role": pa.array(["user", "user"], pa.string()),
            "text": pa.array(["a", "b"], pa.string()),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array([0, 1], pa.timestamp("us")),
        }
    )
    out = transcript_violations(
        rd.from_arrow(t), schema_json=schema, checks=("rows",)
    ).to_pandas()
    # row 0: turn_idx -3 < 0; row 1: conv_id missing
    assert len(out) == 2
    assert "allOf" in " ".join(out["message"]) or "required" in " ".join(out["message"])


def test_quarantine_split_partitions_rows():
    """Dead-letter routing: clean + quarantined = input; re-validating the
    clean side yields zero row-level violations."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations
    from jsonschema_ray.pipelines.validate_pipeline import quarantine_split
    from jsonschema_ray.sources.transcripts import transcripts_path

    ds = rd.read_parquet(transcripts_path(SF001))
    total = ds.count()
    clean, bad = quarantine_split(rd.read_parquet(transcripts_path(SF001)))
    n_clean, n_bad = clean.count(), bad.count()
    assert n_clean + n_bad == total
    assert n_bad > 0
    reval = transcript_violations(clean, checks=("rows",)).count()
    assert reval == 0


def test_bloom_semi_join_matches_plain_semi():
    """The Bloom prefilter may only drop rows the exact semi-join would
    drop anyway (no false negatives); results must be identical."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from jsonschema_ray.stages.joins import bloom_semi_join, hash_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50_000, 40_000), "v": np.arange(40_000, dtype=np.int64)}
    )
    right = pd.DataFrame({"k": rng.choice(50_000, 500, replace=False).astype(np.int64)})
    got = (
        bloom_semi_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", left_cols=["v"]
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        hash_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            left_cols=["v"],
            right_cols=[],
            how="semi",
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got) > 0


def test_grouped_head_giant_group():
    """The local-first-k combiner must keep a degenerate group (99% of all
    rows) correct — and the final answer identical to a pandas oracle."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from jsonschema_ray.stages.sampling import grouped_head

    rng = np.random.default_rng(9)
    n = 60_000
    key = np.where(rng.random(n) < 0.99, "hot", "cold")
    df = pd.DataFrame(
        {
            "k": key,
            "o": rng.integers(0, 1_000_000, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    got = (
        grouped_head(rd.from_pandas(df), ["k"], ["o", "id"], k=5)
        .to_pandas()
        .sort_values(["k", "o", "id"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "o", "id"], kind="stable")
        .groupby("k", sort=False)
        .head(5)
        .sort_values(["k", "o", "id"])
        .reset_index(drop=True)
    )
    assert got[["k", "o", "id"]].equals(want[["k", "o", "id"]])


def test_salted_hash_join_matches_plain_join_on_hot_key():
    """A degenerate hot key (80% of both sides) must produce the identical
    inner-join multiset under salting as under the plain bucketed join."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.joins import detect_hot_keys, hash_join, salted_hash_join

    n = 2000
    lkeys = [7] * (n * 4 // 5) + list(range(100, 100 + n // 5))
    rkeys = [7] * 50 + list(range(100, 140))
    left = rd.from_arrow(
        pa.table({"k": pa.array(lkeys, pa.int64()), "lv": pa.array(range(len(lkeys)), pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(rkeys, pa.int64()), "rv": pa.array(range(len(rkeys)), pa.int64())})
    )
    hot = detect_hot_keys(left, "k", threshold=500)
    assert hot == {7}
    plain = hash_join(left, right, on="k", left_cols=["lv"], right_cols=["rv"]).to_pandas()
    salted = salted_hash_join(
        left, right, on="k", left_cols=["lv"], right_cols=["rv"], hot_keys=hot, n_salts=8
    ).to_pandas()
    cols = ["k", "lv", "rv"]
    a = plain.sort_values(cols).reset_index(drop=True)
    b = salted.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == (n * 4 // 5) * 50 + 40  # hot cross product + 40 exact matches


def test_auto_hash_join_routes_by_skew():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.joins import auto_hash_join, hash_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1] * 900 + [2, 3], pa.int64()),
                  "lv": pa.array(range(902), pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "rv": pa.array([10, 20], pa.int64())})
    )
    plain = hash_join(left, right, on="k", left_cols=["lv"], right_cols=["rv"]).to_pandas()
    auto = auto_hash_join(
        left, right, on="k", left_cols=["lv"], right_cols=["rv"], hot_threshold=500
    ).to_pandas()
    cols = ["k", "lv", "rv"]
    assert plain.sort_values(cols).reset_index(drop=True).equals(
        auto.sort_values(cols).reset_index(drop=True)
    )


def test_conv_checks_auto_picks_strategy():
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.stages.checks import (
        conv_checks_auto,
        conv_checks_violations,
        max_conversation_size,
    )

    path = transcripts_path(SF001)
    mx = max_conversation_size(rd.read_parquet(path))
    assert mx > 1
    cols = ["conv_id", "turn_idx", "keyword", "message"]
    base = conv_checks_violations(rd.read_parquet(path)).to_pandas()[cols]
    # low threshold forces the salted path; result must be identical
    forced = conv_checks_auto(rd.read_parquet(path), hot_threshold=2).to_pandas()[cols]
    a = base.sort_values(cols).reset_index(drop=True)
    b = forced.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
