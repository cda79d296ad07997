"""Ray-level pipeline tests: clean=0 violations, oracle parity with DuckDB
(the driver's gate, replicated), drift, resume, entry smoke."""

from __future__ import annotations

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
