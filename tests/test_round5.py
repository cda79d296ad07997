"""Round-5 additions: hot-conversation guard in the fused headline plan,
coalesce-read config guards, embed-dedup oracle plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _planted_table(hot_rows: int = 60_000, n_normal: int = 30) -> pa.Table:
    """Transcripts with one degenerate conversation + planted violations
    in BOTH the hot and a normal conversation (dup turn, contiguity gap,
    ts regression, row-level minLength breach)."""
    frames = []

    def conv(cid: str, n: int) -> pd.DataFrame:
        turn = np.arange(n, dtype=np.int32)
        return pd.DataFrame(
            {
                "conv_id": cid,
                "turn_idx": turn,
                "role": np.where(turn % 2 == 0, "user", "assistant"),
                "text": "hello world",
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(turn, unit="s"),
            }
        )

    hot = conv("conv-00000001", hot_rows)
    hot = pd.concat([hot, hot.iloc[[500]]])  # duplicate turn 500
    hot = hot[hot["turn_idx"] != 1000]  # contiguity gap at 1000
    hot.loc[hot["turn_idx"] == 2000, "ts"] = pd.Timestamp("2025-01-01")  # ts regression
    hot.loc[hot["turn_idx"] == 3000, "text"] = ""  # minLength row violation
    frames.append(hot.sort_values("turn_idx", kind="stable"))

    for i in range(n_normal):
        c = conv(f"conv-{10000 + i:08d}", 100)
        if i == 3:
            c = pd.concat([c, c.iloc[[7]]]).sort_values("turn_idx", kind="stable")
        if i == 5:
            c.loc[c["turn_idx"] == 50, "text"] = ""
        frames.append(c)

    df = pd.concat(frames, ignore_index=True).sort_values(
        ["conv_id", "turn_idx"], kind="stable"
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    return t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )


@pytest.fixture(scope="module")
def planted_parquet(tmp_path_factory):
    path = tmp_path_factory.mktemp("hotconv") / "transcripts.parquet"
    # small row groups so the hot conversation spans many (min==max) groups
    pq.write_table(_planted_table(), str(path), row_group_size=4096)
    return str(path)


def test_hot_conversations_footer_estimate(ray_session, planted_parquet):
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _hot_conversations

    ds = rd.read_parquet(planted_parquet)
    hot = _hot_conversations(ds, 20_000)
    assert hot == frozenset({"conv-00000001"})
    # high threshold → nothing hot; in-memory dataset → detection off (None)
    assert _hot_conversations(ds, 10_000_000) == frozenset()
    mem = rd.from_arrow(pa.table({"conv_id": ["a"]}))
    assert _hot_conversations(mem, 1) is None


def test_hot_conversation_guard_differential(ray_session, planted_parquet, monkeypatch):
    """The guarded default plan (hot conv excluded from the bucket
    exchange, checked by the salted kernel) emits exactly the same
    violation multiset as the unfused bucket plan."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    monkeypatch.setenv("GRAFT_HOT_CONV_ROWS", "20000")
    got = transcript_violations(rd.read_parquet(planted_parquet)).to_pandas()
    want = transcript_violations(
        rd.read_parquet(planted_parquet), fused=False
    ).to_pandas()
    key = ["conv_id", "turn_idx", "keyword", "message"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s)
    # the planted defects are all present
    kw = set(zip(got["conv_id"], got["keyword"]))
    assert ("conv-00000001", "uniqueItems") in kw
    assert ("conv-00000001", "contiguity") in kw
    assert ("conv-00000001", "order") in kw
    assert ("conv-00000001", "minLength") in kw
    assert ("conv-00010003", "uniqueItems") in kw
    assert ("conv-00010005", "minLength") in kw
    # and the default plan output arrives globally sorted
    assert got[key[:3]].equals(got.sort_values(key[:3], kind="stable")[key[:3]].reset_index(drop=True))


def test_hot_guard_differential_vs_salted_kernel(ray_session, planted_parquet, monkeypatch):
    """Direct differential of the VERDICT criterion: guarded fused plan
    vs the skew-proof salted strategy on the same planted input."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    monkeypatch.setenv("GRAFT_HOT_CONV_ROWS", "20000")
    got = transcript_violations(rd.read_parquet(planted_parquet)).to_pandas()
    want = transcript_violations(
        rd.read_parquet(planted_parquet),
        fused=False,
        conv_strategy="salted",
    ).to_pandas()
    key = ["conv_id", "turn_idx", "keyword", "message"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_guard_inactive_below_threshold(ray_session, planted_parquet, monkeypatch):
    """With the default (2M-row) threshold nothing is hot, the plain
    fused plan runs, and output is unchanged — the guard costs nothing
    on healthy inputs."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations
    from jsonschema_ray.pipelines.validate_pipeline import _hot_conversations

    monkeypatch.delenv("GRAFT_HOT_CONV_ROWS", raising=False)
    ds = rd.read_parquet(planted_parquet)
    assert _hot_conversations(ds, 2_000_000) == frozenset()
    got = transcript_violations(ds).to_pandas()
    assert ("conv-00000001" == got["conv_id"]).sum() >= 4


def test_coalesce_read_leaves_configured_reads_alone(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _maybe_coalesce_read

    plain = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    assert _maybe_coalesce_read(plain) is not plain  # re-planned
    withpaths = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", include_paths=True
    )
    assert _maybe_coalesce_read(withpaths) is withpaths  # left alone
    # filesystem is carried through on the re-issued read
    import pyarrow.fs as pafs

    fs = pafs.LocalFileSystem()
    withfs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", filesystem=fs)
    out = _maybe_coalesce_read(withfs)
    assert out.count() == withfs.count()


def test_embed_dedup_projection_export_roundtrip():
    import pyarrow.parquet as pq2

    from jsonschema_ray.stages.model import _projection, projection_table_path

    path = projection_table_path()
    t = pq2.read_table(path)
    assert t.num_rows == 256 * 64
    w = t["w"].to_numpy().reshape(256, 64)
    np.testing.assert_array_equal(w, _projection())  # bit-exact round-trip
