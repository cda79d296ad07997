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


def test_bloom_tree_reduce_bounds_driver_rows(ray_session):
    """Many partial blocks OR-merge in distributed rounds: the driver
    takes at most one fan-in of bitmap rows, and the merged filter is
    bit-identical to the naive OR of every partial."""
    import ray.data as rd

    from jsonschema_ray.stages.joins import _tree_reduce_or

    n_words = 64
    rng = np.random.default_rng(7)
    rows = [rng.integers(0, 2**63, n_words, dtype=np.uint64) for _ in range(200)]
    naive = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        naive |= r
    partials = rd.from_arrow(
        pa.table({"bits": pa.array([r.tobytes() for r in rows], pa.binary())})
    ).repartition(200)  # force one row per block — the 10⁵-block shape
    merged, driver_rows = _tree_reduce_or(partials, n_words, fanin=8)
    assert driver_rows <= 8
    np.testing.assert_array_equal(merged, naive)


def test_bloom_semi_join_still_correct(ray_session):
    import ray.data as rd

    from jsonschema_ray.stages.joins import bloom_semi_join

    left = rd.from_arrow(
        pa.table({"k": list(range(1000)), "v": [f"x{i}" for i in range(1000)]})
    ).repartition(17)
    right = rd.from_arrow(pa.table({"k": [3, 500, 999, 12345]})).repartition(9)
    out = bloom_semi_join(left, right, on="k", left_cols=["v"]).to_pandas()
    assert sorted(out["k"]) == [3, 500, 999]


def test_shard_state_runs_match_set_reference(monkeypatch):
    """Run-list pending (no per-batch O(P) union) gives the same verdicts
    as a Python-set reference across many batches with cross-batch dups,
    exercising both consolidation thresholds."""
    from jsonschema_ray.stages import streaming as st

    monkeypatch.setattr(st, "_MERGE_THRESHOLD", 257)
    monkeypatch.setattr(st, "_MAX_RUNS", 3)
    state = st._ShardState()
    seen: set[int] = set()
    rng = np.random.default_rng(11)
    for _ in range(40):
        keys = np.unique(rng.integers(0, 500, rng.integers(1, 60), dtype=np.uint64))
        got = state.check_and_add(keys)
        want = np.array([int(k) not in seen for k in keys])
        np.testing.assert_array_equal(got, want)
        seen.update(int(k) for k in keys)
    assert state.size() == len(seen)
    np.testing.assert_array_equal(state.snapshot(), np.sort(np.fromiter(seen, np.uint64)))


def test_shard_state_spill_is_disk_backed(tmp_path, monkeypatch):
    """With spill_dir the base is a memmap: merges stream to .npy files,
    superseded generations are reclaimed, and save() round-trips."""
    from jsonschema_ray.stages import streaming as st

    monkeypatch.setattr(st, "_MERGE_THRESHOLD", 1000)
    spill = str(tmp_path / "spill")
    state = st._ShardState(spill_dir=spill)
    rng = np.random.default_rng(3)
    seen: set[int] = set()
    for _ in range(12):
        keys = np.unique(rng.integers(0, 10_000, 400, dtype=np.uint64))
        got = state.check_and_add(keys)
        want = np.array([int(k) not in seen for k in keys])
        np.testing.assert_array_equal(got, want)
        seen.update(int(k) for k in keys)
    assert isinstance(state.base, np.memmap)  # merged to disk at least once
    import os

    gens = [f for f in os.listdir(spill) if f.startswith("base-")]
    assert len(gens) == 1  # old generations reclaimed
    out = str(tmp_path / "snap.npy")
    n = state.save(out)
    assert n == len(seen)
    np.testing.assert_array_equal(np.load(out), np.sort(np.fromiter(seen, np.uint64)))
    # restore from the saved file via memmap, keep inserting
    state2 = st._ShardState(np.load(out, mmap_mode="r"), spill_dir=spill)
    fresh = state2.check_and_add(np.array([10_001, 10_002], dtype=np.uint64))
    assert fresh.all()
    dup = state2.check_and_add(np.array([10_001], dtype=np.uint64))
    assert not dup.any()


def test_shard_state_spill_bounded_heap():
    """20M keys (160 MB of index) through a spill-backed shard in a fresh
    subprocess: the ANONYMOUS heap (VmData — what an actor can actually
    exhaust; resident file-backed pages are OS-reclaimable) stays far
    below the index size, because the base lives in .npy files and heap
    holds only the pending runs."""
    import subprocess
    import sys

    script = r"""
import numpy as np, sys
sys.path.insert(0, "/root/repo")
from jsonschema_ray.stages.streaming import _ShardState

def vmdata_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmData:"):
                return int(line.split()[1])

state = _ShardState(spill_dir=sys.argv[1])
rng = np.random.default_rng(5)
base_kb = vmdata_kb()
total = 0
for i in range(40):
    keys = rng.integers(0, 1 << 62, 500_000, dtype=np.uint64)
    total += int(state.check_and_add(np.unique(keys)).sum())
after_kb = vmdata_kb()
print(state.size(), total, (after_kb - base_kb) // 1024, "MB heap growth")
assert state.size() == total
assert isinstance(state.base, np.memmap)
# index holds ~160 MB of keys; anonymous heap growth must stay well under
assert (after_kb - base_kb) < 100 * 1024, (after_kb - base_kb)
"""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        res = subprocess.run(
            [sys.executable, "-c", script, d], capture_output=True, text=True
        )
    assert res.returncode == 0, res.stderr + res.stdout


def test_direct_fallback_warns_once(ray_session, monkeypatch):
    """When the Ray-private direct-exchange surface disappears (as a Ray
    upgrade could make it), the engine emits ONE RuntimeWarning and every
    bucketed exchange still returns correct output via the AllToAll plan."""
    import warnings

    import ray.data as rd

    from jsonschema_ray.stages import bucketing as bk
    from jsonschema_ray.stages.dedup import exact_dedup

    def boom(self):
        raise AttributeError("iter_internal_ref_bundles removed")

    monkeypatch.setattr(rd.Dataset, "iter_internal_ref_bundles", boom)
    monkeypatch.setattr(bk, "_DIRECT_FALLBACK_WARNED", False)
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4], "text": ["a", "b", "a", "c"]})
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = exact_dedup(ds, key="text").to_pandas()
        # second exchange in the same process: no second warning
        out2 = exact_dedup(ds, key="text").to_pandas()
    hits = [w for w in caught if "direct bucket exchange unavailable" in str(w.message)]
    assert len(hits) == 1 and issubclass(hits[0].category, RuntimeWarning)
    assert sorted(out["doc_id_kept"]) == [1, 2, 4]
    assert sorted(out2["doc_id_kept"]) == [1, 2, 4]


def test_real_codec_path_decodes_bmp(ray_session):
    """The REAL-codec branch of DecodeStage/ResizeStage runs in CI via the
    vendored pure-Python BMP codec: real header parse, real pixel
    decode, real re-encode — no Pillow required."""
    import ray.data as rd

    from jsonschema_ray.stages.multimodal import (
        _MiniBMP,
        decode_features,
        resize,
    )

    rng = np.random.default_rng(9)
    imgs = {1: rng.integers(0, 256, (5, 7, 3), np.uint8),
            2: rng.integers(0, 256, (16, 3, 3), np.uint8)}
    # encode → open round-trip is pixel-exact
    for px in imgs.values():
        import io

        back = _MiniBMP.open(io.BytesIO(_MiniBMP.encode(px)))
        np.testing.assert_array_equal(back.px, px)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(imgs),
                "payload": pa.array([_MiniBMP.encode(px) for px in imgs.values()], pa.binary()),
            }
        )
    )
    feats = decode_features(ds, mode="bmp").to_pandas().set_index("doc_id")
    assert (feats.loc[1, "width"], feats.loc[1, "height"]) == (7, 5)
    assert (feats.loc[2, "width"], feats.loc[2, "height"]) == (3, 16)
    out = resize(ds, width=4, height=6, mode="bmp").to_pandas().set_index("doc_id")
    import io

    for i in imgs:
        im = _MiniBMP.open(io.BytesIO(out.loc[i, "payload"]))
        assert im.size == (4, 6)


def test_embed_dedup_projection_export_roundtrip():
    import pyarrow.parquet as pq2

    from jsonschema_ray.stages.model import _projection, projection_table_path

    path = projection_table_path()
    t = pq2.read_table(path)
    assert t.num_rows == 256 * 64
    w = t["w"].to_numpy().reshape(256, 64)
    np.testing.assert_array_equal(w, _projection())  # bit-exact round-trip


CONV_ONLY = ("referential", "unique", "contiguity", "order")


@pytest.mark.parametrize("route", ["direct", "ray"])
def test_conv_only_fused_route_matches_parts_plan(
    ray_session, planted_parquet, monkeypatch, route
):
    """The checks-only configuration auto-routes onto the single-exchange
    fused1 plan (keywords=False): same violation multiset as the two-scan
    parts plan on both exchange routes, and the projection applied after
    the range bucketer (select_columns hides input_files) keeps the route
    live rather than silently falling back."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations
    from jsonschema_ray.pipelines.validate_pipeline import (
        transcript_violations_fused1,
    )

    monkeypatch.setenv("GRAFT_FUSED1_EXCHANGE", route)
    key = ["conv_id", "turn_idx", "keyword", "message"]
    got = (
        transcript_violations(rd.read_parquet(planted_parquet), checks=CONV_ONLY)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = (
        transcript_violations(
            rd.read_parquet(planted_parquet), checks=CONV_ONLY, fused=False
        )
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and got.equals(want)
    assert set(got["keyword"]) >= {"uniqueItems", "contiguity", "order"}
    # the fused1 keywords=False plan is reachable (bucketer found footer
    # stats) — i.e. the equality above really exercised the fused route
    assert (
        transcript_violations_fused1(
            rd.read_parquet(planted_parquet), keywords=False
        )
        is not None
    )


def test_conv_only_fused_skips_on_hot_conversation(
    ray_session, planted_parquet, monkeypatch
):
    """A degenerate conversation (footer-estimated) routes the checks-only
    configuration through the salted hot-split — same rows either way."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    monkeypatch.setenv("GRAFT_HOT_CONV_ROWS", "20000")
    key = ["conv_id", "turn_idx", "keyword", "message"]
    got = (
        transcript_violations(rd.read_parquet(planted_parquet), checks=CONV_ONLY)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    monkeypatch.delenv("GRAFT_HOT_CONV_ROWS")
    want = (
        transcript_violations(
            rd.read_parquet(planted_parquet), checks=CONV_ONLY, fused=False
        )
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and got.equals(want)


def test_salted_distributed_stitch_matches_driver_stitch(
    ray_session, planted_parquet, monkeypatch
):
    """The >DRIVER_STITCH_MAX_PARTIALS branch (conv-keyed distributed
    stitch, the 100 TB path) must produce the identical violation multiset
    as the driver-side stitch — forced by patching the threshold to 0."""
    import ray.data as rd

    from jsonschema_ray.stages import checks

    want = checks.conv_checks_salted(
        rd.read_parquet(planted_parquet), range_size=512
    ).to_pandas()
    monkeypatch.setattr(checks, "DRIVER_STITCH_MAX_PARTIALS", 0)
    got = checks.conv_checks_salted(
        rd.read_parquet(planted_parquet), range_size=512
    ).to_pandas()
    key = ["conv_id", "turn_idx", "keyword", "message"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_detect_hot_keys_typed_schema(ray_session):
    """detect_hot_keys rides the typed direct exchange and still finds
    exactly the keys above threshold."""
    import ray.data as rd

    from jsonschema_ray.stages.joins import detect_hot_keys

    df = pd.DataFrame({"k": ["hot"] * 5000 + [f"k{i}" for i in range(200)]})
    ds = rd.from_pandas(df).repartition(8)
    assert detect_hot_keys(ds, "k", threshold=1000) == {"hot"}
    assert detect_hot_keys(ds, "k", threshold=10_000) == set()


def test_hot_conversations_distributed_many_files(ray_session, tmp_path):
    """Above 512 input files the detector scans EVERY footer via Ray
    tasks — a hot conversation spanning a contiguous run of files is
    found exactly (the old evenly-spaced 512-file sample undercounted
    any conversation it barely intersected)."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _hot_conversations

    d = tmp_path / "many"
    d.mkdir()
    ts = pa.array([0] * 200, pa.timestamp("us"))

    def one_file(i: int, cid: str):
        t = pa.table(
            {
                "conv_id": pa.array([cid] * 200),
                "turn_idx": pa.array(np.arange(200, dtype=np.int32)),
                "ts": ts,
            }
        )
        pq.write_table(t, str(d / f"part-{i:05d}.parquet"))

    for i in range(600):
        # files 100..160 all belong to ONE conversation (61 × 200 = 12,200
        # rows); every other file is its own small conversation
        one_file(i, "conv-hot" if 100 <= i <= 160 else f"conv-{i:05d}")
    ds = rd.read_parquet(str(d))
    assert len(ds.input_files()) == 600
    hot = _hot_conversations(ds, 10_000)
    assert hot == frozenset({"conv-hot"})
    # nothing else comes close to threshold/2
    assert _hot_conversations(ds, 30_000) == frozenset()


def test_direct_fallback_transient_error_not_latched(ray_session, monkeypatch):
    """A non-API-shaped failure in the direct-exchange attempt must not
    claim a Ray version problem, and must not latch the one-shot version
    warning away from a later genuine API removal."""
    import warnings

    import ray.data as rd

    from jsonschema_ray.stages import bucketing as bk
    from jsonschema_ray.stages.dedup import exact_dedup

    def transient(self):
        raise RuntimeError("object store pressure")

    monkeypatch.setattr(rd.Dataset, "iter_internal_ref_bundles", transient)
    monkeypatch.setattr(bk, "_DIRECT_FALLBACK_WARNED", False)
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "text": ["a", "b", "a"]}))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = exact_dedup(ds, key="text").to_pandas()
    assert sorted(out["doc_id_kept"]) == [1, 2]
    assert not any(
        "unavailable on this Ray version" in str(w.message) for w in caught
    )
    assert any(
        "direct bucket exchange attempt failed" in str(w.message) for w in caught
    )
    assert bk._DIRECT_FALLBACK_WARNED is False  # version latch untouched

    def gone(self):
        raise AttributeError("iter_internal_ref_bundles removed")

    monkeypatch.setattr(rd.Dataset, "iter_internal_ref_bundles", gone)
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        exact_dedup(ds, key="text").to_pandas()
    assert any(
        "unavailable on this Ray version" in str(w.message) for w in caught2
    )


def test_streaming_checkpoint_via_driver_and_stale_restore_raises(
    ray_session, tmp_path
):
    """shared_fs=False checkpoints route shard snapshots through the
    driver (placement-independent); restore cross-checks per-shard key
    counts against the manifest, so a stale/foreign shard file fails loud
    instead of silently readmitting duplicates."""
    import ray.data as rd

    from jsonschema_ray.stages.streaming import StreamingDeduper

    ck = str(tmp_path / "ck")
    dd = StreamingDeduper(n_shards=4)
    df = pd.DataFrame({"doc_id": np.arange(40), "text": [f"t{i % 25}" for i in range(40)]})
    kept = dd.dedup(rd.from_pandas(df)).to_pandas()
    assert len(kept) == 25
    man = dd.checkpoint(ck, shared_fs=False)
    assert man["n_keys"] == 25 and len(man["per_shard"]) == 4

    # clean restore: all 25 contents are already seen
    dd2 = StreamingDeduper(n_shards=4, checkpoint_dir=ck)
    again = dd2.dedup(rd.from_pandas(df)).to_pandas()
    assert len(again) == 0

    # corrupt one shard file (wrong key count) → restore raises
    victim = next(s for s in range(4) if man["per_shard"][s] > 0)
    np.save(f"{ck}/shard-{victim:04d}.npy", np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(RuntimeError, match="restore mismatch"):
        StreamingDeduper(n_shards=4, checkpoint_dir=ck)


def test_wraparound_hashing_restores_numpy_error_state():
    """hash_strings/token hashing wrap overflow suppression in a SCOPED
    np.errstate — the process-global numpy error config must be exactly
    what it was before the call (ADVICE r5: a bare np.seterr leaked
    over='ignore' into unrelated code in the same worker)."""
    import pyarrow as pa

    from jsonschema_ray.stages.tokhash import hash_strings

    before = np.geterr()
    hash_strings(pa.array(["alpha", "beta", None, "x" * 300]))
    assert np.geterr() == before


def test_embed_dedup_sql_is_lazy():
    """Building EMBED_DEDUP_SQL writes a projection parquet under /tmp —
    that must happen on first ATTRIBUTE access, not at import."""
    from jsonschema_ray.pipelines import queries as q

    assert "EMBED_DEDUP_SQL" not in vars(q)  # no module-scope binding
    s = q.EMBED_DEDUP_SQL  # __getattr__ builds it on demand
    assert "list_cosine_similarity" in s


def test_footer_stats_use_leaf_index_on_nested_schema(ray_session, tmp_path):
    """Row-group statistics are addressed by parquet LEAF (depth-first)
    index; a struct column ahead of conv_id shifts every later leaf, so
    an Arrow top-level field-index lookup reads an unrelated leaf's
    min/max — missing a degenerate conversation entirely or flagging
    phantom ones.  The guard must key off the leaf path."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import (
        _file_conv_counts,
        _hot_conversations,
        _parquet_leaf_index,
    )

    n = 12_000
    t = pa.table(
        {
            "meta": pa.array([{"a": 1, "b": 2}] * n),
            "conv_id": pa.array(
                ["conv-hot"] * (n - 100) + [f"conv-{i:04d}" for i in range(100)]
            ),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
        }
    )
    f = str(tmp_path / "nested.parquet")
    pq.write_table(t, f, row_group_size=1024)
    md = pq.read_metadata(f)
    # the divergence this test guards: 2 struct leaves precede conv_id
    assert _parquet_leaf_index(md, "conv_id") == 2
    assert md.schema.to_arrow_schema().get_field_index("conv_id") == 1
    per = _file_conv_counts(f)
    assert per is not None
    counts: dict[str, int] = {}
    for c, k in per:
        counts[c] = counts.get(c, 0) + k
    # full (min==max) row groups cover the hot conv minus ≤2 edge groups
    assert counts.get("conv-hot", 0) >= n - 100 - 2 * 1024
    assert _hot_conversations(rd.read_parquet(f), 5_000) == frozenset({"conv-hot"})


def test_hot_conv_cache_invalidates_on_in_place_rewrite(ray_session, tmp_path):
    """The footer-stat caches key on a (path, mtime, size) fingerprint —
    regenerating a dataset at the same path (exactly what bench reps and
    retried pipelines do) must not serve the previous contents' hot set."""
    import os

    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _hot_conversations

    f = str(tmp_path / "t.parquet")

    def write(hot_id: str) -> None:
        t = pa.table(
            {
                "conv_id": pa.array([hot_id] * 20_000),
                "turn_idx": pa.array(np.arange(20_000, dtype=np.int32)),
            }
        )
        pq.write_table(t, f, row_group_size=2048)

    write("conv-A")
    assert _hot_conversations(rd.read_parquet(f), 10_000) == frozenset({"conv-A"})
    write("conv-B")  # same path, same byte size — only contents changed
    st = os.stat(f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1))  # deterministic mtime bump
    assert _hot_conversations(rd.read_parquet(f), 10_000) == frozenset({"conv-B"})


def test_hot_conv_no_stats_verdict_is_cached(ray_session, tmp_path, monkeypatch):
    """A dataset written without row-group statistics yields the None
    (detection off) verdict — which must be CACHED like any other, or
    every bench rep / repeated query repeats the full footer sweep."""
    import ray.data as rd

    from jsonschema_ray.pipelines import validate_pipeline as vp

    f = str(tmp_path / "nostats.parquet")
    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 100),
            "turn_idx": pa.array(np.arange(100, dtype=np.int32)),
        }
    )
    pq.write_table(t, f, write_statistics=False)
    calls: list[str] = []
    orig = vp._file_conv_counts
    monkeypatch.setattr(
        vp, "_file_conv_counts", lambda p: (calls.append(p), orig(p))[1]
    )
    assert vp._hot_conversations(rd.read_parquet(f), 10) is None
    n1 = len(calls)
    assert n1 >= 1
    assert vp._hot_conversations(rd.read_parquet(f), 10) is None
    assert len(calls) == n1  # no second footer sweep


def test_bmp_codec_lazy_open_and_format_guard():
    """open() is header-only (no pixel decode until .px is touched), and
    save() refuses formats the vendored codec cannot produce instead of
    silently emitting mislabeled BMP bytes."""
    import io

    from jsonschema_ray.stages.multimodal import _MiniBMP

    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    data = _MiniBMP.encode(px)
    im = _MiniBMP.open(io.BytesIO(data))
    assert im._px is None  # header-only open
    assert im.size == (4, 5)
    assert im._px is None  # .size alone must not trigger a full decode
    np.testing.assert_array_equal(im.px, px)
    buf = io.BytesIO()
    with pytest.raises(ValueError, match="cannot encode"):
        im.save(buf, format="PNG")
    im.save(buf, format="BMP")
    np.testing.assert_array_equal(
        _MiniBMP.open(io.BytesIO(buf.getvalue())).px, px
    )
    with pytest.raises(ValueError, match="truncated"):
        _MiniBMP.open(io.BytesIO(data[:-8]))  # extent checked at open


def test_resize_bmp_mode_emits_bmp_container(ray_session):
    """ResizeStage's output container follows the codec (OUT_FORMAT):
    mode='bmp' payloads are valid BMP bytes, not PNG-labeled BMP."""
    import io

    import ray.data as rd

    from jsonschema_ray.stages.multimodal import _MiniBMP, resize

    px = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1],
                "payload": pa.array([_MiniBMP.encode(px)], pa.binary()),
            }
        )
    )
    out = resize(ds, width=3, height=2, mode="bmp").to_pandas()
    payload = out.loc[0, "payload"]
    assert payload[:2] == b"BM"
    assert _MiniBMP.open(io.BytesIO(payload)).size == (3, 2)


# --- round-5 second review pass: cross-path parity fixes ---------------------


def test_salted_checks_exclude_null_keyed_rows(ray_session):
    """conv_checks_salted must apply the same null-key contract as the
    bucketed kernels: rows with null conv_id/turn_idx are 'required' row
    violations upstream, not conversation-check input (a null turn_idx
    would otherwise astype to int64 garbage and emit bogus violations)."""
    import ray.data as rd

    from jsonschema_ray.stages.checks import (
        conv_checks_salted,
        conv_checks_violations,
    )

    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", None, "a", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, None, 0, 2], pa.int32()),
            "ts": pa.array([1, 2, 3, 4, 5, 6], pa.timestamp("us")),
        }
    )
    cols = ["conv_id", "turn_idx", "keyword", "message"]
    got = (
        conv_checks_salted(rd.from_arrow(t), range_size=2)
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want = (
        conv_checks_violations(rd.from_arrow(t))
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # exactly one violation: conv b's gap at turn 2; no 'None' conv rows
    assert list(want["conv_id"]) == ["b"]
    assert list(want["keyword"]) == ["contiguity"]


def test_duplicate_key_violations_exclude_null_keys(ray_session):
    """The standalone uniqueness path agrees with the combined
    conv-check path on null-keyed rows: both exclude them."""
    import ray.data as rd

    from jsonschema_ray.stages.checks import duplicate_key_violations

    t = pa.table(
        {
            "conv_id": pa.array([None, None, "a", "a"], pa.string()),
            "turn_idx": pa.array([0, 0, 1, 1], pa.int32()),
        }
    )
    out = duplicate_key_violations(rd.from_arrow(t)).to_pandas()
    assert list(out["conv_id"]) == ["a"]  # the null-key pair is NOT a dup


def test_ts_order_after_all_nat_group_matches_sql(ray_session):
    """A turn group that is entirely NaT must not exempt the NEXT group
    from the running-max check — SQL's MAX(ts) OVER skips NULLs, and all
    four engine paths (pandas bucket, Arrow bucket, salted, oracle) must
    agree on that."""
    import duckdb
    import ray.data as rd

    from jsonschema_ray.stages.checks import (
        _run_bucket,
        _run_bucket_table,
        conv_checks_salted,
    )

    t = pa.table(
        {
            "conv_id": pa.array(["c", "c", "c"], pa.string()),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            # turn1 all-NaT; turn2 regresses below turn0's ts
            "ts": pa.array([5_000_000, None, 3_000_000], pa.timestamp("us")),
        }
    )
    want = duckdb.connect().execute(
        """
        WITH s AS (
          SELECT conv_id, turn_idx, ts,
                 MAX(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx
                               RANGE BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max
          FROM t)
        SELECT conv_id, turn_idx FROM s WHERE ts < prev_max
        """
    ).df()
    assert list(want["turn_idx"]) == [2]  # SQL flags the regression
    arrow = _run_bucket_table(t, ("order",)).to_pandas()
    pandas_ = _run_bucket(t.to_pandas(), ("order",)).to_pandas()
    salted = conv_checks_salted(rd.from_arrow(t), range_size=2).to_pandas()
    for got in (arrow, pandas_, salted):
        assert list(got["turn_idx"]) == [2], got


def test_violation_turn_idx_overflow_fails_loud():
    """turn_idx past 2^31-1 cannot be represented in the int32 violation
    schema — the Arrow kernel must raise (as the pandas kernel's pa.array
    cast does), never silently wrap to a corrupted index."""
    from jsonschema_ray.stages.checks import _run_bucket_table

    t = pa.table(
        {
            "conv_id": pa.array(["c", "c"], pa.string()),
            "turn_idx": pa.array([0, 2**31 + 5], pa.int64()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
        }
    )
    with pytest.raises(OverflowError, match="int32"):
        _run_bucket_table(t, ("contiguity",))


def test_running_sum_widens_int32(ray_session):
    """Integer running sums accumulate in int64 (pandas cumsum preserves
    narrow widths — an int32 prefix sum past 2^31 would silently wrap)."""
    import ray.data as rd

    from jsonschema_ray.stages.window import grouped_running_sum

    big = 2_000_000_000  # 2e9: two rows overflow int32
    t = pa.table(
        {
            "k": pa.array(["g"] * 3, pa.string()),
            "o": pa.array([1, 2, 3], pa.int32()),
            "v": pa.array([big, big, big], pa.int32()),
        }
    )
    out = (
        grouped_running_sum(rd.from_arrow(t), ["k"], ["o"], "v")
        .to_pandas()
        .sort_values("o")
    )
    assert list(out["running_sum"]) == [big, 2 * big, 3 * big]


def test_topk_block_cut_respects_rounded_ties(ray_session):
    """Per-block candidate selection uses the same (rounded sim desc,
    vec_id asc) order as the global merge, so results do not depend on
    which block rounded-tied vectors land in."""
    import ray.data as rd

    from jsonschema_ray.stages.ann import cosine_topk

    # query q=0; vectors 1..4 all exactly tied; 5 clearly worse.  With
    # k=2 the winner set must be the two smallest ids among the tie.
    base = np.array([1.0, 0.0, 0.0])
    tied = [base] * 4
    rows = {
        "vec_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "embedding": pa.array(
            [base.tolist()] + [v.tolist() for v in tied] + [[0.0, 1.0, 0.0]],
            pa.list_(pa.float64()),
        ),
    }
    for nblocks in (1, 3, 6):
        ds = rd.from_arrow(pa.table(rows)).repartition(nblocks)
        out = (
            cosine_topk(ds, [0], k=2)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert list(out["vec_id"]) == [1, 2], f"nblocks={nblocks}: {out}"


def test_fingerprints_batch_kernel_matches_per_doc_reference(ray_session):
    """The whole-batch fingerprint kernel (global power tables, per-doc
    factors cancelled algebraically) is value-identical to the per-doc
    rolling-hash formulation on adversarial inputs: empty docs, nulls,
    below/at/above window length, astral-plane unicode."""
    import ray.data as rd

    from jsonschema_ray.stages.text import _RK_BASE, fingerprints

    def reference(s: str, window: int = 16):
        binv = np.uint64(pow(int(_RK_BASE), -1, 1 << 64))
        with np.errstate(over="ignore"):
            cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            n = len(cps)
            if n == 0:
                return 0, 0
            pow_b = np.ones(n, dtype=np.uint64)
            pow_inv = np.ones(n, dtype=np.uint64)
            if n > 1:
                np.multiply.accumulate(
                    np.full(n - 1, _RK_BASE, dtype=np.uint64), out=pow_b[1:]
                )
                np.multiply.accumulate(
                    np.full(n - 1, binv, dtype=np.uint64), out=pow_inv[1:]
                )
            pref = np.empty(n + 1, dtype=np.uint64)
            pref[0] = 0
            np.cumsum(cps * pow_inv, out=pref[1:])
            full = pref[n] * pow_b[n - 1]
            if n >= window:
                wins = (pref[window:] - pref[: n - window + 1]) * pow_b[window - 1 :]
                mw = wins.min()
            else:
                mw = full
            return int(full.astype(np.int64)), int(np.uint64(mw).astype(np.int64))

    rng = np.random.default_rng(77)
    docs = ["", None, "a", "ab" * 7, "x" * 16, "y" * 17, "日本語テスト" * 5, "𝔘𝔫𝔦" * 8]
    def rand_cp(c: int) -> str:  # skip the unencodable surrogate block
        return chr(c + 0x800 if 0xD800 <= c <= 0xDFFF else c)

    docs += [
        "".join(rand_cp(int(c)) for c in rng.integers(32, 0x2FFFF, size=int(m)))
        for m in rng.integers(1, 80, size=20)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, pa.string()),
        }
    )
    got = (
        fingerprints(rd.from_arrow(t)).to_pandas().set_index("doc_id").sort_index()
    )
    for i, s in enumerate(docs):
        f, mw = reference(s or "")
        assert got.loc[i, "fp_full"] == f, (i, repr(s))
        assert got.loc[i, "fp_min_window"] == mw, (i, repr(s))


def test_minhash_lsh_pairs_custom_columns(ray_session):
    """text_col/id_col thread through to the signature stage (they were
    silently ignored there — KeyError or wrong-column signatures on any
    table not named (text, doc_id))."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import minhash_lsh_pairs

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "body": pa.array(
                ["the quick brown fox jumps over the lazy dog today",
                 "the quick brown fox jumps over the lazy dog today",
                 "completely different content with no overlap at all here"],
                pa.string(),
            ),
        }
    )
    out = minhash_lsh_pairs(
        rd.from_arrow(t), threshold=0.5, text_col="body", id_col="id"
    ).to_pandas()
    assert [(a, b) for a, b in zip(out["a"], out["b"])] == [(1, 2)]
    assert float(out["jaccard"].iloc[0]) == 1.0


def test_exact_dedup_keeps_null_text_group(ray_session):
    """key='text' grouping must keep null-text docs as ONE group (SQL
    GROUP BY keeps NULL) — the default pandas groupby dropped them."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([None, None, "x", "x"], pa.string()),
        }
    )
    out = (
        exact_dedup(rd.from_arrow(t), key="text")
        .to_pandas()
        .sort_values("doc_id_kept")
        .reset_index(drop=True)
    )
    assert list(out["doc_id_kept"]) == [1, 3]
    assert list(out["n_copies"]) == [2, 2]


def test_stratified_sample_keeps_null_group(ray_session):
    """Rows with a null group value form their own sampling stratum (SQL
    PARTITION BY semantics) instead of being silently dropped."""
    import ray.data as rd

    from jsonschema_ray.stages.sampling import stratified_sample

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "grp": pa.array((["a"] * 50) + ([None] * 50), pa.string()),
        }
    )
    out = stratified_sample(
        rd.from_arrow(t), group_col="grp", frac=0.2, id_col="doc_id"
    ).to_pandas()
    by = out.groupby("grp", dropna=False).size()
    assert by.get("a", 0) == 10
    assert by[by.index.isna()].sum() == 10  # the null stratum is sampled too


def test_bm25_n_docs_override_leaves_avgdl_alone(ray_session):
    """n_docs overrides N in the idf only; avgdl must stay the scanned
    corpus mean (dividing scanned tokens by an overridden N corrupted the
    length normalization by orders of magnitude)."""
    import ray.data as rd

    from jsonschema_ray.stages.tfidf import bm25_topk

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["alpha beta gamma", "alpha alpha beta", "delta epsilon zeta"],
                pa.string(),
            ),
        }
    )
    base = bm25_topk(rd.from_arrow(t), "alpha", k=3).to_pandas()
    boosted = bm25_topk(
        rd.from_arrow(t), "alpha", k=3, n_docs=1_000_000
    ).to_pandas()
    # same ranked doc set; scores differ ONLY via the idf factor, so the
    # score RATIO between the two runs is constant across docs
    assert list(base["doc_id"]) == list(boosted["doc_id"])
    ratios = (boosted["score"] / base["score"]).round(4).unique()
    assert len(ratios) == 1


def test_salted_hash_join_cross_width_keys(ray_session):
    """salted_hash_join buckets with the width-normalized hash: an int32
    left key must meet its int64 right twin (raw pd.util.hash_array
    hashes negative ints differently per width, silently dropping
    matches)."""
    import ray.data as rd

    from jsonschema_ray.stages.joins import salted_hash_join

    left = pa.table(
        {
            "k": pa.array([-1, -1, 2], pa.int32()),
            "lv": pa.array([10, 11, 12], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([-1, 2], pa.int64()),
            "rv": pa.array([100, 200], pa.int64()),
        }
    )
    out = (
        salted_hash_join(
            rd.from_arrow(left),
            rd.from_arrow(right),
            on="k",
            left_cols=["lv"],
            right_cols=["rv"],
            hot_keys={-1},
            n_salts=4,
        )
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    assert len(out) == 3  # both -1 rows matched, plus the 2 row
    assert list(out["rv"]) == [100, 100, 200]


def test_embedding_dup_pairs_empty_input_both_methods(ray_session):
    """Both routing paths return an (empty) Dataset on empty input —
    previously exact returned a pandas DataFrame and lsh crashed on the
    dimensionality probe."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import embedding_dup_pairs

    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
    )
    for method in ("exact", "lsh"):
        out = embedding_dup_pairs(empty, threshold=0.9, method=method)
        # Dataset API (chainable), typed schema, zero rows.  (Ray's
        # to_pandas() drops columns on empty datasets, so assert on the
        # Dataset schema itself.)
        assert out.schema().names == ["a", "b", "sim"]
        assert out.count() == 0
        assert len(out.to_pandas()) == 0


def test_resume_reruns_on_config_change(ray_session, tmp_path):
    """A rerun with a different mode/schema must recompute shards — the
    manifest's skip check includes the run config, not just the input
    fingerprint (reusing stale results under a new --mode silently
    reported the OLD config's violations)."""
    from jsonschema_ray.sources.transcripts import transcripts_path
    from jsonschema_ray.state import run_resumable

    src = transcripts_path("/root/testdata/sf0.001")
    out = str(tmp_path / "resume")
    s1 = run_resumable(src, out, shard_size=1, mode="first")
    assert s1["shards_run"] > 0
    s2 = run_resumable(src, out, shard_size=1, mode="first")
    assert s2["shards_run"] == 0  # unchanged config still skips
    s3 = run_resumable(src, out, shard_size=1, mode="all")
    assert s3["shards_run"] == s1["shards_run"]  # new config recomputes


def test_stats_category_merge_respects_bail_and_cap():
    """A high-cardinality bail in ANY partial is authoritative, and two
    under-cap partials whose union exceeds the cap merge to None — the
    categorical verdict must not depend on batch partitioning."""
    from jsonschema_ray.stages.stats import _merge_col

    base = {"count": 10, "nulls": 0}
    dict_part = {**base, "categories": {"a": 5, "b": 5}, "cat_cap": 64}
    bail_part = {**base, "categories": None, "cat_cap": 64}
    assert _merge_col(dict_part, bail_part)["categories"] is None
    assert _merge_col(bail_part, dict_part)["categories"] is None
    wide_a = {**base, "categories": {f"a{i}": 1 for i in range(40)}, "cat_cap": 64}
    wide_b = {**base, "categories": {f"b{i}": 1 for i in range(40)}, "cat_cap": 64}
    assert _merge_col(wide_a, wide_b)["categories"] is None  # 80 > cap
    small = {**base, "categories": {"x": 1}, "cat_cap": 64}
    m = _merge_col(dict_part, small)["categories"]
    assert m == {"a": 5, "b": 5, "x": 1}


def test_drift_baseline_roundtrips_numeric_string_categories(tmp_path):
    """Categorical values that LOOK numeric ('200'/'404' status codes)
    survive the save/load round trip as strings — the legacy blind int()
    coercion turned them into int keys that never matched the candidate
    profile, reporting a clean table as fully drifted."""
    from jsonschema_ray.stages.drift import (
        drift_compare,
        load_baseline,
        save_baseline,
    )

    profile = {
        "status": {"200": 90, "404": 10},  # categorical, numeric-looking
        "turn_idx": {0: 50, 1: 50},  # numeric feature: int keys
    }
    p = str(tmp_path / "baseline.json")
    save_baseline(profile, p)
    back = load_baseline(p)
    assert back == profile  # exact key types both ways
    feats = {"categorical": ["status"], "numeric": ["turn_idx"]}
    stats = drift_compare(back, profile, feats)
    assert stats["status"]["chi2"] == 0.0  # identical profiles: no drift
    assert stats["turn_idx"]["ks"] == 0.0


def test_generate_transcripts_clears_stale_tmp(tmp_path, monkeypatch):
    """Part files left in the .tmp dir by a crashed previous generation
    must not be renamed into the final dataset."""
    import os

    from jsonschema_ray.sources import transcripts as tr

    out = str(tmp_path / "gen")
    os.makedirs(out + ".tmp")
    with open(out + ".tmp/part-00099.parquet", "w") as f:
        f.write("stale junk from a crashed run")
    path = tr.generate_transcripts(out, n_turns=500, seed=3)
    assert path == out
    assert not os.path.exists(out + ".tmp")
    assert "part-00099.parquet" not in os.listdir(out)


def test_cli_decontaminate_zero_flagged_reports_zero(ray_session, tmp_path, capsys):
    """A clean corpus flags zero docs; Ray then writes NO output files at
    all — the CLI must report flagged_docs=0, not crash reading a
    directory that was never created."""
    import json as _json

    import pyarrow.parquet as _pq

    from jsonschema_ray import cli

    train = str(tmp_path / "train.parquet")
    bench = str(tmp_path / "bench.parquet")
    _pq.write_table(
        pa.table({"doc_id": [1], "text": ["alpha beta gamma delta epsilon"]}),
        train,
    )
    _pq.write_table(
        pa.table({"doc_id": [1], "text": ["zeta eta theta iota kappa"]}), bench
    )
    rc = cli.main(
        [
            "decontaminate",
            "--train", train,
            "--bench", bench,
            "--out", str(tmp_path / "out"),
            "--threshold", "0.9",
        ]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["flagged_docs"] == 0


def test_spans_to_strings_small_path_unchanged():
    from jsonschema_ray.stages.tokhash import spans_to_strings

    buf = np.frombuffer(b"hello world tokens", dtype=np.uint8)
    starts = np.array([0, 6, 12], dtype=np.int64)
    lens = np.array([5, 5, 6], dtype=np.int64)
    arr = spans_to_strings(buf, starts, lens)
    assert arr.to_pylist() == ["hello", "world", "tokens"]
    assert pa.types.is_string(arr.type)  # int32 offsets under 2 GiB


def test_enum_overflow_values_drop_per_value(ray_session):
    """An enum mixing a representable value with an int past int64 (or a
    1e300 float) must keep matching the representable member — the old
    all-or-nothing fallback flagged EVERY row, and the int-overflow case
    crashed compilation with an uncaught OverflowError."""
    import json

    from jsonschema_ray.core import parse
    from jsonschema_ray.vector.plan import compile_plan

    schema = parse(
        json.dumps(
            {
                "type": "object",
                "properties": {"v": {"enum": [5, 10**19]}},
            }
        ).encode()
    )
    arrow = pa.schema([("v", pa.int64())])
    plan = compile_plan(schema, arrow)
    t = pa.table({"v": pa.array([5, 7, None], pa.int64())})
    idx, kws, _msgs = plan.evaluate(t, mode="all")
    enum_rows = [int(i) for i, k in zip(idx, kws) if k == "enum"]
    # row 0 matches enum member 5; row 1 matches nothing; null passes
    assert enum_rows == [1]


def test_min_properties_on_struct_routes_to_slow_path():
    """minProperties/maxProperties on a struct column has no fast-path
    kernel — compilation must raise UnsupportedPlanError (routing callers
    to the slow path) instead of silently dropping the check."""
    import json

    from jsonschema_ray.core import parse
    from jsonschema_ray.vector.plan import UnsupportedPlanError, compile_plan

    schema = parse(
        json.dumps(
            {
                "type": "object",
                "properties": {"meta": {"type": "object", "minProperties": 2}},
            }
        ).encode()
    )
    arrow = pa.schema(
        [("meta", pa.struct([("a", pa.int64()), ("b", pa.int64())]))]
    )
    with pytest.raises(UnsupportedPlanError, match="slow path"):
        compile_plan(schema, arrow)


def test_windowed_agg_keeps_null_key_group(ray_session):
    """Events with a NULL key still aggregate (SQL GROUP BY emits a NULL
    group; the pandas default silently dropped them)."""
    import ray.data as rd

    from jsonschema_ray.stages.events import windowed_agg

    t = pa.table(
        {
            "event_type": pa.array(["a", None, None], pa.string()),
            "ts": pa.array([1_000_000, 2_000_000, 3_000_000], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    out = windowed_agg(rd.from_arrow(t), window="hour").to_pandas()
    null_rows = out[out["event_type"].isna()]
    assert len(null_rows) == 1
    assert int(null_rows["n_events"].iloc[0]) == 2
    assert float(null_rows["sum_value"].iloc[0]) == 5.0


def test_sessionize_groups_null_users_into_one_partition(ray_session):
    """NULL user_ids form one session partition (SQL PARTITION BY), not
    one session per event (NaN != NaN under raw equality)."""
    import ray.data as rd

    from jsonschema_ray.stages.events import sessionize

    base = 1_700_000_000_000_000
    t = pa.table(
        {
            "user_id": pa.array([None, None, None, 7], pa.int64()),
            "ts": pa.array(
                [base, base + 60_000_000, base + 120_000_000, base], pa.timestamp("us")
            ),
            "value": pa.array([1.0, 1.0, 1.0, 1.0], pa.float64()),
        }
    )
    out = sessionize(rd.from_arrow(t), gap_minutes=30).to_pandas()
    null_sessions = out[out["user_id"].isna()]
    assert len(null_sessions) == 1  # one session covering all 3 null rows
    assert int(null_sessions["n_events"].iloc[0]) == 3


def test_curate_rejects_unknown_pair_method(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.curate import curate_corpus

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
    )
    with pytest.raises(ValueError, match="unknown pair_method"):
        curate_corpus(ds, pair_method="Exact")


def test_segment_revenue_empty_customer_dim(ray_session, tmp_path):
    """q_segment_revenue must not IndexError when the customer dim is
    empty — unmatched orders get a null segment."""
    import shutil

    from jsonschema_ray.pipelines.queries import q_segment_revenue

    sf = str(tmp_path / "sf")
    shutil.copytree("/root/testdata/sf0.001", sf)
    import pyarrow.parquet as _pq

    cust = _pq.read_table(f"{sf}/customer.parquet")
    _pq.write_table(cust.slice(0, 0), f"{sf}/customer.parquet")
    out = q_segment_revenue(sf)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    # inner-join semantics (the oracle's JOIN): no matches → no groups
    assert len(df) == 0


def test_fused_hash_plan_handles_null_turn_violations(ray_session):
    """A 'required' violation on a null turn_idx floats to NaN through
    the hash plan's pandas bucket — the kernel must emit a NULL turn_idx
    violation row, not crash converting NaN to int32."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b"], pa.string()),
            "turn_idx": pa.array([0, None, 0], pa.int32()),
            "role": pa.array(["user", "assistant", "user"], pa.string()),
            "text": pa.array(["hello world"] * 3, pa.string()),
            "tool": pa.array([None] * 3, pa.string()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        }
    )
    # in-memory dataset: no footer stats → fused1 bails → hash plan
    got = transcript_violations(rd.from_arrow(t)).to_pandas()
    want = transcript_violations(rd.from_arrow(t), fused=False).to_pandas()
    key = ["conv_id", "turn_idx", "keyword", "message"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )
    # the null-turn row's violation flows through the pandas bucket as
    # NaN and must come back as a NULL turn_idx (this used to crash)
    assert got["turn_idx"].isna().sum() == 1


def test_transcript_violations_rejects_bad_checks(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    ds = rd.from_arrow(pa.table({"conv_id": ["a"], "turn_idx": [0]}))
    with pytest.raises(ValueError, match="unknown checks"):
        transcript_violations(ds, checks=("rows", "uniqe"))
    with pytest.raises(ValueError, match="at least one"):
        transcript_violations(ds, checks=())


def test_hot_split_slow_path_fallback_respects_exclusion(
    ray_session, planted_parquet, monkeypatch
):
    """Hot conversation + a NON-vectorizable schema: the fused plan's
    slow-path fallback must still exclude the hot conversations from its
    conv checks (the caller covers them via the salted kernel) — the old
    fallback ran conv checks over everything, duplicating every hot
    uniqueItems/contiguity/order violation."""
    import json

    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    monkeypatch.setenv("GRAFT_HOT_CONV_ROWS", "20000")
    schema = json.dumps(
        {
            "type": "object",
            # nested `properties` under a property → UnsupportedPlanError
            # (vacuous for string values, so row results are unchanged)
            "properties": {
                "conv_id": {"type": "string"},
                "turn_idx": {"type": "integer"},
                "text": {"properties": {"x": {"type": "string"}}},
            },
            "required": ["conv_id", "turn_idx"],
        }
    )
    got = transcript_violations(
        rd.read_parquet(planted_parquet), schema_json=schema
    ).to_pandas()
    want = transcript_violations(
        rd.read_parquet(planted_parquet), schema_json=schema, fused=False
    ).to_pandas()
    key = ["conv_id", "turn_idx", "keyword", "message"]
    pd.testing.assert_frame_equal(  # multiset equality: no duplicates
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )
    dup = got[(got["conv_id"] == "conv-00000001") & (got["keyword"] == "uniqueItems")]
    assert len(dup) == 1  # the planted duplicate is reported exactly once


def test_direct_exchange_handles_pandas_blocks(ray_session, planted_parquet, monkeypatch):
    """A pandas map stage upstream of the fused plan yields pandas
    blocks; the direct exchange's split task must convert them (its
    bucketing twin already does) instead of crashing on .num_rows."""
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations

    monkeypatch.delenv("GRAFT_HOT_CONV_ROWS", raising=False)

    def roundtrip(df):
        # all-null columns lose their Arrow type through pandas; restore
        # tool's string dtype so the type contract survives the stage
        return df.assign(tool=df["tool"].astype("string"))

    ds = rd.read_parquet(planted_parquet).map_batches(
        roundtrip, batch_format="pandas"
    )
    got = transcript_violations(ds).to_pandas()
    want = transcript_violations(
        rd.read_parquet(planted_parquet), fused=False
    ).to_pandas()
    key = ["conv_id", "turn_idx", "keyword", "message"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_quarantine_split_exact_keys(ray_session):
    """Quarantine membership joins on an injective composite key, not a
    64-bit hash — and null-keyed rows route to quarantine with their
    'required' violation."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import quarantine_split

    ca, cb = "conv-00000001", "conv-00000002"
    t = pa.table(
        {
            "conv_id": pa.array([ca, ca, None, cb], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
            "role": pa.array(["user", "assistant", "user", "user"], pa.string()),
            "text": pa.array(["hello world", "", "hello world", "hello world"], pa.string()),
            "tool": pa.array([None] * 4, pa.string()),
            "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
        }
    )
    clean, bad = quarantine_split(rd.from_arrow(t))
    cdf, bdf = clean.to_pandas(), bad.to_pandas()
    # row 1 (empty text → minLength) and row 2 (null conv_id → required)
    # quarantine; rows 0 and 3 stay clean
    assert sorted(cdf["turn_idx"].tolist()) == [0, 0]
    assert sorted(cdf["conv_id"].tolist()) == [ca, cb]
    assert len(bdf) == 2


# --- core-module review fixes -----------------------------------------------


def test_num_equal_underflow_matches_reference_ladder():
    """equal.go has no 'one side zero → unequal' rung: 0 vs an
    underflowing lexeme (1e-999) reaches the float64 fast path where
    both parse to 0.0 and compare EQUAL."""
    from jsonschema_ray.core.equal import equal
    from jsonschema_ray.core.jsontypes import JNum

    assert equal(JNum("0"), JNum("1e-999"))
    assert equal(JNum("1e-999"), JNum("0.0"))
    assert not equal(JNum("0"), JNum("0.5"))
    assert not equal(JNum("0"), JNum("5"))
    # overflow still falls back to the exact rational compare
    assert not equal(JNum("1e999"), JNum("2e999"))
    assert equal(JNum("1e999"), JNum("1e999"))


def test_rawschema_null_keyword_values_match_go_field_semantics():
    """encoding/json: null into a plain/pointer/slice field is 'not
    present' (no error); null into a non-pointer custom-unmarshal field
    (type, properties, minimum, ...) calls the decoder and errors."""
    import json

    from jsonschema_ray.core import parse
    from jsonschema_ray.core.compiler import SchemaCompileError

    ok = parse(
        json.dumps(
            {
                "required": None,
                "enum": None,
                "items": None,
                "maxLength": None,
                "not": None,
                "allOf": None,
                "additionalProperties": None,
                "uniqueItems": None,
            }
        ).encode()
    )
    assert ok.check(b"{}") is None  # all keywords absent → anything passes
    for kw in ("type", "properties", "patternProperties", "minimum", "dependencies"):
        with pytest.raises(SchemaCompileError):  # parse errors wrap here
            parse(json.dumps({kw: None}).encode())


def test_rawschema_uint64_overflow_is_parse_error():
    import json

    from jsonschema_ray.core import parse
    from jsonschema_ray.core.compiler import SchemaCompileError

    with pytest.raises(SchemaCompileError, match="uint64"):
        parse(json.dumps({"maxLength": 2**64}).encode())
    assert parse(json.dumps({"maxLength": 2**64 - 1}).encode()) is not None


def test_pointer_index_ascii_digits_only():
    """strconv.ParseUint parity: Unicode digits ('٣', '²') are invalid
    syntax, reported as PointerError — not silently resolved, not a bare
    ValueError."""
    from jsonschema_ray.core.pointer import PointerError, find

    tree = ["a", "b", "c", "d"]
    assert find("#/3", tree)[1] == "d"
    for bad in ("٣", "²", "", "3x"):
        with pytest.raises(PointerError, match="invalid syntax"):
            find(f"#/{bad}", tree)


def test_resolve_url_scheme_agnostic_relative_refs():
    """Go's URL.ResolveReference is scheme-agnostic; urllib's urljoin
    silently drops the base for schemes outside its allowlist (tag:,
    urn:) — the port must resolve like Go.  Go parses scheme:non-slash
    as an OPAQUE URL whose ResolveReference contributes nothing of the
    opaque part to a relative path ref: resolvePath("", ref) roots it
    with a leading slash ("tag:opaque" + "x" → "tag:/x")."""
    from jsonschema_ray.core.urls import resolve_url

    base = "tag:example,2024:schemas/root"
    assert resolve_url(base, "other") == "tag:/other"
    assert resolve_url(base, "#/defs/a") == base + "#/defs/a"
    assert resolve_url(base, "sub/x") == "tag:/sub/x"
    assert resolve_url(base, "../up") == "tag:/up"
    assert resolve_url(base, "http://h/x") == "http://h/x"  # absolute wins
    assert resolve_url("urn:a:b/c", "d") == "urn:/d"
    # authority-form custom schemes get the full hierarchical merge
    assert resolve_url("tag://host/a/b", "c") == "tag://host/a/c"
    # allowlisted schemes keep urllib's exact behavior
    assert resolve_url("http://h/a/b", "c") == "http://h/a/c"


def test_tree_value_nonfinite_floats_are_null():
    from jsonschema_ray.core.jsontypes import tree_value

    assert tree_value(float("nan")) is None
    assert tree_value(float("inf")) is None
    assert tree_value(float("-inf")) is None
    assert tree_value(1.5).lexeme == "1.5"
    assert tree_value([1.0, float("nan")])[1] is None


def test_grouped_running_sum_and_quantile_keep_null_groups(ray_session):
    """NULL-key rows form their own partition in the window kernels (SQL
    PARTITION BY / GROUP BY semantics) — the pandas default NaN-poisoned
    the running sum and dropped the quantile group."""
    import ray.data as rd

    from jsonschema_ray.stages.window import grouped_quantile, grouped_running_sum

    t = pa.table(
        {
            "k": pa.array(["a", None, None, "a"], pa.string()),
            "o": pa.array([1, 2, 3, 4], pa.int32()),
            "v": pa.array([10, 1, 2, 20], pa.int32()),
        }
    )
    rs = (
        grouped_running_sum(rd.from_arrow(t), ["k"], ["o"], "v")
        .to_pandas()
        .sort_values("o")
    )
    assert rs["running_sum"].tolist() == [10, 1, 3, 30]
    q = grouped_quantile(rd.from_arrow(t), ["k"], "v", q=0.5).to_pandas()
    assert len(q) == 2  # 'a' AND the null group
    null_q = q[q["k"].isna()]["q50"].iloc[0]
    assert float(null_q) == 1.5


def test_resolve_url_network_path_and_empty_segments():
    """The ref's authority wins for //host refs, and empty path segments
    are preserved (RFC 3986 literal remove_dot_segments) — both match
    Go's scheme-agnostic ResolveReference."""
    from jsonschema_ray.core.urls import resolve_url

    assert resolve_url("urn:example:x/y", "//host/a") == "urn://host/a"
    # empty segments survive under the authority-form merge (Go keeps
    # them; a collapse would alias distinct registered URLs)
    assert resolve_url("tag://h/a/b/c", "x//y") == "tag://h/a/b/x//y"
    # opaque base: relative refs root from / (Go resolvePath("", ref))
    assert resolve_url("tag:ex,2020:a/b/c", "x//y") == "tag:/x//y"
    assert resolve_url("tag:ex,2020:a/b/c", "./x") == "tag:/x"


def test_drift_baseline_bool_categorical_roundtrip(tmp_path):
    """Boolean categorical keys survive the save/load round trip (bool
    is an int subclass — a naive int keytype crashed int('True'))."""
    from jsonschema_ray.stages.drift import load_baseline, save_baseline

    profile = {"flag": {True: 5, False: 3}, "turn_idx": {0: 1}}
    p = str(tmp_path / "b.json")
    save_baseline(profile, p)
    assert load_baseline(p) == profile


def test_one_of_memo_released_after_batch():
    """The oneOf branch-count memo must not retain the last batch beyond
    the plan run — plans are cached process-wide."""
    import json

    from jsonschema_ray.core import parse
    from jsonschema_ray.vector.plan import compile_plan

    schema = parse(
        json.dumps(
            {
                "type": "object",
                "properties": {
                    "v": {"oneOf": [{"minimum": 0}, {"maximum": -10}]}
                },
            }
        ).encode()
    )
    plan = compile_plan(schema, pa.schema([("v", pa.int64())]))
    t = pa.table({"v": pa.array([5, -20, -5], pa.int64())})
    idx, kws, _m = plan.evaluate(t, mode="all")
    assert [int(i) for i in idx] == [2]  # -5 matches neither branch
    # after the second check consumed the memo, no batch is retained
    import gc

    closures = [
        c.cell_contents
        for chk in plan.checks
        for c in (chk._mask.__closure__ or [])
        if c.cell_contents is not None
    ]
    memos = [x for x in closures if isinstance(x, dict) and "b" in x]
    assert memos == []  # memo cleared → no pinned batch


def test_from_pandas_clean_schema_is_hashable():
    """pa.Table.from_pandas attaches pandas metadata that makes the
    schema UNHASHABLE (hash(schema) raises on the metadata dict), which
    defeats Ray's block-schema deduplication and floods logs with
    'Failed to hash the schemas' warnings — the clean helper strips it."""
    from jsonschema_ray.stages.bucketing import from_pandas_clean

    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    raw = pa.Table.from_pandas(df, preserve_index=False)
    with pytest.raises(TypeError):
        hash(raw.schema)
    clean = from_pandas_clean(df)
    assert hash(clean.schema) is not None  # hashable
    assert clean.schema.metadata is None
    assert clean.to_pydict() == raw.to_pydict()  # data identical
