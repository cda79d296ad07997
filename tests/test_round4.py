"""Round-4 regression tests: the VERDICT r3 / ADVICE r3 findings.

Covers: the blocked full-string byte-buffer hash (exact dedup path), the
chunked simhash bit-count kernel, StreamingDeduper numpy shards +
checkpoint/restore, redact column passthrough, BM25 query-tokenizer
parity + the batch-query variant, the sampled/parallel footer bucketer,
and the fused-plan parameter warnings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# -- hash_strings (blocked polynomial over full strings) ---------------------


def _ref_hash(s: str) -> int:
    """Per-byte reference of the tokhash polynomial + splitmix64."""
    from jsonschema_ray.stages.tokhash import mix64

    h = np.uint64(0)
    np.seterr(over="ignore")
    for byte in s.encode("utf-8"):
        h = h * np.uint64(1099511628211) + np.uint64(byte)
    return int(mix64(np.array([h], dtype=np.uint64))[0])


def test_hash_strings_matches_bytewise_reference():
    from jsonschema_ray.stages.tokhash import hash_strings

    rng = np.random.default_rng(7)
    texts = [
        "",
        "a",
        "short token run",
        "x" * 63,
        "y" * 64,
        "z" * 65,
        "unicode éß中文 mixed " * 9,
        "long " * 400,  # 2000 bytes → many full blocks + tail
    ] + ["".join(chr(rng.integers(32, 127)) for _ in range(int(n))) for n in rng.integers(0, 300, 20)]
    col = pa.chunked_array([pa.array(texts[:5], pa.string()), pa.array(texts[5:], pa.string())])
    got = hash_strings(col)
    assert got.dtype == np.uint64
    for s, g in zip(texts, got):
        assert int(g) == _ref_hash(s), repr(s[:40])


def test_hash_strings_null_and_large_string():
    from jsonschema_ray.stages.tokhash import hash_strings

    col = pa.array(["abc", None, ""], pa.large_string())
    got = hash_strings(col)
    assert int(got[0]) == _ref_hash("abc")
    assert int(got[1]) == _ref_hash("")  # null hashes as empty
    assert int(got[2]) == _ref_hash("")


# -- chunked simhash kernel --------------------------------------------------


def test_simhash_kernel_chunking_invariant():
    """Forcing tiny chunks must reproduce the unchunked signatures exactly
    (including a document longer than the chunk)."""
    from jsonschema_ray.stages.dedup import _simhash_kernel
    from jsonschema_ray.stages.tokhash import batch_token_hashes

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{rng.integers(50)}" for _ in range(int(n)))
        for n in rng.integers(0, 40, 30)
    ]
    texts[7] = " ".join(f"big{i}" for i in range(200))  # over-chunk doc
    texts[3] = ""  # empty doc → zero signature
    th, _sg, ntok = batch_token_hashes(pa.array(texts, pa.string()))
    full = _simhash_kernel(th, ntok)
    tiny = _simhash_kernel(th, ntok, chunk_tokens=16)
    assert np.array_equal(full, tiny)
    assert (ntok == 0).any() and full[ntok == 0].sum() == 0


# -- exact_dedup via the byte-buffer hash ------------------------------------


def test_exact_dedup_hash_key_matches_text_key(ray_session):
    import ray.data as rd

    from jsonschema_ray.stages.dedup import exact_dedup

    texts = [f"content {i % 37}" for i in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    a = (
        exact_dedup(rd.from_pandas(df).repartition(4), key="hash")
        .to_pandas()
        .sort_values("doc_id_kept")
        .reset_index(drop=True)
    )
    b = (
        exact_dedup(rd.from_pandas(df).repartition(4), key="text")
        .to_pandas()
        .sort_values("doc_id_kept")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 37


# -- StreamingDeduper: numpy shards + durability -----------------------------


def test_shard_state_sorted_array_semantics():
    from jsonschema_ray.stages.streaming import _ShardState

    st = _ShardState()
    k1 = np.array([5, 9, 5, 1], dtype=np.uint64)
    # caller dedupes within batch; here keys are unique per call
    out = st.check_and_add(np.array([5, 9, 1], dtype=np.uint64))
    assert out.tolist() == [True, True, True]
    out = st.check_and_add(np.array([9, 2], dtype=np.uint64))
    assert out.tolist() == [False, True]
    assert st.size() == 4
    assert np.array_equal(st.snapshot(), np.array([1, 2, 5, 9], dtype=np.uint64))
    del k1


def test_shard_state_merge_threshold(monkeypatch):
    import jsonschema_ray.stages.streaming as sm

    monkeypatch.setattr(sm, "_MERGE_THRESHOLD", 8)
    st = sm._ShardState()
    for lo in range(0, 40, 5):
        st.check_and_add(np.arange(lo, lo + 5, dtype=np.uint64))
    assert st.size() == 40
    assert st.pending_n < 8  # round 5: pending is a run list, not one array
    out = st.check_and_add(np.array([0, 39, 1000], dtype=np.uint64))
    assert out.tolist() == [False, False, True]


def test_streaming_dedup_checkpoint_restore(ray_session, tmp_path):
    """Simulated restart: a fresh deduper restored from the checkpoint
    rejects everything the dead one accepted."""
    import ray.data as rd

    from jsonschema_ray.stages.streaming import StreamingDeduper

    df = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "text": [f"doc {i % 75}" for i in range(300)],
        }
    )
    dd = StreamingDeduper(n_shards=4)
    first = dd.dedup(rd.from_pandas(df).repartition(6)).to_pandas()
    assert len(first) == 75
    ckpt = str(tmp_path / "dedup_index")
    man = dd.checkpoint(ckpt)
    assert man["n_keys"] == 75 and man["n_shards"] == 4

    # "restart": new actors, state only from disk
    dd2 = StreamingDeduper(n_shards=4, checkpoint_dir=ckpt)
    assert dd2.index_size() == 75
    replay = dd2.dedup(rd.from_pandas(df).repartition(6)).to_pandas()
    assert len(replay) == 0
    fresh = dd2.dedup(
        rd.from_pandas(pd.DataFrame({"doc_id": [999], "text": ["unseen"]}))
    ).to_pandas()
    assert len(fresh) == 1

    with pytest.raises(ValueError):
        StreamingDeduper(n_shards=2, checkpoint_dir=ckpt)


# -- redact passthrough ------------------------------------------------------


def test_redact_preserves_other_columns(ray_session):
    import ray.data as rd

    from jsonschema_ray.stages.text import redact

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["mail me a@b.co now", "clean"],
            "source": ["web", "book"],
            "score": [0.5, 0.9],
        }
    )
    out = redact(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "text", "source", "score"]
    assert out["text"].tolist() == ["mail me [PII] now", "clean"]
    assert out["source"].tolist() == ["web", "book"]


# -- BM25: tokenizer parity + batch queries ----------------------------------


def test_bm25_query_tokenizer_matches_corpus_class():
    from jsonschema_ray.stages.tfidf import _query_terms

    # \x0b (vertical tab) and NBSP are whitespace to str.split but NOT to
    # the corpus byte tokenizer — they must stay inside the term
    assert _query_terms("a\x0bb c") == ["a\x0bb", "c"]
    assert _query_terms("x y z") == ["x y", "z"]
    assert _query_terms("t1 \t t2\nt2") == ["t1", "t2"]


def _bm25_brute(docs: dict[int, str], query: str, k1=1.2, b=0.75):
    import math
    import re

    N = len(docs)
    toks = {d: re.split(r"[\t\n\f\r ]+", t) for d, t in docs.items()}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    avgdl = sum(len(ws) for ws in toks.values()) / N
    qs = sorted({w for w in re.split(r"[\t\n\f\r ]+", query) if w})
    scores, hits = {}, {}
    for term in qs:
        df = sum(1 for ws in toks.values() if term in ws)
        if df == 0:
            continue
        idf = math.log1p((N - df + 0.5) / (df + 0.5))
        for d, ws in toks.items():
            tf = ws.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
            scores[d] = scores.get(d, 0.0) + s
            hits[d] = hits.get(d, 0) + 1
    return {d: (round(s, 6), hits[d]) for d, s in scores.items()}


def test_bm25_topk_multi_matches_bruteforce(ray_session):
    import ray.data as rd

    from jsonschema_ray.stages.tfidf import bm25_topk_multi

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        i: " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        for i in range(60)
    }
    queries = {"q_alpha": "w1 w2 w3", "q_beta": "w4 w29", "q_gamma": "w1 nosuchterm"}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = bm25_topk_multi(
        rd.from_pandas(df).repartition(5), queries, k=7
    ).to_pandas()
    for qid, qtext in queries.items():
        want = _bm25_brute(docs, qtext)
        top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:7]
        got = out[out["query_id"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        assert [int(d) for d in got["doc_id"]] == [d for d, _ in top], qid
        np.testing.assert_allclose(
            got["score"].to_numpy(), [s for _, (s, _) in top], atol=1e-6
        )
        assert got["n_hit_terms"].tolist() == [h for _, (_, h) in top]


# -- sampled footer bucketer -------------------------------------------------


def test_range_bucketer_samples_many_files(ray_session, tmp_path):
    """>64 input files: the bucketer must stay order-preserving while
    reading only a bounded sample of footers."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _conv_range_bucketer

    ids = [f"conv{idx:05d}" for idx in range(1400)]
    for i in range(70):
        tbl = pa.table({"conv_id": pa.array(ids[i * 20 : (i + 1) * 20]), "turn_idx": pa.array(np.arange(20, dtype=np.int32))})
        pq.write_table(tbl, tmp_path / f"part-{i:03d}.parquet")
    ds = rd.read_parquet(str(tmp_path))
    bucket_of = _conv_range_bucketer(ds, 16)
    assert bucket_of is not None
    b = bucket_of(np.array(ids, dtype=object))
    assert (np.diff(b) >= 0).all()  # monotone in conv_id
    assert len(np.unique(b)) >= 8  # sampling kept real spread


# -- fused-plan parameter handling ------------------------------------------


def test_fused_true_with_partial_checks_warns(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import transcript_violations

    tbl = pa.table(
        {
            "conv_id": pa.array(["conv-00000001", "conv-00000001"], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array(["user", "assistant"], pa.string()),
            "text": pa.array(["hi", "hello"], pa.string()),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array(
                [1735689600000000, 1735689601000000], pa.timestamp("us")
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    with pytest.warns(UserWarning, match="fused=True"):
        out = transcript_violations(ds, checks=("rows",), fused=True)
    assert out.count() == 0


# -- registry: exactly 50 entries, all inside the driver window ---------------


def test_registry_is_exactly_fifty():
    """The driver's correctness harness checks a 50-query window (round-3
    verdict); the registry must fit it exactly so EVERY operator gets a
    driver-green row."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    # queries()/oracle_sql() only build dicts (transcripts_path touches
    # /tmp but needs no Ray session)
    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) == 50
    # round 5: every registry entry has a DuckDB oracle (q_embed_dedup
    # gained one via the exported projection matrix)
    assert set(qs) == set(oracles)


# -- text_metrics ≡ the four separate stages ----------------------------------


def test_text_metrics_matches_separate_stages(ray_session):
    import ray.data as rd

    from jsonschema_ray.stages.text import (
        lang_id,
        quality_scores,
        repetition_scores,
        text_metrics,
        token_stats,
    )

    rng = np.random.default_rng(5)
    vocab = ["the", "and", "der", "und", "le", "et", "tok", "x1", "yy", "zzz"]
    texts = [
        " ".join(rng.choice(vocab, size=int(n))) for n in rng.integers(0, 20, 80)
    ]
    texts[0] = ""
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": texts})

    def get(dsfn):
        return dsfn(rd.from_pandas(df).repartition(3)).to_pandas().sort_values("doc_id").reset_index(drop=True)

    merged = get(text_metrics)
    tok = get(token_stats)
    qual = get(quality_scores)
    lang = get(lang_id)
    rep = get(lambda d: repetition_scores(d, n=3))

    pd.testing.assert_series_equal(merged["n_chars"], tok["n_chars"])
    pd.testing.assert_series_equal(merged["n_tokens"], tok["n_tokens"])
    pd.testing.assert_series_equal(merged["n_subtokens"], tok["n_subtokens"])
    pd.testing.assert_series_equal(merged["stop_ratio"], qual["stop_ratio"])
    pd.testing.assert_series_equal(merged["mean_token_len"], qual["mean_token_len"])
    pd.testing.assert_series_equal(merged["lang_pred"], lang["lang_pred"])
    pd.testing.assert_series_equal(merged["top_token_frac"], rep["top_token_frac"])
    pd.testing.assert_series_equal(merged["dup_ngram_frac"], rep["dup_ngram_frac"])


# -- Arrow twin of the per-bucket conversation checks -------------------------


def _random_conv_table(seed: int, n: int = 4000):
    """Adversarial conv-check input: duplicate (conv, turn) keys, gaps,
    bad starts, out-of-order ts, unicode conv ids, multi-row turns."""
    rng = np.random.default_rng(seed)
    convs = np.array(
        [f"c{i:04d}" for i in range(40)] + ["ü-conv", "中文conv", "a" * 40],
        dtype=object,
    )
    conv = rng.choice(convs, size=n)
    # mostly contiguous turns per conv, with planted corruption
    order = np.argsort(conv, kind="stable")
    turn = np.zeros(n, dtype=np.int64)
    conv_sorted = conv[order]
    first = np.ones(n, dtype=bool)
    first[1:] = conv_sorted[1:] != conv_sorted[:-1]
    seq = np.arange(n) - np.maximum.accumulate(np.where(first, np.arange(n), 0))
    turn[order] = seq
    corrupt = rng.random(n)
    turn[corrupt < 0.05] += rng.integers(1, 900, size=int((corrupt < 0.05).sum()))
    turn[corrupt > 0.97] = rng.integers(0, 5, size=int((corrupt > 0.97).sum()))
    ts = np.int64(1_700_000_000_000_000) + turn * 1_000_000
    jitter = rng.random(n) < 0.08
    ts[jitter] -= rng.integers(1, 10_000_000_000, size=int(jitter.sum()))
    ts_arr = pa.array(ts, pa.timestamp("us"))
    # NaT ts rows (incl. whole all-NaT turn groups): the order check's
    # bound must skip them exactly like the pandas cummax kernel
    nat = rng.random(n) < 0.03
    conv_o = conv.astype(object)
    if nat.any():
        ts_py = ts_arr.to_pylist()
        for i in np.flatnonzero(nat):
            ts_py[i] = None
        ts_arr = pa.array(ts_py, pa.timestamp("us"))
    # null conv_id / turn_idx rows: excluded by BOTH kernels
    turn_o = turn.astype(object)
    nullc = rng.random(n) < 0.02
    conv_o[nullc] = None
    nullt = rng.random(n) < 0.02
    turn_o[nullt] = None
    return pa.table(
        {
            "conv_id": pa.array(conv_o, pa.string()),
            "turn_idx": pa.array(turn_o, pa.int32()),
            "ts": ts_arr,
        }
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize(
    "which",
    [("unique",), ("contiguity",), ("order",), ("unique", "contiguity", "order")],
)
def test_run_bucket_table_matches_pandas(seed, which):
    from jsonschema_ray.stages.checks import _run_bucket, _run_bucket_table

    t = _random_conv_table(seed)
    got = _run_bucket_table(t, which).to_pandas()
    want = _run_bucket(t.to_pandas(), which).to_pandas()
    cols = ["conv_id", "turn_idx", "keyword", "message"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_run_bucket_table_null_keys_excluded():
    """Rows with null conv_id/turn_idx are 'required' row violations
    upstream; the conversation checks skip them (pandas groupby parity)."""
    from jsonschema_ray.stages.checks import _run_bucket_table

    t = pa.table(
        {
            "conv_id": pa.array(["a", None, "a", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, None, 0], pa.int32()),
            "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
        }
    )
    out = _run_bucket_table(t, ("unique", "contiguity", "order"))
    assert out.num_rows == 0
    allnull = pa.table(
        {
            "conv_id": pa.array([None, None], pa.string()),
            "turn_idx": pa.array([None, 1], pa.int32()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
        }
    )
    assert _run_bucket_table(allnull, ("unique",)).num_rows == 0


def test_run_bucket_table_empty_and_clean():
    from jsonschema_ray.stages.checks import _run_bucket_table

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "ts": pa.array([], pa.timestamp("us")),
        }
    )
    assert _run_bucket_table(empty, ("unique", "contiguity", "order")).num_rows == 0
    clean = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        }
    )
    assert _run_bucket_table(clean, ("unique", "contiguity", "order")).num_rows == 0


def test_conv_range_bucketer_arrow_path_equals_numpy(tmp_path):
    """bucket_of's zero-copy Arrow fast path must assign exactly the same
    buckets as the legacy numpy path — unicode, nulls, > W-byte ids."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _conv_range_bucketer

    ids = sorted(
        [f"conv-{i:08d}" for i in range(0, 600, 5)]
        + ["conv-üü" + str(i) for i in range(5)]
        + ["z" * 80 + str(i) for i in range(5)]  # longer than the S{W} window
    )
    for k in range(3):
        chunk = ids[k * len(ids) // 3 : (k + 1) * len(ids) // 3]
        pq.write_table(pa.table({"conv_id": chunk}), tmp_path / f"p{k}.parquet")
    fn = _conv_range_bucketer(rd.read_parquet(str(tmp_path)), 8)
    assert fn is not None
    probe = ids + ["", "conv-99999999", "中"]
    via_np = fn(np.array(probe + [None], dtype=object))
    via_arrow = fn(pa.array(probe + [None], pa.string()))
    assert np.array_equal(via_np, via_arrow)
    chunked = pa.chunked_array([probe[:7], probe[7:] + [None]], pa.string())
    assert np.array_equal(via_np, fn(chunked))


def test_maybe_coalesce_read_replans_only_bare_reads():
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _maybe_coalesce_read
    from jsonschema_ray.sources.transcripts import transcripts_path

    path = transcripts_path("/root/testdata/sf0.001")
    ds = rd.read_parquet(path)
    out = _maybe_coalesce_read(ds)
    assert out.count() == ds.count()
    mapped = ds.map_batches(lambda b: b, batch_format="pyarrow")
    assert _maybe_coalesce_read(mapped) is mapped


def test_maybe_coalesce_read_preserves_projection_and_filters():
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _maybe_coalesce_read

    pruned = rd.read_parquet("/root/testdata/sf0.001/region.parquet", columns=["r_name"])
    out = _maybe_coalesce_read(pruned)
    assert out.schema().names == ["r_name"]

    import pyarrow.compute as pc

    filtered = rd.read_parquet(
        "/root/testdata/sf0.001/region.parquet",
        filter=pc.field("r_regionkey") > 1,
    )
    # a pushed-down row filter cannot be re-planned — returned untouched
    assert _maybe_coalesce_read(filtered) is filtered


def test_fused1_direct_and_ray_exchanges_agree(ray_session):
    """The raw two-stage exchange and the Dataset groupby exchange must
    produce identical sorted violations (same kernels, different routing)."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import (
        transcript_violations_fused1,
    )
    from jsonschema_ray.sources.transcripts import transcripts_path

    path = transcripts_path("/root/testdata/sf0.01")

    def get(route):
        out = transcript_violations_fused1(rd.read_parquet(path), exchange=route)
        assert out is not None
        return out.to_pandas().reset_index(drop=True)

    a = get("direct")
    b = get("ray")
    pd.testing.assert_frame_equal(a, b)
    # direct output is globally ordered as produced
    keys = list(zip(a.conv_id, a.turn_idx, a.keyword))
    assert keys == sorted(keys)


# -- generic direct exchange (bucketed_map_groups) ----------------------------


def test_bucketed_direct_and_ray_routes_agree(ray_session):
    import ray.data as rd

    from jsonschema_ray.stages.bucketing import bucketed_map_groups

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(-50, 50, 5000).astype(np.int32),
            "v": rng.random(5000).round(6),
            "s": [f"s{i % 97}" for i in range(5000)],
        }
    )
    schema = pa.schema([("k", pa.int64()), ("n", pa.int64()), ("sv", pa.float64())])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("k", sort=False)
            .agg(n=("v", "size"), sv=("v", "sum"))
            .reset_index()
        )
        out["sv"] = out["sv"].round(6)
        return out

    def run(route):
        out = bucketed_map_groups(
            rd.from_pandas(df).repartition(5),
            ["k"],
            agg,
            out_schema=schema,
            exchange=route,
        ).to_pandas()
        return out.sort_values("k").reset_index(drop=True)

    a, b = run("direct"), run("ray")
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 100
    # brute force
    want = agg(df).sort_values("k").reset_index(drop=True).astype({"k": np.int64})
    pd.testing.assert_frame_equal(a, want)


def test_bucketed_direct_empty_buckets_typed(ray_session):
    """A key space much smaller than the bucket count leaves most buckets
    empty — they must come back as typed empty blocks, not crash."""
    import ray.data as rd

    from jsonschema_ray.stages.bucketing import bucketed_map_groups

    df = pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]})
    schema = pa.schema([("k", pa.int64()), ("sv", pa.float64())])
    out = bucketed_map_groups(
        rd.from_pandas(df),
        ["k"],
        lambda g: g.groupby("k", sort=False)["v"].sum().reset_index(name="sv"),
        num_buckets=64,
        out_schema=schema,
        exchange="direct",
    )
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["sv"].tolist() == [3.0, 3.0]
    assert out.schema().names == ["k", "sv"]


# -- chunked deterministic generation -----------------------------------------


def test_generate_transcripts_chunked(tmp_path, monkeypatch):
    import pyarrow.dataset as pds

    import jsonschema_ray.sources.transcripts as tr

    monkeypatch.setattr(tr, "_GEN_CHUNK_TURNS", 5000)
    p = tr.generate_transcripts(str(tmp_path / "big"), n_turns=12_000, seed=7)
    d = pds.dataset(p)
    t = d.to_table(columns=["conv_id", "turn_idx"])
    n = t.num_rows
    assert n >= 12_000
    convs = t["conv_id"].to_pylist()
    # disjoint id ranges per chunk: every id is unique to one chunk, so a
    # conversation never straddles chunks and global uniqueness semantics
    # hold for the planted-dup rows only
    import collections

    first_digit_groups = collections.Counter(c[:6] for c in convs)
    assert len(first_digit_groups) >= 2  # offsets 0 and 10_000_000 present
    # idempotent: second call reuses the directory (same _SPEC)
    assert tr.generate_transcripts(str(tmp_path / "big"), n_turns=12_000, seed=7) == p


def test_generate_transcripts_small_tables_unchanged(tmp_path):
    """n_turns at or under one chunk must stay bit-identical to the
    pre-chunking generator (spec gen_version 5, no chunk_turns key)."""
    import json as _json

    from jsonschema_ray.sources.transcripts import generate_transcripts

    p = generate_transcripts(str(tmp_path / "t"), n_turns=8_000, seed=42)
    spec = _json.load(open(f"{p}/_SPEC.json"))
    assert "chunk_turns" not in spec and spec["gen_version"] == 5


def test_cosine_topk_many_queries_per_bucket(ray_session):
    """The grouped top-k reduce receives MANY query groups per bucket —
    head(k) must apply per query, not per bucket (caught by the oracle
    smoke when the merge moved to the bucketed exchange)."""
    import ray.data as rd

    from jsonschema_ray.stages.ann import cosine_topk

    rng = np.random.default_rng(3)
    n, d = 400, 8
    vecs = rng.standard_normal((n, d))
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [list(v) for v in vecs]}
    )
    qids = list(range(0, 40))  # 40 queries >> bucket count they hash into
    out = cosine_topk(rd.from_pandas(df).repartition(4), qids, k=3).to_pandas()
    counts = out.groupby("query_id").size()
    assert len(counts) == 40 and (counts == 3).all()
    assert sorted(out["rank"].unique().tolist()) == [1, 2, 3]
    # brute-force one query
    q = vecs[qids[7]] / np.linalg.norm(vecs[qids[7]])
    sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ q
    sims[qids[7]] = -np.inf
    want = set(np.argsort(-sims)[:3].tolist())
    got = set(out[out.query_id == qids[7]]["vec_id"].tolist())
    assert got == want


def test_sessionize_string_user_keys(ray_session):
    """sessionize must preserve a string user column's type through the
    typed stamp (a hardcoded int64 out_schema would raise on cast)."""
    import ray.data as rd

    from jsonschema_ray.stages.events import sessionize

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": ["alice", "alice", "bob", "alice"],
            "ts": [
                base,
                base + pd.Timedelta(minutes=5),
                base,
                base + pd.Timedelta(hours=3),
            ],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = (
        sessionize(rd.from_pandas(df), gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == ["alice", "alice", "bob"]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["sum_value"].tolist() == [3.0, 4.0, 3.0]


def test_maybe_coalesce_read_respects_explicit_read_config():
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _maybe_coalesce_read

    p = "/root/testdata/sf0.001/region.parquet"
    explicit_blocks = rd.read_parquet(p, override_num_blocks=7)
    assert _maybe_coalesce_read(explicit_blocks) is explicit_blocks
    widened = rd.read_parquet(
        p,
        schema=pa.schema(
            [
                ("r_regionkey", pa.int64()),
                ("r_name", pa.string()),
                ("r_comment", pa.string()),
            ]
        ),
    )
    assert _maybe_coalesce_read(widened) is widened


def test_bucketed_forced_direct_requires_out_schema(ray_session):
    import ray.data as rd

    from jsonschema_ray.stages.bucketing import bucketed_map_groups

    df = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    with pytest.raises(ValueError, match="out_schema"):
        bucketed_map_groups(
            rd.from_pandas(df),
            ["k"],
            lambda g: g,
            exchange="direct",
        )


def test_queries_on_forced_ray_exchange(ray_session, monkeypatch):
    """The Dataset AllToAll route is the production path above the size
    gate — pin a few operators to it and compare against the direct
    route so the at-scale plan stays covered by CI."""
    monkeypatch.setenv("GRAFT_BUCKETED_EXCHANGE", "ray")
    monkeypatch.setenv("GRAFT_FUSED1_EXCHANGE", "ray")
    from jsonschema_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    ray_results = {
        name: getattr(q, name)(sf) for name in ("q_exact_dedup", "q_top_events")
    }
    ray_results = {
        k: (v.to_pandas() if hasattr(v, "to_pandas") else v)
        for k, v in ray_results.items()
    }
    monkeypatch.setenv("GRAFT_BUCKETED_EXCHANGE", "direct")
    monkeypatch.setenv("GRAFT_FUSED1_EXCHANGE", "direct")
    for name, want in ray_results.items():
        got = getattr(q, name)(sf)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        cols = list(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            want[cols].sort_values(cols).reset_index(drop=True),
        )
