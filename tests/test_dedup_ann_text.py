"""Tests for the training-data operators: dedup, similarity search, text
analysis, multimodal plumbing — with pytest-side oracles for the
non-SQL-expressible ones."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF01}/documents.parquet", columns=["doc_id", "text"])


def test_exact_dedup_hash_equals_text_key():
    from jsonschema_ray.stages.dedup import exact_dedup

    by_hash = exact_dedup(_docs(), key="hash").to_pandas()
    by_text = exact_dedup(_docs(), key="text").to_pandas()
    key = ["doc_id_kept", "n_copies"]
    assert by_hash.sort_values(key).reset_index(drop=True).equals(
        by_text.sort_values(key).reset_index(drop=True)
    )
    assert by_hash["n_copies"].sum() == 500


def test_minhash_recall_against_exact():
    """LSH candidates (verified) vs the exact inverted-index pairs:
    precision must be 1.0; recall follows the S-curve (≥ 0.9 here)."""
    from jsonschema_ray.stages.dedup import jaccard_pairs_exact, minhash_lsh_pairs

    exact = jaccard_pairs_exact(_docs(), threshold=0.5).to_pandas()
    lsh = minhash_lsh_pairs(_docs(), threshold=0.5).to_pandas()
    e = {(int(a), int(b)) for a, b in zip(exact["a"], exact["b"])}
    l = {(int(a), int(b)) for a, b in zip(lsh["a"], lsh["b"])}
    assert l <= e, "LSH reported a pair the exact method rejects (precision < 1)"
    if e:
        assert len(l & e) / len(e) >= 0.9
    # jaccard values agree on the intersection
    em = {(int(a), int(b)): j for a, b, j in exact.itertuples(index=False)}
    lm = {(int(a), int(b)): j for a, b, j in lsh.itertuples(index=False)}
    for pair in l & e:
        assert abs(em[pair] - lm[pair]) < 1e-9


def test_minhash_heavy_dup_stays_distributed():
    """A planted clique of 500 identical docs → 124,750 verified pairs —
    the verification stage must survive a candidate set this dense (it
    runs as distributed exchanges; the driver only sees the final count)."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import minhash_lsh_pairs

    n_docs = 500
    text = " ".join(f"tok{i}" for i in range(12))
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": text})
    out = minhash_lsh_pairs(rd.from_pandas(df), threshold=0.5)
    agg = out.map_batches(
        lambda t: pd.DataFrame(
            {"n": [len(t)], "j_min": [t["jaccard"].min() if len(t) else 1.0]}
        ),
        batch_format="pandas",
    ).to_pandas()
    assert agg["n"].sum() == n_docs * (n_docs - 1) // 2
    assert agg["j_min"].min() == 1.0


def test_streaming_dedup_index_across_runs():
    """The sharded seen-content index must (a) keep exactly one row per
    distinct content within a run, regardless of batch boundaries, and
    (b) remember across runs — a replayed dataset contributes nothing."""
    import ray.data as rd

    from jsonschema_ray.stages.streaming import StreamingDeduper

    texts = [f"doc body {i % 120}" for i in range(600)]  # 5 copies each
    df = pd.DataFrame(
        {"doc_id": np.arange(600, dtype=np.int64), "text": texts}
    )
    dd = StreamingDeduper(n_shards=4)
    first = dd.dedup(rd.from_pandas(df).repartition(8)).to_pandas()
    assert len(first) == 120
    assert sorted(first["text"].unique()) == sorted(set(texts))
    assert dd.index_size() == 120
    # replay: everything already accepted
    second = dd.dedup(rd.from_pandas(df).repartition(8)).to_pandas()
    assert len(second) == 0
    # genuinely new content still flows
    df2 = pd.DataFrame({"doc_id": [1000], "text": ["brand new doc"]})
    third = dd.dedup(rd.from_pandas(df2)).to_pandas()
    assert len(third) == 1


def test_connected_components_random_graph():
    """Iterative min-label propagation vs a driver union-find oracle on a
    random graph with long chains (forces multiple rounds)."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.graph import connected_components

    rng = np.random.default_rng(17)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 400, (300, 2)) if a != b]
    edges += [(1000 + i, 1000 + i + 1) for i in range(20)]  # a 21-node chain

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    got = connected_components(rd.from_arrow(t)).to_pandas()
    got_map = dict(zip(got["node"], got["component"]))
    assert got_map == want


def test_connected_components_distributed_path():
    """Force the iterative label-propagation path (driver_threshold=0):
    pointer jumping must collapse an 8-chain to one component."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.graph import connected_components

    edges = [(i, i + 1) for i in range(8)]
    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    got = connected_components(rd.from_arrow(t), driver_threshold=0).to_pandas()
    assert set(got["component"]) == {0}
    assert set(got["node"]) == set(range(9))


def test_components_keep_first_composition():
    """minhash pairs → components → one survivor per cluster: a planted
    3-doc near-dup chain keeps exactly its min doc id."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.dedup import jaccard_pairs_exact
    from jsonschema_ray.stages.graph import components_keep_first

    base = " ".join(f"tok{i}" for i in range(30))
    texts = {
        0: base,
        1: base + " extraA",
        2: base + " extraA extraB",
        3: " ".join(f"other{i}" for i in range(30)),
    }
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[k] for k in texts]}
    )
    ds = rd.from_pandas(df)
    pairs = jaccard_pairs_exact(rd.from_pandas(df), threshold=0.5)
    kept = components_keep_first(ds, pairs).to_pandas()
    assert set(kept["doc_id"]) == {0, 3}


def test_minhash_unverified_candidates_superset():
    """verify=False returns the deduped candidate pairs — a superset of the
    verified pairs (verification only ever removes), with no jaccard
    column and no shingle shipping."""
    from jsonschema_ray.stages.dedup import minhash_lsh_pairs

    cand = minhash_lsh_pairs(_docs(), threshold=0.5, verify=False).to_pandas()
    ver = minhash_lsh_pairs(_docs(), threshold=0.5).to_pandas()
    c = {(int(a), int(b)) for a, b in zip(cand["a"], cand["b"])}
    v = {(int(a), int(b)) for a, b in zip(ver["a"], ver["b"])}
    assert v <= c
    assert "jaccard" not in cand.columns


def test_curate_minhash_fast_matches_exact_on_clean_pairs():
    """On a corpus whose LSH candidates are exactly the true near-dup
    pairs, the fast clustering path keeps the same survivors as the
    exact path."""
    import ray.data as rd

    from jsonschema_ray.pipelines.curate import curate_corpus

    base = " ".join(f"tok{i}" for i in range(30))
    texts = {
        0: base,
        1: base + " extraA",
        2: base + " extraA extraB",
        3: " ".join(f"other{i}" for i in range(30)),
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": [texts[k] for k in texts]})
    exact = curate_corpus(rd.from_pandas(df), jaccard_threshold=0.5).to_pandas()
    fast = curate_corpus(
        rd.from_pandas(df), jaccard_threshold=0.5, pair_method="minhash_fast"
    ).to_pandas()
    assert set(exact["doc_id"]) == set(fast["doc_id"]) == {0, 3}


def test_simhash_deterministic_and_near_dup_property():
    from jsonschema_ray.stages.dedup import simhash64

    a = simhash64(_docs()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = simhash64(_docs()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["simhash"].nunique() > 400  # distinct docs → spread hashes


def test_cosine_topk_matches_numpy_bruteforce():
    import pyarrow.parquet as pq

    from jsonschema_ray.stages.ann import cosine_topk

    got = cosine_topk(
        __import__("ray").data.read_parquet(f"{SF01}/embeddings.parquet"),
        query_ids=list(range(5)),
        k=5,
    ).to_pandas()

    t = pq.read_table(f"{SF01}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist())
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(5):
        qv = m[ids == qid][0]
        sims = np.round(m @ qv, 6)
        order = sorted(
            [(s, int(i)) for s, i in zip(sims, ids) if i != qid],
            key=lambda x: (-x[0], x[1]),
        )[:5]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert list(sub["vec_id"]) == [i for _, i in order]


def test_lsh_topk_recall():
    # LSH recall guarantees apply to genuinely-near neighbors; random 64-dim
    # vectors have max cosine ~0.4 whose codes differ in >2 bits, so the test
    # plants true near-duplicates (query + small noise) and checks the
    # bucketed scorer recovers them.
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.ann import cosine_topk, lsh_topk

    rng = np.random.default_rng(7)
    base = rng.standard_normal((200, 64))
    rows = [(i, base[i]) for i in range(200)]
    planted: dict[int, set[int]] = {0: set(), 1: set(), 2: set()}
    for qid in (0, 1, 2):
        for _ in range(5):
            dup_id = 1000 + len(rows)
            rows.append((dup_id, base[qid] + 0.05 * rng.standard_normal(64)))
            planted[qid].add(dup_id)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1].tolist() for r in rows], pa.list_(pa.float64())),
            }
        )
    )
    exact = cosine_topk(ds, query_ids=[0, 1, 2], k=5).to_pandas()
    approx = lsh_topk(ds, query_ids=[0, 1, 2], k=5).to_pandas()
    e_hits = a_hits = 0
    for qid in (0, 1, 2):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        e_hits += len(e & planted[qid])
        a_hits += len(a & planted[qid])
    assert e_hits == 15  # exact finds every planted near-dup
    assert a_hits / 15 >= 0.8  # LSH recovers ≥80% of true near-neighbors


def test_fingerprints_deterministic_and_rolling_property():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.text import fingerprints

    df = fingerprints(_docs()).to_pandas()
    assert df["fp_full"].nunique() == 500  # distinct docs → distinct hashes
    # identical docs → identical fingerprints
    two = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["same words here", "same words here"]})
    )
    out = fingerprints(two).to_pandas()
    assert out["fp_full"].iloc[0] == out["fp_full"].iloc[1]
    assert out["fp_min_window"].iloc[0] == out["fp_min_window"].iloc[1]


def test_decode_stage_plumbing_and_strict_gate():
    import pyarrow as pa

    from jsonschema_ray.stages.multimodal import DecodeStage, attach_payload, decode_features

    out = decode_features(attach_payload(_docs())).to_pandas()
    assert len(out) == 500
    assert (out["width"] >= 16).all() and (out["height"] >= 16).all()
    with pytest.raises(NotImplementedError):
        DecodeStage(mode="strict")
    # determinism
    d = DecodeStage()
    t = pa.table(
        {"doc_id": [1], "payload": pa.array([b"abc"], pa.binary())}
    )
    assert d(t).equals(d(t))


def test_lang_id_deterministic_tiebreak():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.text import lang_id

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["the el words", "nothing matches", "的 der the"],
            }
        )
    )
    out = lang_id(ds).to_pandas().sort_values("doc_id")
    # doc1: en=1 ('the'), es=1 ('el') → tie → alphabetical: 'en'? no — 'en' vs 'es': en
    assert list(out["lang_pred"]) == ["en", "und", "de"]


def test_embedding_dup_pairs_exact_vs_lsh():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((300, 64))
    rows = [(i, base[i]) for i in range(300)]
    planted = set()
    for src in (0, 1, 2, 3, 4):
        dup_id = 1000 + src
        rows.append((dup_id, base[src] + 0.01 * rng.standard_normal(64)))
        planted.add((src, dup_id))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1].tolist() for r in rows], pa.list_(pa.float64())),
            }
        )
    )
    exact = embedding_dup_pairs(ds, threshold=0.95, method="exact").to_pandas()
    got_exact = set(zip(exact["a"], exact["b"]))
    assert planted <= got_exact  # every planted near-identical pair found
    approx = embedding_dup_pairs(ds, threshold=0.95, method="lsh").to_pandas()
    got_lsh = set(zip(approx["a"], approx["b"]))
    assert got_lsh <= got_exact  # LSH reports no false positives (verified sims)
    assert len(got_lsh & planted) / len(planted) >= 0.8  # high recall on near-identical


def test_simhash_pairs_matches_bruteforce():
    """Distributed SimHash pair generation vs an O(n²) popcount oracle:
    pigeonhole banding guarantees no false negatives at hamming ≤ 3, and
    verification makes precision exact."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.dedup import simhash_pairs, simhash64

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(300)]
    texts = []
    for i in range(120):
        toks = list(rng.choice(words, 30))
        texts.append(" ".join(toks))
        near = toks.copy()
        near[rng.integers(0, 30)] = "zzz"  # 1-token edit → tiny hamming
        texts.append(" ".join(near))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = rd.from_pandas(df)

    got = simhash_pairs(ds, max_hamming=3).to_pandas()
    got_set = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}

    sigs = simhash64(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    sh = sigs["simhash"].to_numpy().astype(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    ai, bi = np.triu_indices(len(sh), k=1)
    x = sh[ai] ^ sh[bi]
    ham = (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(-1, 64)
        .sum(axis=1)
    )
    want = {
        (int(ids[a]), int(ids[b]))
        for a, b in zip(ai[ham <= 3], bi[ham <= 3])
    }
    assert got_set == want
    assert len(want) > 0  # the planted near-dups produce real pairs


def test_embedding_dedup_auto_routing():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.dedup import _route_embedding_method

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array([[0.1] * 8, [0.2] * 8], pa.list_(pa.float64())),
            }
        )
    )
    assert _route_embedding_method(ds) == "exact"  # tiny vs object store
    assert _route_embedding_method(ds, budget_bytes=1) == "lsh"  # over budget


def test_embedding_lsh_recall_at_scale():
    """sf0.1-scale LSH run: 20k vectors with 1k planted near-identical
    pairs; multi-table LSH must reach recall ≥ 0.95 vs the exact method
    (VERDICT round-1 item 2), with precision 1.0 (verified sims)."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(3)
    n_base, d = 20_000, 64
    base = rng.standard_normal((n_base, d))
    dup_src = rng.choice(n_base, 1000, replace=False)
    dups = base[dup_src] + 0.02 * rng.standard_normal((1000, d))
    mat = np.vstack([base, dups])
    ids = np.arange(len(mat), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )
    )
    exact = embedding_dup_pairs(ds, threshold=0.95, method="exact").to_pandas()
    e = set(zip(exact["a"], exact["b"]))
    assert len(e) >= 1000  # every planted pair has cos ≈ 0.9996
    lsh = embedding_dup_pairs(ds, threshold=0.95, method="lsh").to_pandas()
    l = set(zip(lsh["a"], lsh["b"]))
    assert l <= e  # precision 1.0
    assert len(l & e) / len(e) >= 0.95  # multi-table recall bar


def test_ivf_topk_recall_on_planted():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.ann import cosine_topk, ivf_topk

    rng = np.random.default_rng(13)
    base = rng.standard_normal((300, 64))
    rows = [(i, base[i]) for i in range(300)]
    planted: dict[int, set[int]] = {0: set(), 1: set(), 2: set()}
    for qid in (0, 1, 2):
        for _ in range(5):
            dup_id = 1000 + len(rows)
            rows.append((dup_id, base[qid] + 0.05 * rng.standard_normal(64)))
            planted[qid].add(dup_id)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1].tolist() for r in rows], pa.list_(pa.float64())),
            }
        )
    )
    exact = cosine_topk(ds, query_ids=[0, 1, 2], k=5).to_pandas()
    approx = ivf_topk(ds, query_ids=[0, 1, 2], k=5, nlist=8, nprobe=3).to_pandas()
    e_hits = a_hits = 0
    for qid in (0, 1, 2):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        e_hits += len(e & planted[qid])
        a_hits += len(a & planted[qid])
    assert e_hits == 15
    # near-identical vectors share the query's centroid list: high recall
    assert a_hits / 15 >= 0.8


def test_resize_and_frame_sample_plumbing():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.multimodal import attach_payload, frame_sample, resize

    ds = attach_payload(
        rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["x" * 4000, "short"]}))
    )
    r = resize(ds, width=64, height=64).to_pandas()
    assert (r["width"] == 64).all() and (r["height"] == 64).all()
    assert r["payload"].map(len).nunique() == 1  # all resized to target size
    f = frame_sample(ds, frame_bytes=256, stride=2).to_pandas()
    # 4000-byte doc → 15 chunks → frames at idx 0,2,...,14; short doc → 1
    assert len(f[f["doc_id"] == 1]) == 8
    assert len(f[f["doc_id"] == 2]) == 1
    assert (f[f["doc_id"] == 1]["frame_idx"].to_numpy() == np.arange(0, 15, 2)).all()


def test_embed_stage_batched_inference_and_dedup_composition():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.dedup import embedding_dup_pairs
    from jsonschema_ray.stages.model import embed_texts

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["alpha beta gamma", "totally different words here",
                         "alpha beta gamma", "alpha beta gamma delta"],
            }
        )
    )
    emb = embed_texts(ds).map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"
    )
    df = emb.to_pandas().sort_values("vec_id")
    assert df["embedding"].iloc[0] == pytest.approx(df["embedding"].iloc[2])  # determinism
    pairs = embedding_dup_pairs(emb, threshold=0.999, method="exact").to_pandas()
    assert (1, 3) in set(zip(pairs["a"], pairs["b"]))  # identical texts → sim 1 pair


def test_hot_shingle_cap_prunes_degenerate_shingle():
    """Skew guard: a shingle shared by many docs explodes quadratically;
    hot_shingle_cap drops it while pairs from rare shingles survive."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.dedup import jaccard_pairs_exact

    hot = "common words everywhere"
    docs = [f"{hot} unique{i} tail{i} extra{i}" for i in range(20)]
    docs += ["rare pair text one shared", "rare pair text one shared"]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    )
    uncapped = jaccard_pairs_exact(ds, threshold=0.05).to_pandas()
    capped = jaccard_pairs_exact(ds, threshold=0.05, hot_shingle_cap=5).to_pandas()
    # uncapped: the 20 hot docs all pair through the shared shingle
    assert len(uncapped) > len(capped)
    # the identical rare pair survives the cap (its shingles are rare)
    assert (20, 21) in set(zip(capped["a"], capped["b"]))
    # and no capped pair involves ONLY the hot shingle: every surviving
    # hot-doc pair must have been dropped
    hot_pairs = {(a, b) for a, b in zip(capped["a"], capped["b"]) if a < 20 and b < 20}
    assert not hot_pairs
