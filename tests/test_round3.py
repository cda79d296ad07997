"""Round-3 regressions: ADVICE fixes (bloom dtype widths, hot-bucket chain
mode, LSH false-positive guard, curate auto-routing, CLI --out hygiene)."""

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


def test_bloom_semi_join_mixed_int_widths():
    """int32 left keys vs int64 right keys must not produce Bloom false
    negatives (pd.util.hash_array is width-sensitive for negative ints)."""
    import ray.data as rd

    from jsonschema_ray.stages.joins import bloom_semi_join

    left = pd.DataFrame(
        {"k": np.array([-1, -2, 3, 4, -5], dtype=np.int32), "v": range(5)}
    )
    right = pd.DataFrame({"k": np.array([-1, 3, -5, 99], dtype=np.int64)})
    out = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", left_cols=["v"]
    ).to_pandas()
    assert set(out["k"].astype(int)) == {-1, 3, -5}


def test_minhash_min_band_matches_keeps_near_dups():
    """min_band_matches=2 must keep genuinely similar pairs (they collide
    in many bands) while remaining a subset of the classic candidates."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import minhash_lsh_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [base, base + " x", base + " x y", "completely different words here"],
        }
    )
    strict = minhash_lsh_pairs(
        rd.from_pandas(df), threshold=0.5, verify=False, min_band_matches=2
    ).to_pandas()
    classic = minhash_lsh_pairs(
        rd.from_pandas(df), threshold=0.5, verify=False
    ).to_pandas()
    s = {(int(a), int(b)) for a, b in zip(strict["a"], strict["b"])}
    c = {(int(a), int(b)) for a, b in zip(classic["a"], classic["b"])}
    assert s <= c
    assert {(0, 1), (0, 2), (1, 2)} <= s  # near-identical trio survives


def test_minhash_hot_bucket_chain_keeps_clique_connected():
    """A clique far above hot_bucket_cap must still come out CONNECTED
    (chain edges), so cluster dedup keeps exactly one representative —
    the r2 behavior (cap skipped the bucket entirely) lost the clique."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import minhash_lsh_pairs
    from jsonschema_ray.stages.graph import connected_components

    n = 60
    text = " ".join(f"tok{i}" for i in range(12))
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": text})
    pairs = minhash_lsh_pairs(
        rd.from_pandas(docs), threshold=0.5, verify=False, hot_bucket_cap=10
    )
    comp = connected_components(pairs).to_pandas()
    assert comp["component"].nunique() == 1
    assert len(comp) == n


def test_simhash_hot_bucket_chain_still_verified():
    """Chain-mode simhash pairs stay popcount-verified (hamming ≤ max) and
    keep an over-cap near-identical clique connected."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import simhash_pairs
    from jsonschema_ray.stages.graph import connected_components

    n = 40
    text = " ".join(f"tok{i}" for i in range(30))
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": text})
    out = simhash_pairs(rd.from_pandas(docs), max_hamming=3, hot_bucket_cap=8)
    df = out.to_pandas()
    assert (df["hamming"] <= 3).all()
    comp = connected_components(
        out.map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    ).to_pandas()
    assert comp["component"].nunique() == 1


def test_simhash_pairs_default_is_lossless():
    """Default (no cap) still enumerates every Hamming≤3 pair of a clique
    above the old hardcoded 1000 cap's reach (brute-force check)."""
    import ray.data as rd

    from jsonschema_ray.stages.dedup import simhash_pairs

    n = 25
    text = " ".join(f"tok{i}" for i in range(30))
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": text})
    df = simhash_pairs(rd.from_pandas(docs), max_hamming=3).to_pandas()
    assert len(df) == n * (n - 1) // 2  # identical docs: all pairs, hamming 0
    assert (df["hamming"] == 0).all()


def test_route_pair_method_thresholds():
    from jsonschema_ray.pipelines.curate import route_pair_method

    assert route_pair_method(1000, 990, 3) == "exact"
    assert route_pair_method(1000, 700, 3) == "minhash_fast"  # 30% dups
    assert route_pair_method(10_000_000, 9_999_000, 5000) == "minhash_fast"
    assert route_pair_method(0, 0, 0) == "exact"


def test_curate_auto_routes_and_loses_no_unique_docs():
    """Dup-heavy corpus through curate_corpus() with NO pair_method: the
    auto route must pick the fast path AND keep every unique document
    (the ADVICE failure mode: one FP edge absorbs a cluster and deletes
    its unique docs)."""
    import ray.data as rd

    from jsonschema_ray.pipelines import curate as cur

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    uniques = [
        " ".join(rng.choice(vocab, size=25)) for _ in range(120)
    ]
    dup_text = " ".join(f"dup{i}" for i in range(25))
    texts = uniques + [dup_text] * 80  # 40% exact-dup density
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )

    picked = {}
    orig = cur.route_pair_method

    def spy(n, d, m):
        picked["method"] = orig(n, d, m)
        return picked["method"]

    cur.route_pair_method, _saved = spy, orig
    try:
        out = cur.curate_corpus(rd.from_pandas(df), jaccard_threshold=0.5).to_pandas()
    finally:
        cur.route_pair_method = _saved
    assert picked["method"] == "minhash_fast"
    # every unique doc survives; the dup clique keeps exactly one
    assert set(out["doc_id"]) >= set(range(120))
    assert len(out[out["doc_id"] >= 120]) == 1


def test_cli_curate_refuses_dirty_out(tmp_path):
    from jsonschema_ray.cli import main

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c"]}).to_parquet(
        src / "part.parquet"
    )
    out = tmp_path / "out"
    out.mkdir()
    (out / "stale.parquet").write_bytes(b"junk")
    rc = main(["curate", "--input", str(src), "--out", str(out)])
    assert rc == 2


def test_fused_equals_default_headline():
    """transcript_violations_fused (single input scan, violations ride the
    conv exchange) must produce row-for-row identical output to the
    default two-scan plan."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import (
        transcript_violations,
        transcript_violations_fused,
    )
    from jsonschema_ray.sources.transcripts import transcripts_path

    path = transcripts_path(SF01)
    a = transcript_violations(rd.read_parquet(path)).to_pandas()
    b = transcript_violations_fused(rd.read_parquet(path)).to_pandas()
    cols = list(a.columns)
    aa = a.sort_values(cols).reset_index(drop=True)
    bb = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(aa, bb)


def test_driver_union_find_matches_bruteforce():
    """Vectorized min-label union-find == dict-based union-find on random
    graphs (the r3 rewrite: minimum.reduceat + pointer-jump collapse)."""
    from jsonschema_ray.stages.graph import _driver_union_find

    def brute(edges):
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
        return {n: find(n) for n in parent}

    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(2, 500))
        m = int(rng.integers(1, 1200))
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        df = pd.DataFrame(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )
        t = _driver_union_find(df).to_pandas()
        got = dict(zip(t["node"], t["component"]))
        assert got == brute(list(zip(a.tolist(), b.tolist())))


def test_contamination_scores_matches_bruteforce():
    """Hash-space n-gram containment == string-space brute force on a
    tiny corpus with planted benchmark overlap."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.decontam import contamination_scores

    bench_texts = {
        100: "the quick brown fox jumps over the lazy dog",
        101: "pack my box with five dozen liquor jugs",
    }
    train_texts = {
        1: "intro words then the quick brown fox jumps over a fence",
        2: "pack my box with five dozen liquor jugs exactly verbatim",
        3: "completely unrelated content nothing shared at all here",
        4: "short doc",  # < n tokens: whole-doc shingle, no bench match
    }

    def shingles(text, n=3):
        t = text.split()
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    bench_sh = set().union(*(shingles(s) for s in bench_texts.values()))
    expect = {}
    for d, s in train_texts.items():
        sh = shingles(s)
        hit = len(sh & bench_sh)
        if hit:
            expect[d] = (len(sh), hit)

    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(train_texts),
                "text": list(train_texts.values()),
            }
        )
    )
    bench = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(bench_texts),
                "text": list(bench_texts.values()),
            }
        )
    )
    got = contamination_scores(train, bench, n=3).to_pandas()
    got_map = {
        int(r.doc_id): (int(r.n_ngrams), int(r.n_hit))
        for r in got.itertuples()
    }
    assert got_map == expect
    for r in got.itertuples():
        assert r.containment == pytest.approx(r.n_hit / r.n_ngrams, abs=1e-6)


def test_contamination_threshold_filters():
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.decontam import contamination_scores

    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": [
                    "a b c d e f g h i j",  # low overlap (1/8 shingles)
                    "c q x y z",  # fully contained in the bench doc
                ],
            }
        )
    )
    bench = rd.from_arrow(
        pa.table({"doc_id": [9], "text": ["a b c q x y z"]})
    )
    full = contamination_scores(train, bench, n=3).to_pandas()
    assert set(full.doc_id) == {1, 2}
    hi = contamination_scores(train, bench, n=3, threshold=0.5).to_pandas()
    assert set(hi.doc_id) == {2}


def test_stratified_sample_quota_and_determinism():
    """Exact ceil(frac*n) per group; stable across block layouts; subset
    of the input under the deterministic hash rank."""
    import math

    import ray.data as rd

    from jsonschema_ray.stages.sampling import stratified_sample

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], n, p=[0.7, 0.2, 0.1]),
            "value": rng.normal(size=n),
        }
    )
    counts = df.event_type.value_counts().to_dict()
    frac = 0.07

    out1 = (
        stratified_sample(rd.from_pandas(df), "event_type", frac, "event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out2 = (
        stratified_sample(
            rd.from_pandas(df).repartition(13), "event_type", frac, "event_id"
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = out1.event_type.value_counts().to_dict()
    assert got == {g: math.ceil(frac * c) for g, c in counts.items()}
    pd.testing.assert_frame_equal(out1[sorted(out1.columns)], out2[sorted(out2.columns)])
    # sampled rows are real input rows
    merged = out1.merge(df, on=["event_id", "event_type"], suffixes=("", "_in"))
    assert len(merged) == len(out1)


def test_content_flags_matches_re():
    """pyarrow RE2 counts == Python re counts per doc; flagged is the
    disjunction."""
    import re

    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.text import PII_PATTERNS, content_flags

    texts = [
        "contact me at bob@example.com or visit https://x.test/page",
        "account 1234567 and card 987654321",
        "nothing suspicious here",
        "two mails a@b.io c@d.org and 111222333444",
        "",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    got = content_flags(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for name, pat in PII_PATTERNS.items():
        exp = [len(re.findall(pat, t)) for t in texts]
        assert got[f"n_{name}"].tolist() == exp, name
    exp_flag = [
        any(re.search(p, t) for p in PII_PATTERNS.values()) for t in texts
    ]
    assert got["flagged"].tolist() == exp_flag


def test_repetition_scores_matches_bruteforce():
    """Hash-space repetition counting == string-space brute force,
    including short docs, repeated tokens and empty text."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.text import repetition_scores

    texts = [
        "a a a a b",  # top token 4/5, dup 3-grams: aaa aab abb? -> windows: aaa aaa aab -> dup
        "w x y z w x y z",
        "unique words only here now",
        "t t",  # short: 1 whole-run ngram, dup 0
        "",
        "solo",
    ]
    ids = list(range(len(texts)))

    def brute(s, n=3):
        t = s.split()
        if not t:
            return 0, 0.0, 0.0
        from collections import Counter

        top = max(Counter(t).values()) / len(t)
        if len(t) < n:
            return len(t), top, 0.0
        grams = [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]
        dup = 1.0 - len(set(grams)) / len(grams)
        return len(t), top, dup

    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = (
        repetition_scores(ds, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, s in enumerate(texts):
        nt, top, dup = brute(s)
        assert got.n_tokens[i] == nt, s
        assert got.top_token_frac[i] == pytest.approx(top, abs=1e-6), s
        assert got.dup_ngram_frac[i] == pytest.approx(dup, abs=1e-6), s


def test_temperature_sample_quotas():
    """alpha=0 → uniform quotas capped at group size; alpha=1 →
    proportional; output rows are real input rows."""
    import math

    import ray.data as rd

    from jsonschema_ray.stages.sampling import temperature_sample

    rng = np.random.default_rng(3)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "src": np.repeat(["big", "mid", "rare"], [2500, 450, 50]),
            "v": rng.normal(size=n),
        }
    )
    ds = rd.from_pandas(df).repartition(7)
    counts = {"big": 2500, "mid": 450, "rare": 50}

    out = temperature_sample(ds, "src", 0.0, 0.05, "event_id").to_pandas()
    # alpha=0: every group weighted equally -> quota ceil(0.05*3000/3)=50
    exp = {g: min(c, math.ceil(0.05 * n / 3)) for g, c in counts.items()}
    assert out.src.value_counts().to_dict() == exp

    out1 = temperature_sample(ds, "src", 1.0, 0.05, "event_id").to_pandas()
    wsum = sum(counts.values())
    exp1 = {g: min(c, math.ceil(0.05 * n * c / wsum)) for g, c in counts.items()}
    assert out1.src.value_counts().to_dict() == exp1
    merged = out1.merge(df, on=["event_id", "src"], suffixes=("", "_in"))
    assert len(merged) == len(out1)


def test_pack_sequences_matches_bruteforce():
    """Vectorized rank-major packing == per-partition sequential next-fit;
    stable across block layouts; bins respect the budget except
    single-oversize docs."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(5)
    n = 700
    ids = np.sort(rng.choice(5000, n, replace=False)).astype(np.int64)
    texts = [" ".join("w" for _ in range(int(rng.integers(0, 40)))) for _ in ids]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})).repartition(9)
    budget, psize = 100, 16
    got = (
        pack_sequences(ds, budget=budget, part_size=psize)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    ntok = {int(i): len(t.split()) for i, t in zip(ids, texts)}
    exp_bins = {}
    parts = {}
    for i in sorted(ntok):
        parts.setdefault(i // psize, []).append(i)
    for p, docs in parts.items():
        fill, cur = None, 0
        for d in docs:
            nt = ntok[d]
            if fill is None:
                fill, cur = nt, 0
            elif fill + nt > budget:
                cur += 1
                fill = nt
            else:
                fill += nt
            exp_bins[d] = (p, cur)

    assert len(got) == n
    for r in got.itertuples():
        assert (r.part, r.bin_idx) == exp_bins[int(r.doc_id)]
        assert r.n_tokens == ntok[int(r.doc_id)]
    # budget respected: per (part,bin) sums exceed budget only for a
    # single oversize doc
    sums = got.groupby(["part", "bin_idx"]).agg(s=("n_tokens", "sum"), c=("n_tokens", "size"))
    bad = sums[(sums.s > budget) & (sums.c > 1)]
    assert bad.empty


def test_remote_file_path_validation_matches_go_fsvalidpath():
    """Remote file-scheme path gate mirrors Go io/fs.ValidPath
    (reference resolver.go:87): '..' traversals and rooted/degenerate
    paths are rejected unless allow_relative is set."""
    from jsonschema_ray.core.resolver import Remote, ResolveError

    r = Remote()
    for bad in ("/etc/hosts", "../secret.json", "a/../b.json", "a//b", "a/", ""):
        with pytest.raises(ResolveError, match="relative paths"):
            r.resolve(f"file://{bad}" if bad.startswith("/") else bad)


def test_redact_matches_re_sub():
    """Chained RE2 replacement == Python re.sub chain in pattern order."""
    import re

    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.text import PII_PATTERNS, redact

    texts = [
        "mail bob@example.com then call 1234567",
        "see https://x.test/a?b=1 and c@d.org",
        "clean text stays clean",
        "",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    got = redact(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(texts):
        exp = s
        for pat in PII_PATTERNS.values():
            exp = re.sub(pat, "[PII]", exp)
        assert got.text[i] == exp, s


def test_contamination_single_scan_equals_two_dataset():
    """side_col single-scan mode == two-dataset mode on the same split."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.decontam import contamination_scores

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(80)]
    ids = np.arange(80, dtype=np.int64)
    bench_mask = ids % 7 == 0

    t = pa.table({"doc_id": ids, "text": texts})
    two = contamination_scores(
        rd.from_arrow(t.filter(pa.array(~bench_mask))),
        rd.from_arrow(t.filter(pa.array(bench_mask))),
        n=3,
    ).to_pandas()
    one = contamination_scores(
        rd.from_arrow(t.append_column("side", pa.array(bench_mask.astype(np.int8)))),
        n=3,
        side_col="side",
    ).to_pandas()
    cols = ["doc_id", "n_ngrams", "n_hit", "containment"]
    pd.testing.assert_frame_equal(
        two[cols].sort_values("doc_id").reset_index(drop=True),
        one[cols].sort_values("doc_id").reset_index(drop=True),
    )

    with pytest.raises(ValueError):
        contamination_scores(rd.from_arrow(t))


def test_components_contraction_and_distributed_loop_agree():
    """Per-block spanning-forest contraction + the distributed label loop
    (forced via driver_threshold=1) == driver union-find on random
    graphs."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.graph import (
        _driver_union_find,
        connected_components,
    )

    rng = np.random.default_rng(23)
    n, m = 400, 700
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    ds = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(5)

    want = (
        _driver_union_find(
            pd.DataFrame(
                {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
            )
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = (
        connected_components(ds, driver_threshold=1)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_tfidf_top_terms_matches_bruteforce():
    """Distributed 3-exchange TF-IDF == Python Counter brute force,
    including rounded-score rank ties broken by term."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.tfidf import tfidf_top_terms

    texts = [
        "apple banana apple cherry",
        "banana cherry cherry date",
        "apple apple apple egg",
        "fig",
        "",
    ]
    n_docs = len(texts)
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(n_docs)), "text": texts})
    ).repartition(3)

    tfs = {i: Counter(t.split()) for i, t in enumerate(texts)}
    dfs = Counter(w for c in tfs.values() for w in c)
    expect = {}
    for i, c in tfs.items():
        scored = sorted(
            (
                (round(tf * math.log(n_docs / dfs[w]), 6), w, tf, dfs[w])
                for w, tf in c.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        if scored:
            expect[i] = [(w, tf, df, s) for s, w, tf, df in scored]

    got = tfidf_top_terms(ds, k=2, n_docs=n_docs).to_pandas()
    got_map = {}
    for r in got.sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True]).itertuples():
        got_map.setdefault(int(r.doc_id), []).append(
            (r.term, int(r.tf), int(r.df), float(r.tfidf))
        )
    assert got_map == expect


def test_psi_stat_matches_formula():
    """PSI == hand formula with the 0.5-count floor; identical
    distributions score ~0; a major shift crosses 0.25."""
    import math

    from jsonschema_ray.stages.drift import _psi_stat

    base = {"a": 800, "b": 150, "c": 50}
    same = {"a": 1600, "b": 300, "c": 100}
    assert _psi_stat(base, same) == pytest.approx(0.0, abs=1e-12)

    obs = {"a": 200, "b": 700, "d": 100}
    nb, no = 1000, 1000
    want = 0.0
    for k in {"a", "b", "c", "d"}:
        pb = max(base.get(k, 0), 0.5) / nb
        po = max(obs.get(k, 0), 0.5) / no
        want += (po - pb) * math.log(po / pb)
    assert _psi_stat(base, obs) == pytest.approx(want, rel=1e-12)
    assert _psi_stat(base, obs) > 0.25
    assert _psi_stat({}, obs) == 0.0


def test_cli_decontaminate(tmp_path):
    from jsonschema_ray.cli import main

    tr = tmp_path / "train"
    be = tmp_path / "bench"
    tr.mkdir()
    be.mkdir()
    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b c d e", "x y z w v"]}
    ).to_parquet(tr / "p.parquet")
    pd.DataFrame({"doc_id": [9], "text": ["a b c q r"]}).to_parquet(
        be / "p.parquet"
    )
    out = tmp_path / "scores"
    rc = main(
        ["decontaminate", "--train", str(tr), "--bench", str(be), "--out", str(out)]
    )
    assert rc == 0
    got = pd.read_parquet(out)
    assert got.doc_id.tolist() == [1] and got.n_hit.tolist() == [1]
    # dirty --out refused
    rc = main(
        ["decontaminate", "--train", str(tr), "--bench", str(be), "--out", str(out)]
    )
    assert rc == 2


def test_tokenizer_hypothesis_differential():
    """Byte-buffer tokenizer == Python regex reference on arbitrary
    unicode, including null rows, empty strings, sliced arrays (nonzero
    Arrow offsets) and large_string columns."""
    import re

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jsonschema_ray.stages.tokhash import batch_token_hashes, hash_words

    tok_re = re.compile(r"[^\t\n\f\r ]+")

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), max_codepoint=0x2FFF
                    ),
                    max_size=30,
                ),
            ),
            min_size=1,
            max_size=12,
        ),
        st.integers(min_value=0, max_value=3),
        st.booleans(),
    )
    def check(texts, offset, large):
        offset = min(offset, len(texts) - 1)
        typ = pa.large_string() if large else pa.string()
        arr = pa.array(texts, typ)[offset:]
        th, sg, ntok = batch_token_hashes(arr)
        want_tokens = [tok_re.findall(t or "") for t in texts[offset:]]
        assert ntok.tolist() == [len(ts) for ts in want_tokens]
        flat = [w for ts in want_tokens for w in ts]
        assert sg.tolist() == [
            i for i, ts in enumerate(want_tokens) for _ in ts
        ]
        if flat:
            assert th.tolist() == hash_words(flat).tolist()

    check()


def test_fused1_single_exchange_equals_default_and_is_sorted():
    """The single-exchange plan (order-preserving range buckets, no final
    sort) must produce the same violation MULTISET as the two-scan plan
    AND already be globally ordered by (conv_id, turn_idx, keyword)."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import (
        transcript_violations,
        transcript_violations_fused1,
    )
    from jsonschema_ray.sources.transcripts import transcripts_path

    path = transcripts_path(SF01)
    one = transcript_violations_fused1(rd.read_parquet(path))
    assert one is not None, "footer stats should be available for parquet"
    got = one.to_pandas()

    # globally ordered as produced (no sort applied)
    keys = list(
        zip(
            got.conv_id.fillna("￿"),
            got.turn_idx.fillna(1 << 30),
            got.keyword.fillna("￿"),
        )
    )
    assert keys == sorted(keys)

    want = transcript_violations(
        rd.read_parquet(path), fused=False
    ).to_pandas()
    cols = list(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_conv_range_bucketer_monotone_and_unicode(tmp_path):
    """Bucket assignment is monotone in conv_id (byte order), handles
    unicode ids and nulls, and balances across the footer-stat sample."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.pipelines.validate_pipeline import _conv_range_bucketer

    ids = sorted(
        [f"conv-{i:08d}" for i in range(0, 900, 7)]
        + ["conv-üü" + str(i) for i in range(5)]
    )
    for k in range(4):
        chunk = ids[k * len(ids) // 4 : (k + 1) * len(ids) // 4]
        pq.write_table(
            pa.table({"conv_id": chunk, "x": list(range(len(chunk)))}),
            tmp_path / f"p{k}.parquet",
        )
    ds = rd.read_parquet(str(tmp_path))
    fn = _conv_range_bucketer(ds, 8)
    assert fn is not None
    arr = np.array(ids + [None], dtype=object)
    b = fn(arr)
    vals = b[:-1]
    # monotone w.r.t. sorted ids; null strictly last
    assert (np.diff(vals) >= 0).all()
    assert b[-1] >= vals.max()
    assert len(np.unique(vals)) >= 4  # balanced enough to parallelize


def test_bm25_matches_bruteforce():
    """Distributed BM25 == Python brute force (per-term idf, length
    normalization, rounded-score ranking with doc_id tie-break)."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.stages.tfidf import bm25_topk

    texts = [
        "hash join hash join build probe",
        "join only once here",
        "hash hash hash hash hash",
        "nothing relevant at all",
        "dup hash",
        "",
    ]
    n = len(texts)
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(n)), "text": texts})
    ).repartition(3)
    query, k1, b = "hash dup", 1.2, 0.75

    toks = [t.split() for t in texts]
    avgdl = sum(len(t) for t in toks) / n
    tfs = [Counter(t) for t in toks]
    dfs = Counter(w for c in tfs for w in set(query.split()) if c[w] > 0)
    expect = []
    for i, c in enumerate(tfs):
        s, hits = 0.0, 0
        for w in set(query.split()):
            if c[w] == 0:
                continue
            hits += 1
            idf = math.log(1 + (n - dfs[w] + 0.5) / (dfs[w] + 0.5))
            s += idf * c[w] * (k1 + 1) / (c[w] + k1 * (1 - b + b * len(toks[i]) / avgdl))
        if hits:
            expect.append((round(s, 6), i, hits))
    expect.sort(key=lambda x: (-x[0], x[1]))

    got = bm25_topk(ds, query, k=4).to_pandas()
    got_rows = [
        (float(r.score), int(r.doc_id), int(r.n_hit_terms)) for r in got.itertuples()
    ]
    want_rows = [(s, i, h) for s, i, h in expect[:4]]
    assert got_rows == [(pytest.approx(s, abs=1e-6), i, h) for s, i, h in want_rows] or [
        (s, i, h) for s, i, h in got_rows
    ] == want_rows
