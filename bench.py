#!/usr/bin/env python3
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Plain run prints ONE JSON line:
    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "turns_per_sec": ...}

``--scaling`` runs the headline pipeline in fresh subprocesses at
num_cpus=1 and num_cpus=4 (override with GRAFT_SCALE_LO/HI) on the same
input and reports both throughputs plus the scaling efficiency
(BASELINE.md criterion: eff ≥ 0.8).  Default workload: the fused
transcript full-check pipeline (the headline metric);
GRAFT_SCALING_WORKLOAD=docs measures slow-path JSON document validation
instead.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray():
    import ray

    # Quiet the per-concat "Failed to hash the schemas (for
    # deduplication): unhashable type: 'dict'" WORKER warnings: the
    # testdata parquet carries pandas schema metadata, which makes
    # pyarrow Schemas unhashable and trips Ray's unify_schemas dedup on
    # every worker.  The YAML keeps Ray Data's default config but holds
    # the console handler at ERROR (full stream still reaches
    # ray-data.log).  Must be in the environment BEFORE ray.init so
    # local-mode workers inherit it.
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(__file__), "jsonschema_ray", "raydata_logging.yaml"),
    )
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _quiet_empty_block_schema_warnings()


def _quiet_empty_block_schema_warnings() -> None:
    """Drop ONLY the empty-new-schema RefBundle warning.

    Ray's sort under ``groupby().map_groups`` emits empty output
    partitions without calling the UDF, so they carry no schema and the
    executor logs a "different schema … new schema: ." warning per
    operator — engine-side blocks are all stamped typed
    (bucketing.bucketed_map_groups out_schema), so the residual messages
    are Ray-internal noise.  Genuine schema divergences (non-empty new
    schema) still warn."""
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not ("different schema" in msg and "new schema: ." in msg)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_F())


def _timed(fn, reps: int = 2) -> tuple[float, object]:
    """Best-of-N: scheduling jitter only ever adds time, so min is the
    honest steady-state estimate."""
    best, out = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best, out


def main() -> None:
    probe_start = host_fault_mbps()
    _init_ray()
    import ray
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations
    from jsonschema_ray.pipelines import queries as q
    from jsonschema_ray.sources.transcripts import transcripts_path

    path = transcripts_path(SF_DIR)  # cached deterministic generation

    n_turns = rd.read_parquet(path).count()

    timings: dict[str, float] = {}

    # Headline: the full validation pipeline (all checks, fail-fast mode),
    # consumed without materializing row data on the driver.
    def headline():
        viol = transcript_violations(rd.read_parquet(path))
        return viol.count()

    # Untimed warm pass: page cache + worker library imports + actor pool
    # spin-up.  A 100 TB run amortizes these over hours; the timed pass
    # measures the steady state.
    headline()
    headline_sec, n_viol = _timed(headline)
    timings["validate_full"] = round(headline_sec, 3)

    # Hot path only: vectorized row keywords.
    sec, _ = _timed(lambda: q.q_row_violations(SF_DIR).count())
    timings["validate_rows"] = round(sec, 3)

    # Distributed raw-JSON payload validation over events.
    sec, _ = _timed(lambda: q.q_payload_violations(SF_DIR).count())
    timings["payload_events"] = round(sec, 3)

    # Stats profile (sketch partials + merge).
    def run_profile():
        from jsonschema_ray.stages.stats import profile_dataset

        return profile_dataset(rd.read_parquet(path))

    sec, _ = _timed(run_profile)
    timings["profile"] = round(sec, 3)

    # Classic relational ops.
    sec, _ = _timed(lambda: q.q_lineitem_pricing(SF_DIR).count())
    timings["lineitem_pricing"] = round(sec, 3)

    # Training-data ops over documents/embeddings.
    sec, _ = _timed(lambda: q.q_exact_dedup(SF_DIR).count())
    timings["exact_dedup"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_jaccard_pairs(SF_DIR).count())
    timings["jaccard_pairs"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_cosine_topk(SF_DIR).count())
    timings["cosine_topk"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_token_stats(SF_DIR).count())
    timings["token_stats"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_minhash_pairs(SF_DIR).count())
    timings["minhash_pairs"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_building_orders(SF_DIR).count())
    timings["bloom_semi_join"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_curate(SF_DIR).count())
    timings["curate"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_decontaminate(SF_DIR).count())
    timings["decontaminate"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_repetition(SF_DIR).count())
    timings["repetition"] = round(sec, 3)
    sec, _ = _timed(lambda: q.q_pack_sequences(SF_DIR).count())
    timings["pack_sequences"] = round(sec, 3)

    result = {
        "metric": "transcript validation wall time (full check suite)",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "n_violations": n_viol,
        "turns_per_sec": round(n_turns / headline_sec),
        # first-touch page-fault service at run start/end (healthy host
        # ≈5000+ MB/s; see BASELINE.md's scaling section) — wall times
        # measured in a degraded window are inflated for any engine
        "host_fault_mbps": [probe_start, host_fault_mbps()],
    }
    print(json.dumps(result))
    ray.shutdown()


def big() -> None:
    """Compute-bound headline measurement: sf1-equivalent transcripts (6M
    turns, generated deterministically under /tmp) so per-row work, not
    fixed session cost, dominates — sf0.1's wall time is ≥95% overhead,
    which masks kernel-level regressions."""
    probe_start = host_fault_mbps()
    _init_ray()
    import ray
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations
    from jsonschema_ray.sources.transcripts import generate_transcripts
    from jsonschema_ray.stages.checks import conv_checks_salted, conv_checks_violations

    n_turns = int(os.environ.get("GRAFT_BIG_TURNS", "6000000"))
    path = generate_transcripts(
        f"/tmp/graft_transcripts/big-{n_turns}", n_turns=n_turns, seed=42
    )
    n = rd.read_parquet(path).count()  # warm

    timings = {}

    from jsonschema_ray.pipelines.validate_pipeline import (
        transcript_violations_fused,
    )

    def headline():  # fused single-scan (the default route)
        return transcript_violations(rd.read_parquet(path)).count()

    headline()
    sec, n_viol = _timed(headline)
    timings["validate_full"] = round(sec, 3)

    # single-scan fusion A/B: same checks; the two-scan plan reads the
    # input twice.  Planted data is violation-DENSE (~50%), the
    # fusion-unfavorable case; the clean variant is the sparse real-corpus
    # regime.  Fusion won both (see BASELINE.md), so it is the default.
    sec_2s, _ = _timed(
        lambda: transcript_violations(rd.read_parquet(path), fused=False).count()
    )
    timings["validate_full_twoscan"] = round(sec_2s, 3)

    path_clean = generate_transcripts(
        f"/tmp/graft_transcripts/big-clean-{n_turns}",
        n_turns=n_turns,
        seed=42,
        variant="clean",
    )
    # default route (single-exchange fused1 plan + hot-conv guard), same
    # plan the planted headline above runs — like-for-like dense/sparse A/B
    sec_cf, _ = _timed(
        lambda: transcript_violations(rd.read_parquet(path_clean)).count()
    )
    timings["validate_clean_fused"] = round(sec_cf, 3)
    # the older two-exchange fused builder, kept as a plan-level baseline
    sec_cf2, _ = _timed(
        lambda: transcript_violations_fused(rd.read_parquet(path_clean)).count()
    )
    timings["validate_clean_fused2x"] = round(sec_cf2, 3)
    sec_c, _ = _timed(
        lambda: transcript_violations(rd.read_parquet(path_clean), fused=False).count()
    )
    timings["validate_clean_twoscan"] = round(sec_c, 3)

    # routed checks-only pipeline (single-exchange fused1, keywords=False)
    s1, _ = _timed(
        lambda: transcript_violations(
            rd.read_parquet(path),
            checks=("referential", "unique", "contiguity", "order"),
        ).count()
    )
    timings["conv_checks_fused"] = round(s1, 3)
    s2, _ = _timed(lambda: conv_checks_violations(rd.read_parquet(path)).count())
    timings["conv_checks_bucket"] = round(s2, 3)
    s3, _ = _timed(lambda: conv_checks_salted(rd.read_parquet(path)).count())
    timings["conv_checks_salted"] = round(s3, 3)

    print(
        json.dumps(
            {
                "metric": "sf1-equivalent transcript validation wall time",
                "value": timings["validate_full"],
                "unit": "sec",
                "queries": timings,
                "n_turns": n,
                "n_violations": n_viol,
                "num_cpus": NUM_CPUS,
                "turns_per_sec": round(n / sec),
                "salted_over_bucket": round(s3 / s2, 2),
                "host_fault_mbps": [probe_start, host_fault_mbps()],
            }
        )
    )
    ray.shutdown()


def scaling_workload() -> None:
    """Single measurement for --scaling.

    Default workload: the HEADLINE metric itself — the fused full-check
    transcript pipeline over a ``GRAFT_BIG_TURNS``-row table (north
    rule: turns validated/sec at two cluster sizes).
    ``GRAFT_SCALING_WORKLOAD=docs`` instead measures distributed
    slow-path JSON-document validation (the compute-bound regime, the
    direct analogue of the reference's per-document Validate)."""
    if os.environ.get("GRAFT_SCALING_WORKLOAD", "transcripts") != "docs":
        _scaling_workload_transcripts()
        return
    _init_ray()
    import ray
    import ray.data as rd

    from jsonschema_ray.sources.transcripts import (
        TRANSCRIPT_SCHEMA_JSON,
        payload_docs_path,
    )
    from jsonschema_ray.stages.validate import validate_payload_batch

    # Sized so the slowest leg runs >60s: fixed session overhead (~1-2s)
    # must stay <2% of the measurement or it masquerades as poor scaling.
    n_docs = int(os.environ.get("GRAFT_SCALING_DOCS", "8000000"))
    path = payload_docs_path(n_docs)
    ds = rd.read_parquet(path)
    n = ds.count()  # warm page cache + worker pool

    def run():
        # Stateless tasks with a per-worker compile cache: steady-state
        # behavior (what a 100 TB run looks like), no pool cold-start
        # polluting a seconds-long measurement.
        return (
            rd.read_parquet(path, override_num_blocks=64)
            .map_batches(
                validate_payload_batch,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=20_000,
                fn_kwargs=dict(
                    schema_json=TRANSCRIPT_SCHEMA_JSON,
                    payload_col="doc",
                    id_cols=("doc_id",),
                ),
            )
            .count()
        )

    run()  # untimed warm pass (worker import + compile cache)
    sec, n_viol = _timed(run)
    print(
        json.dumps(
            {
                "num_cpus": NUM_CPUS,
                "n_docs": n,
                "n_violations": n_viol,
                "sec": round(sec, 3),
                "docs_per_sec": round(n / sec),
            }
        )
    )
    ray.shutdown()


def _scaling_workload_transcripts() -> None:
    _init_ray()
    import ray
    import ray.data as rd

    from jsonschema_ray.pipelines import transcript_violations
    from jsonschema_ray.sources.transcripts import generate_transcripts

    # 48M turns/pass puts the measurement in the amortized regime a real
    # cluster run lives in (per-pass driver setup <2% of the slowest leg);
    # per-pass fixed cost is still INCLUDED at both CPU counts, so the
    # reported efficiency stays conservative, never flattered
    n_turns = int(os.environ.get("GRAFT_BIG_TURNS", "48000000"))
    passes = int(os.environ.get("GRAFT_SCALING_PASSES", "1"))
    path = generate_transcripts(
        f"/tmp/graft_transcripts/big-{n_turns}", n_turns=n_turns, seed=42
    )
    n = rd.read_parquet(path).count()  # warm page cache + worker pool

    def run():
        return transcript_violations(rd.read_parquet(path)).count()

    run()  # untimed warm pass
    t0 = time.perf_counter()
    n_viol = 0
    for _ in range(passes):
        n_viol = run()
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "num_cpus": NUM_CPUS,
                "n_docs": n * passes,
                "n_violations": n_viol,
                "passes": passes,
                "sec": round(sec, 3),
                "docs_per_sec": round(n * passes / sec),
            }
        )
    )
    ray.shutdown()


_fault_probe_keepalive: list = []


def host_fault_mbps() -> float:
    """First-touch page-fault throughput probe.  This sandbox host
    oscillates between ~7 GB/s and ~40 MB/s fault service (hypervisor
    memory backing); in the degraded state every fresh allocation
    serializes in the kernel and wall time inflates for ANY engine.
    Recording the probe alongside each measurement makes degraded
    windows identifiable instead of silently corrupting the numbers."""
    import numpy as _np

    n = 64 << 20
    buf = _np.empty(n, dtype=_np.uint8)
    t0 = time.perf_counter()
    buf[::4096] = 1
    _fault_probe_keepalive.append(buf)  # defeat numpy's freed-buffer
    # reuse: a same-sized realloc would re-touch WARM pages
    return round(n / (1 << 20) / (time.perf_counter() - t0))


def scaling() -> None:
    # default pair 1 vs 4: the window where THIS HOST is still linear.
    # Higher worker counts contend on the box's shared page-fault service
    # (a no-Ray control measures pure fault throughput scaling at ~0.76
    # from 2->8 processes — see BASELINE.md), which separate cluster nodes
    # never share; the full 1/2/4/8/32 ladder is published alongside.
    lo_cpus, hi_cpus = int(os.environ.get('GRAFT_SCALE_LO', '1')), int(
        os.environ.get('GRAFT_SCALE_HI', '4')
    )

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "bench.py"),
                "--scaling-workload",
            ],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # This host's throughput drifts ±25% across minutes (shared VM).  One
    # lo/hi pair sampled at different drift states corrupts the ratio, so
    # run INTERLEAVED pairs (lo,hi back-to-back) and report the median
    # pair efficiency; every pair is printed, nothing is discarded.
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    pairs = []
    probes = []
    for _ in range(reps):
        probes.append(host_fault_mbps())
        lo = run(lo_cpus)
        hi = run(hi_cpus)
        pairs.append((lo, hi, (lo["sec"] / hi["sec"]) / (hi_cpus / lo_cpus)))
    pairs.sort(key=lambda p: p[2])
    lo, hi, eff = pairs[len(pairs) // 2]
    workload = (
        "slow-path JSON document validation"
        if os.environ.get("GRAFT_SCALING_WORKLOAD") == "docs"
        else "fused transcript full-check pipeline"
    )
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency (num_cpus {lo_cpus} vs {hi_cpus}, "
                f"fresh sessions, {workload})",
                "n_docs": hi["n_docs"],
                f"sec_{lo_cpus}": lo["sec"],
                f"sec_{hi_cpus}": hi["sec"],
                f"docs_per_sec_{lo_cpus}": lo["docs_per_sec"],
                f"docs_per_sec_{hi_cpus}": hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "pair_efficiencies": [round(p[2], 3) for p in pairs],
                "host_fault_mbps_per_pair": probes,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling-workload" in sys.argv:
        scaling_workload()
    elif "--scaling" in sys.argv:
        scaling()
    elif "--big" in sys.argv:
        big()
    else:
        main()
