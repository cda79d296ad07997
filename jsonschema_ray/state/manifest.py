"""Resumable partitioned execution with per-partition lineage manifests.

The north rule requires the pipeline to be *resumable from checkpoint with
per-partition lineage + metrics*.  Layout:

    out_dir/
      shards/shard=00000/  part-*.parquet   (violations for that input shard)
                           MANIFEST.json    (inputs, verdict, metrics, lineage)
      global/              part-*.parquet   (cross-shard checks: uniqueness,
                           MANIFEST.json     contiguity, ts order)
      PROFILE.json         (merged column stats)

* A shard = a fixed slice of the sorted input file list, so shard membership
  is deterministic across runs (the lineage key).
* Shard outputs are written to a temp dir and renamed — a manifest only
  exists if its data is complete.  A rerun skips every shard whose manifest
  matches its input fingerprint, then re-runs only the rest.  Per-shard
  checks (row keywords + referential) partition perfectly; the global
  phase (hash-shuffle uniqueness, per-conversation ordering) reruns as a
  unit because its inputs are all shards by definition.
* At 100 TB the driver loop would dispatch several shards concurrently;
  each shard is itself a fully parallel Ray pipeline, so a single in-flight
  shard already saturates a node — the loop adds resumability, not
  parallelism.
"""

from __future__ import annotations

import json
import os
import shutil
import time

__all__ = ["run_resumable", "atomic_json"]

ENGINE_VERSION = 1


def atomic_json(path: str, obj: dict) -> None:
    """Write a manifest JSON atomically (tmp + rename): the file exists
    only when its contents are complete — the invariant every resumable
    layout here relies on."""
    with open(path + ".tmp", "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(path + ".tmp", path)


def _fingerprint(files: list[str]) -> str:
    import hashlib

    h = hashlib.md5()
    for f in files:
        st = os.stat(f)
        h.update(f"{f}|{st.st_size}|{int(st.st_mtime)}".encode())
    return h.hexdigest()


def _write_atomic(ds, final_dir: str) -> int:
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)  # a zero-violation dataset writes no files at all
    ds.write_parquet(tmp)
    n = 0
    import pyarrow.parquet as pq

    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            n += pq.read_metadata(os.path.join(tmp, f)).num_rows
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp, final_dir)
    return n


def run_resumable(
    input_path: str,
    out_dir: str,
    shard_size: int = 8,
    schema_json: str | None = None,
    mode: str = "first",
) -> dict:
    """Validate ``input_path`` (dir of parquet) into ``out_dir`` resumably.

    Returns a summary dict: shards run/skipped, violation counts, profile.
    """
    import glob as _glob

    import ray.data as rd

    from ..pipelines.validate_pipeline import transcript_violations
    from ..sources.transcripts import TRANSCRIPT_SCHEMA_JSON
    from ..stages.stats import profile_dataset

    schema_json = schema_json or TRANSCRIPT_SCHEMA_JSON
    files = sorted(_glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    shards = [files[i : i + shard_size] for i in range(0, len(files), shard_size)]

    # the run CONFIG is part of a shard's lineage: a rerun with a
    # different --schema or --mode must recompute, not reuse the previous
    # config's results (old manifests lack the key → mismatch → rerun)
    import hashlib as _hashlib

    cfg = _hashlib.sha256(f"{mode}\x00{schema_json}".encode()).hexdigest()[:16]

    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
    summary = {"shards_total": len(shards), "shards_skipped": 0, "shards_run": 0}

    for si, shard_files in enumerate(shards):
        sdir = os.path.join(out_dir, "shards", f"shard={si:05d}")
        man_path = os.path.join(sdir, "MANIFEST.json")
        fp = _fingerprint(shard_files)
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if (
                man.get("fingerprint") == fp
                and man.get("engine_version") == ENGINE_VERSION
                and man.get("config") == cfg
            ):
                summary["shards_skipped"] += 1
                continue
        t0 = time.time()
        ds = rd.read_parquet(shard_files)
        n_rows = ds.count()
        viol = transcript_violations(
            ds, schema_json=schema_json, checks=("rows", "referential"), mode=mode
        )
        n_viol = _write_atomic(viol, sdir)
        man = {
            "shard": si,
            "input_files": shard_files,
            "fingerprint": fp,
            "config": cfg,
            "engine_version": ENGINE_VERSION,
            "n_rows": n_rows,
            "n_violations": n_viol,
            "verdict": "pass" if n_viol == 0 else "fail",
            "wall_seconds": round(time.time() - t0, 3),
            "checks": ["rows", "referential"],
        }
        with open(man_path + ".tmp", "w") as f:
            json.dump(man, f, indent=1)
        os.replace(man_path + ".tmp", man_path)
        summary["shards_run"] += 1

    # Prune shard dirs beyond the current shard count (a previous run over
    # a larger input leaves orphaned violation parquet that a consumer
    # globbing shards/*/*.parquet would pick up as live results)
    import re as _re

    sroot = os.path.join(out_dir, "shards")
    for d in os.listdir(sroot):
        m_ = _re.fullmatch(r"shard=(\d+)(\.tmp)?", d)
        if m_ and (m_.group(2) or int(m_.group(1)) >= len(shards)):
            shutil.rmtree(os.path.join(sroot, d), ignore_errors=True)

    # Global phase: cross-shard checks + profile.
    gdir = os.path.join(out_dir, "global")
    gman_path = os.path.join(gdir, "MANIFEST.json")
    fp_all = _fingerprint(files)
    rerun_global = True
    if os.path.exists(gman_path):
        with open(gman_path) as f:
            gman = json.load(f)
        rerun_global = not (
            gman.get("fingerprint") == fp_all
            and gman.get("engine_version") == ENGINE_VERSION
            and gman.get("config") == cfg
        )
    if rerun_global:
        t0 = time.time()
        ds = rd.read_parquet(files)
        gviol = transcript_violations(
            ds, schema_json=schema_json, checks=("unique", "contiguity", "order")
        )
        n_gviol = _write_atomic(gviol, gdir)
        profile = profile_dataset(rd.read_parquet(files))
        with open(os.path.join(out_dir, "PROFILE.json"), "w") as f:
            json.dump(profile, f, indent=1, default=str)
        gman = {
            "fingerprint": fp_all,
            "config": cfg,
            "engine_version": ENGINE_VERSION,
            "n_violations": n_gviol,
            "verdict": "pass" if n_gviol == 0 else "fail",
            "wall_seconds": round(time.time() - t0, 3),
            "checks": ["unique", "contiguity", "order"],
        }
        with open(gman_path + ".tmp", "w") as f:
            json.dump(gman, f, indent=1)
        os.replace(gman_path + ".tmp", gman_path)
        summary["global_rerun"] = True
    else:
        summary["global_rerun"] = False

    shard_viols = 0
    verdicts = []
    for si in range(len(shards)):
        with open(os.path.join(out_dir, "shards", f"shard={si:05d}", "MANIFEST.json")) as f:
            m = json.load(f)
        shard_viols += m["n_violations"]
        verdicts.append(m["verdict"])
    with open(gman_path) as f:
        gman = json.load(f)
    summary.update(
        {
            "row_violations": shard_viols,
            "global_violations": gman["n_violations"],
            "verdict": "pass"
            if all(v == "pass" for v in verdicts) and gman["verdict"] == "pass"
            else "fail",
        }
    )
    return summary
