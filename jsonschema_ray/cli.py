"""Job entry point: ``ray job submit -- python -m jsonschema_ray ...``.

Runs the resumable validation pipeline (state/manifest.py) over a parquet
directory and prints a one-line JSON summary.  Owns the Ray session only
when run standalone (``ray job submit`` provides one via RAY_ADDRESS).

Examples:
    python -m jsonschema_ray validate --input /data/transcripts --out /out
    python -m jsonschema_ray validate --input ... --out ... --shard-size 16
    python -m jsonschema_ray profile --input /data/transcripts
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True)
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="jsonschema_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="resumable validation run with manifests")
    v.add_argument("--input", required=True, help="directory of parquet files")
    v.add_argument("--out", required=True, help="output directory (violations + manifests)")
    v.add_argument("--shard-size", type=int, default=8, help="input files per shard")
    v.add_argument("--schema", default=None, help="path to a JSON Schema file (default: transcript schema)")
    v.add_argument("--mode", default="first", choices=["first", "all"])
    v.add_argument(
        "--baseline",
        default=None,
        help="drift baseline JSON (from `profile --save-baseline`): adds "
        "KS/chi-square drift checks against it to the global phase",
    )
    v.add_argument("--num-cpus", type=int, default=None)

    pr = sub.add_parser("profile", help="column stats profile (null/min/max, HLL, t-digest)")
    pr.add_argument("--input", required=True)
    pr.add_argument(
        "--save-baseline",
        default=None,
        help="also write a drift baseline profile JSON to this path",
    )
    pr.add_argument("--num-cpus", type=int, default=None)

    cu = sub.add_parser(
        "curate",
        help="corpus curation: exact dedup → near-dup cluster dedup → "
        "quality gate → optional sample → parquet out",
    )
    cu.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    cu.add_argument("--out", required=True, help="output parquet directory")
    cu.add_argument("--jaccard", type=float, default=0.5)
    cu.add_argument("--min-tokens", type=int, default=1)
    cu.add_argument("--max-stop-ratio", type=float, default=1.0)
    cu.add_argument("--sample-mod", type=int, default=None)
    cu.add_argument("--sample-keep", type=int, default=1)
    cu.add_argument(
        "--pair-method",
        default="auto",
        choices=["auto", "exact", "minhash", "minhash_fast"],
        help="near-dup edge source (auto = route on measured duplicate density)",
    )
    cu.add_argument("--num-cpus", type=int, default=None)

    dc = sub.add_parser(
        "decontaminate",
        help="n-gram containment of training docs vs a benchmark table",
    )
    dc.add_argument("--train", required=True, help="training documents parquet (doc_id, text)")
    dc.add_argument("--bench", required=True, help="benchmark documents parquet (doc_id, text)")
    dc.add_argument("--out", required=True, help="output parquet directory (scores)")
    dc.add_argument("--ngram", type=int, default=3)
    dc.add_argument("--threshold", type=float, default=0.0, help="min containment to report")
    dc.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)
    _ensure_ray(args.num_cpus)
    import ray
    import ray.data as rd

    try:
        if args.cmd == "validate":
            from .state.manifest import run_resumable

            schema_json = None
            if args.schema:
                with open(args.schema) as f:
                    schema_json = f.read()
            else:
                # default transcript schema: refuse inputs that plainly
                # aren't a transcript table instead of emitting a wall of
                # all-NULL "missing required column" rows
                names = set(rd.read_parquet(args.input).schema().names)
                missing = {"conv_id", "turn_idx"} - names
                if missing:
                    print(
                        json.dumps(
                            {
                                "error": "input lacks transcript key columns "
                                f"{sorted(missing)}; pass --schema for a "
                                "custom table",
                                "columns_found": sorted(names),
                            }
                        ),
                        file=sys.stderr,
                    )
                    return 2
            summary = run_resumable(
                args.input,
                args.out,
                shard_size=args.shard_size,
                schema_json=schema_json,
                mode=args.mode,
            )
            if args.baseline:
                from .stages.drift import (
                    DEFAULT_DRIFT_FEATURES,
                    drift_profile,
                    drift_violations,
                    load_baseline,
                )

                # restrict drift features to columns the input actually
                # has (text_len derives from text) — a custom --schema
                # table without role/tool would otherwise KeyError inside
                # a Ray task AFTER the whole validation run completed
                names = set(rd.read_parquet(args.input).schema().names)
                feats = {
                    "categorical": [
                        c
                        for c in DEFAULT_DRIFT_FEATURES["categorical"]
                        if c in names
                    ],
                    "numeric": [
                        c
                        for c in DEFAULT_DRIFT_FEATURES["numeric"]
                        if ("text" in names if c == "text_len" else c in names)
                    ],
                }
                dropped = sorted(
                    (set(DEFAULT_DRIFT_FEATURES["categorical"]) - set(feats["categorical"]))
                    | {
                        c
                        for c in DEFAULT_DRIFT_FEATURES["numeric"]
                        if c not in feats["numeric"]
                    }
                )
                if dropped:
                    # a PARTIAL restriction is itself a signal (a feature
                    # column disappearing is drift) — surface it instead
                    # of silently verifying fewer features than the
                    # baseline holds
                    summary["drift_features_skipped"] = dropped
                if not (feats["categorical"] or feats["numeric"]):
                    summary["drift_skipped"] = (
                        "input has none of the drift feature columns "
                        f"{DEFAULT_DRIFT_FEATURES}"
                    )
                else:
                    baseline = load_baseline(args.baseline)
                    candidate = drift_profile(rd.read_parquet(args.input), feats)
                    dviol = drift_violations(baseline, candidate, features=feats)
                    summary["drift_violations"] = dviol.num_rows
                    summary["drift_messages"] = dviol["message"].to_pylist()
                    if dviol.num_rows > 0:
                        summary["verdict"] = "fail"
            print(json.dumps(summary))
            return 0 if summary.get("verdict") == "pass" else 3
        if args.cmd == "curate":
            import os

            from .pipelines.curate import curate_corpus

            # a rerun into a non-empty --out would mix the previous run's
            # parquet files into the curated corpus and inflate rows_out
            if os.path.isdir(args.out) and os.listdir(args.out):
                print(
                    json.dumps(
                        {
                            "error": f"--out {args.out} is not empty; "
                            "refusing to mix runs (delete it or pick a fresh dir)"
                        }
                    ),
                    file=sys.stderr,
                )
                return 2
            ds = rd.read_parquet(args.input)
            n_in = ds.count()
            out = curate_corpus(
                rd.read_parquet(args.input),
                jaccard_threshold=args.jaccard,
                min_tokens=args.min_tokens,
                max_stop_ratio=args.max_stop_ratio,
                sample_modulus=args.sample_mod,
                sample_keep_below=args.sample_keep,
                pair_method=args.pair_method,
            )
            out.write_parquet(args.out)
            # --out was verified empty above, so this counts exactly this
            # run's output (metadata-only read, no second data pass).  Ray
            # writes NOTHING (not even the directory) for an empty
            # dataset, so guard the re-read — dropping every row is a
            # legitimate outcome, not a crash.
            n_out = (
                rd.read_parquet(args.out).count()
                if os.path.isdir(args.out) and os.listdir(args.out)
                else 0
            )
            print(
                json.dumps(
                    {
                        "rows_in": n_in,
                        "rows_out": n_out,
                        "dropped": n_in - n_out,
                        "out_dir": args.out,
                    }
                )
            )
            return 0
        if args.cmd == "decontaminate":
            import os

            from .stages.decontam import contamination_scores

            if os.path.isdir(args.out) and os.listdir(args.out):
                print(
                    json.dumps(
                        {
                            "error": f"--out {args.out} is not empty; "
                            "refusing to mix runs (delete it or pick a fresh dir)"
                        }
                    ),
                    file=sys.stderr,
                )
                return 2
            scores = contamination_scores(
                rd.read_parquet(args.train),
                rd.read_parquet(args.bench),
                n=args.ngram,
                threshold=args.threshold,
            )
            scores.write_parquet(args.out)
            # a clean corpus flags zero docs and Ray then writes no files
            # at all — report flagged_docs=0 instead of crashing the read
            n_flagged = (
                rd.read_parquet(args.out).count()
                if os.path.isdir(args.out) and os.listdir(args.out)
                else 0
            )
            print(
                json.dumps(
                    {
                        "flagged_docs": n_flagged,
                        "ngram": args.ngram,
                        "threshold": args.threshold,
                        "out_dir": args.out,
                    }
                )
            )
            return 0
        if args.cmd == "profile":
            from .stages.drift import drift_profile, save_baseline
            from .stages.stats import profile_dataset

            prof = profile_dataset(rd.read_parquet(args.input))
            if args.save_baseline:
                save_baseline(drift_profile(rd.read_parquet(args.input)), args.save_baseline)
            print(json.dumps(prof, default=str))
            return 0
    finally:
        ray.shutdown()
    return 2


if __name__ == "__main__":
    sys.exit(main())
