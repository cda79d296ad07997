"""Conformance corpus as a Ray Dataset (SURVEY.md §2.4: "a Ray job
validating the corpus as a table").

Flattens the vendored JSON-Schema-Test-Suite Draft-4 files (reference
layout ``_testdata/{suite,custom}/draft4/*.json``, loader semantics of
jsonschema_test.go:39-49,81-112 — ``format`` skipped, each file an array of
``{description, schema, tests: [{description, data, valid}]}``) into rows
``(case_id, file, group, case, schema_json, data_json, expect_valid)``, and
validates them distributed: the per-worker schema cache in
stages/validate.py gives compile-once-per-(worker, schema) amortization —
the distributed analogue of the reference's one ``Parse`` per group.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa

__all__ = ["suite_rows", "suite_dataset", "validate_suite"]

DEFAULT_SUITE_DIR = "/root/reference/_testdata/suite/draft4"
DEFAULT_CUSTOM_DIR = "/root/reference/_testdata/custom/draft4"

# format is parsed-but-ignored by the reference (jsonschema_test.go:90-99);
# refRemote needs the loopback fixture server — excluded for hermetic runs.
DEFAULT_SKIP = ("format.json", "refRemote.json")


def suite_rows(dirs=None, skip=DEFAULT_SKIP) -> pa.Table:
    dirs = dirs or (DEFAULT_SUITE_DIR, DEFAULT_CUSTOM_DIR)
    files, groups, cases, descs, schemas, datas, expect = [], [], [], [], [], [], []
    for d in dirs:
        for path in sorted(glob.glob(os.path.join(d, "*.json"))):
            name = os.path.basename(path)
            if name in skip:
                continue
            with open(path) as f:
                content = json.load(f)
            for gi, group in enumerate(content):
                sj = json.dumps(group["schema"])
                for ci, case in enumerate(group["tests"]):
                    files.append(name)
                    groups.append(gi)
                    cases.append(ci)
                    descs.append(f"{group['description']} / {case['description']}")
                    schemas.append(sj)
                    datas.append(json.dumps(case["data"]))
                    expect.append(bool(case["valid"]))
    return pa.table(
        {
            "case_id": pa.array(np.arange(len(files), dtype=np.int64)),
            "file": pa.array(files, pa.string()),
            "group_idx": pa.array(np.asarray(groups, dtype=np.int32)),
            "case_idx": pa.array(np.asarray(cases, dtype=np.int32)),
            "description": pa.array(descs, pa.string()),
            "schema_json": pa.array(schemas, pa.string()),
            "data_json": pa.array(datas, pa.string()),
            "expect_valid": pa.array(expect, pa.bool_()),
        }
    )


def suite_dataset(dirs=None, skip=DEFAULT_SKIP, num_blocks: int = 16):
    import ray.data as rd

    return rd.from_arrow(suite_rows(dirs, skip)).repartition(num_blocks)


def validate_suite(ds):
    """→ Dataset (case_id, file, description, expect_valid, got_valid,
    message, match): every row validated with the per-worker compile cache."""
    from ..stages.validate import _cached_schema

    def run(t: pa.Table) -> pa.Table:
        got, msgs = [], []
        for sj, dj in zip(t["schema_json"].to_pylist(), t["data_json"].to_pylist()):
            msg = _cached_schema(sj).check(dj)
            got.append(msg is None)
            msgs.append(msg or "")
        expect = t["expect_valid"].to_pylist()
        return pa.table(
            {
                "case_id": t["case_id"],
                "file": t["file"],
                "description": t["description"],
                "expect_valid": t["expect_valid"],
                "got_valid": pa.array(got, pa.bool_()),
                "message": pa.array(msgs, pa.string()),
                "match": pa.array([g == e for g, e in zip(got, expect)], pa.bool_()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")
