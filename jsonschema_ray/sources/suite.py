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


_REMOTE_SCHEMA_CACHE: dict = {}


def _cached_remote_schema(schema_json: str):
    """Per-worker compile cache with remote `$ref` resolution enabled."""
    sch = _REMOTE_SCHEMA_CACHE.get(schema_json)
    if sch is None:
        from ..core import parse
        from ..core.resolver import Remote

        sch = _REMOTE_SCHEMA_CACHE.setdefault(
            schema_json, parse(schema_json, resolver=Remote())
        )
    return sch


def ensure_remote_fixture_server(port: int = 1234) -> None:
    """Serve the reference's remote fixtures on localhost once per process
    (reference suite_test.go:19-32).  A bind failure means a server is
    already up (e.g. the pytest fixture) — proceed.  Single-node only:
    a real cluster would pre-fetch remote documents into the store."""
    import functools
    import http.server
    import socketserver
    import threading

    if getattr(ensure_remote_fixture_server, "_started", False):
        return

    class _Quiet(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *args):  # pragma: no cover
            pass

    class _Server(socketserver.TCPServer):
        allow_reuse_address = True

    try:
        srv = _Server(
            ("127.0.0.1", port),
            functools.partial(_Quiet, directory="/root/reference/_testdata/remotes"),
        )
    except OSError:
        ensure_remote_fixture_server._started = True  # someone else serves
        return
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    ensure_remote_fixture_server._started = True


def validate_suite(ds, remote: bool = False):
    """→ Dataset (case_id, file, description, expect_valid, got_valid,
    message, match): every row validated with the per-worker compile cache.

    ``remote=True`` compiles with the remote resolver so ``refRemote``
    cases run distributed too (call :func:`ensure_remote_fixture_server`
    first)."""

    def run(t: pa.Table) -> pa.Table:
        if remote:
            compile_one = _cached_remote_schema
        else:
            from ..stages.validate import _cached_schema as compile_one
        got, msgs = [], []
        for sj, dj in zip(t["schema_json"].to_pylist(), t["data_json"].to_pylist()):
            msg = compile_one(sj).check(dj)
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
