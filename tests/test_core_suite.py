"""Conformance: the vendored JSON-Schema-Test-Suite Draft-4 corpus.

Mirrors the reference's suite runner (jsonschema_test.go:81-112,
suite_test.go:19-36): every schema must itself validate against the draft-4
meta-schema, compile, and produce the expected pass/fail verdict on every
case.  ``format`` is skipped exactly like the reference (jsonschema_test.go:
90-99); ``refRemote`` runs against the loopback fixture server.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from jsonschema_ray.core import parse

from .conftest import CUSTOM_DIR, SUITE_DIR


def _load_groups(directory, skip=("format.json",), only=None):
    out = []
    for path in sorted(glob.glob(os.path.join(directory, "*.json"))):
        name = os.path.basename(path)
        if name in skip:
            continue
        if only is not None and name not in only:
            continue
        with open(path) as f:
            for gi, group in enumerate(json.load(f)):
                out.append(
                    pytest.param(
                        group, id=f"{name}:{gi}:{group['description'][:40]}"
                    )
                )
    return out


@pytest.fixture(scope="module")
def meta_schema():
    here = os.path.dirname(__file__)
    pkg = os.path.join(here, "..", "jsonschema_ray", "core", "draft4_metaschema.json")
    with open(pkg, "rb") as f:
        return parse(f.read())


def _run_group(group, meta_schema):
    schema_json = json.dumps(group["schema"])
    # Self-check: the test schema must validate against the meta-schema
    # (jsonschema_test.go:55).
    assert meta_schema.check(schema_json) is None
    sch = parse(schema_json)
    for case in group["tests"]:
        msg = sch.check(json.dumps(case["data"]))
        if case["valid"]:
            assert msg is None, (case["description"], msg)
        else:
            assert msg is not None, case["description"]


@pytest.mark.parametrize(
    "group", _load_groups(SUITE_DIR, skip=("format.json", "refRemote.json"))
)
def test_suite(group, meta_schema):
    _run_group(group, meta_schema)


@pytest.mark.parametrize("group", _load_groups(SUITE_DIR, only=("refRemote.json",)))
def test_suite_remote(group, meta_schema, remote_server):
    _run_group(group, meta_schema)


@pytest.mark.parametrize("group", _load_groups(CUSTOM_DIR))
def test_custom_suite(group, meta_schema):
    _run_group(group, meta_schema)


def test_meta_schema_self_validates(meta_schema):
    here = os.path.dirname(__file__)
    pkg = os.path.join(here, "..", "jsonschema_ray", "core", "draft4_metaschema.json")
    with open(pkg, "rb") as f:
        raw = f.read()
    assert meta_schema.check(raw) is None
