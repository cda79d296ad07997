"""Bench-as-test: every datum in the reference's bench corpus must validate
against its schema (validate_test.go:59-75).  Doubles as a slow-path
regression suite over 8 large real-world schemas."""

from __future__ import annotations

import glob
import os

import pytest

from jsonschema_ray.core import parse

from .conftest import BENCH_DIR


def _collect():
    out = []
    for schema_path in sorted(glob.glob(os.path.join(BENCH_DIR, "*", "schema.json"))):
        name = os.path.basename(os.path.dirname(schema_path))
        for data_path in sorted(
            glob.glob(os.path.join(os.path.dirname(schema_path), "data", "*.json"))
        ):
            out.append(
                pytest.param(
                    schema_path,
                    data_path,
                    id=f"{name}/{os.path.basename(data_path)}",
                )
            )
    return out


@pytest.mark.parametrize("schema_path,data_path", _collect())
def test_bench_datum_validates(schema_path, data_path):
    with open(schema_path, "rb") as f:
        sch = parse(f.read())
    with open(data_path, "rb") as f:
        data = f.read()
    assert sch.check(data) is None
