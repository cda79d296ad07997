"""Shared fixtures: one Ray session per pytest run, loopback remote server."""

from __future__ import annotations

import functools
import http.server
import socketserver
import threading

import pytest

REFERENCE = "/root/reference"
REMOTES_DIR = f"{REFERENCE}/_testdata/remotes"
SUITE_DIR = f"{REFERENCE}/_testdata/suite/draft4"
CUSTOM_DIR = f"{REFERENCE}/_testdata/custom/draft4"
BENCH_DIR = f"{REFERENCE}/_bench"


@pytest.fixture(scope="session")
def ray_session():
    import os

    import ray

    # same worker-log config as bench.py: hold the per-worker console
    # handler at ERROR so the pandas-metadata "Failed to hash the
    # schemas" concat warning doesn't interleave with pytest output
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(
            os.path.dirname(__file__), "..", "jsonschema_ray", "raydata_logging.yaml"
        ),
    )
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


class _QuietHandler(http.server.SimpleHTTPRequestHandler):
    def log_message(self, *args):  # pragma: no cover
        pass


@pytest.fixture(scope="session")
def remote_server():
    """Serve the reference's remote fixtures on localhost:1234
    (cf. reference suite_test.go:19-32)."""
    handler = functools.partial(_QuietHandler, directory=REMOTES_DIR)

    class _Server(socketserver.TCPServer):
        allow_reuse_address = True

    try:
        srv = _Server(("127.0.0.1", 1234), handler)
    except OSError:
        # q_conformance's in-process fixture server (sources/suite.py) may
        # already be serving the same directory — use it
        yield "http://localhost:1234"
        return
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield "http://localhost:1234"
    srv.shutdown()
    srv.server_close()
