"""S1 landing-layout download helper (driver-side; exercised via file:// URLs)."""

from __future__ import annotations

import datetime as dt

import pytest

from ortholog_pipeline_spark.sources.download import download_to_landing, landing_path

STAMP = dt.date(2026, 1, 15)


def test_landing_path_layout(tmp_path):
    p = landing_path(str(tmp_path), "hcop", STAMP)
    assert p.endswith("hcop/dt=2026-01-15")


def test_download_and_idempotent_reland(tmp_path):
    src = tmp_path / "human_all_hcop_sixteen_column.txt.gz"
    src.write_bytes(b"payload-v1")
    url = src.as_uri()

    dest = download_to_landing(url, str(tmp_path / "landing"), "hcop", STAMP)
    assert open(dest, "rb").read() == b"payload-v1"

    # idempotent: a re-land of the same (source, date) keeps the first snapshot
    src.write_bytes(b"payload-v2")
    dest2 = download_to_landing(url, str(tmp_path / "landing"), "hcop", STAMP)
    assert dest2 == dest
    assert open(dest, "rb").read() == b"payload-v1"


def test_download_failure_raises(tmp_path):
    bad = (tmp_path / "missing.gz").as_uri()
    with pytest.raises(RuntimeError, match="download failed"):
        download_to_landing(
            bad, str(tmp_path / "landing"), "ncbi", STAMP, retries=2,
            backoff_seconds=0.0,
        )


# -- retry/backoff against a REAL (localhost-only) failing HTTP server --------
# The reference retries transient fetch failures before giving up
# (OrthologRelationFile.java:27-53: downloadNew keeps a date-stamped name and
# the pipeline re-attempts). These tests stand up http.server in-process: no
# network egress, genuine HTTP error/success status codes through urllib.

import contextlib
import hashlib
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

PAYLOAD = b"gene_id\tortholog_id\n1\t2\n" * 64


@contextlib.contextmanager
def _flaky_server(fail_times: int, status: int = 503):
    """Serve PAYLOAD, returning `status` for the first `fail_times` requests."""
    state = {"hits": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            state["hits"] += 1
            if state["hits"] <= fail_times:
                self.send_response(status)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(PAYLOAD)))
            self.end_headers()
            self.wfile.write(PAYLOAD)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/gene_orthologs.gz", state
    finally:
        srv.shutdown()
        srv.server_close()


class _FakeTime:
    """Recording stand-in bound into the download MODULE (not a global
    time.sleep patch — Spark/py4j background threads in the shared test
    session call time.sleep constantly and would pollute the recording)."""

    def __init__(self):
        self.sleeps: list[float] = []

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)


def test_download_retries_transient_http_failures(tmp_path, monkeypatch):
    """Fail twice with 503, succeed on the third attempt; assert the backoff
    schedule is linear-increasing as documented (2s, 4s for the default 2.0)."""
    fake = _FakeTime()
    monkeypatch.setattr("ortholog_pipeline_spark.sources.download.time", fake)
    sleeps = fake.sleeps
    with _flaky_server(fail_times=2) as (url, state):
        dest = download_to_landing(
            url, str(tmp_path / "landing"), "ncbi", STAMP, retries=3,
            backoff_seconds=2.0,
        )
    assert open(dest, "rb").read() == PAYLOAD
    assert state["hits"] == 3
    assert sleeps == [2.0, 4.0]  # backoff_seconds * (attempt + 1)
    # no stray .part file left behind after the successful atomic land
    import os

    assert not any(f.endswith(".part") for f in os.listdir(os.path.dirname(dest)))


def test_download_exhausts_retries_against_persistent_500(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "ortholog_pipeline_spark.sources.download.time", _FakeTime()
    )
    with _flaky_server(fail_times=99, status=500) as (url, state):
        with pytest.raises(RuntimeError, match="download failed after 3"):
            download_to_landing(
                url, str(tmp_path / "landing"), "ncbi", STAMP, retries=3
            )
    assert state["hits"] == 3


def test_redownload_is_checksum_stable_and_serverless(tmp_path):
    """Idempotent landing: the second call must return the SAME bytes without
    touching the network at all (the server is down by then)."""
    with _flaky_server(fail_times=0) as (url, _):
        dest = download_to_landing(url, str(tmp_path / "landing"), "hcop", STAMP)
    first_sum = hashlib.sha256(open(dest, "rb").read()).hexdigest()
    # server is shut down here — a re-download attempt would ConnectionError
    dest2 = download_to_landing(url, str(tmp_path / "landing"), "hcop", STAMP)
    assert dest2 == dest
    assert hashlib.sha256(open(dest2, "rb").read()).hexdigest() == first_sum
