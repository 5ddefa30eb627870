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
