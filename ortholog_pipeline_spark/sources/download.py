"""S1 — source-file download to a date-stamped landing directory.

The reference's ``FileDownloader2.downloadNew`` (OrthologRelationFile.java:27-53)
fetches each HTTPS source into ``data/`` with an appended date stamp and keeps the
gzip. Downloading is driver-side work, not a Spark op; what matters for the engine is
the LANDING LAYOUT: one subdirectory per (source, date) so that
  * a run reads an immutable, named snapshot (idempotent re-runs),
  * the streaming sources (`streaming.sources`) can watch the landing root and treat
    each newly landed file as a micro-batch,
  * partition-parallel scans see many files, not one giant gz member.
"""

from __future__ import annotations

import datetime as dt
import os
import time
import urllib.request


def landing_path(landing_root: str, source: str, stamp: dt.date | None = None) -> str:
    """``<root>/<source>/dt=<YYYY-MM-DD>/`` — the engine's date-stamped landing dir."""
    d = (stamp or dt.date.today()).isoformat()
    return os.path.join(landing_root, source, f"dt={d}")


def download_to_landing(
    url: str,
    landing_root: str,
    source: str,
    stamp: dt.date | None = None,
    retries: int = 3,
    backoff_seconds: float = 2.0,
) -> str:
    """Fetch ``url`` into the landing layout with retry (the reference retries
    transient failures). Returns the landed file path. Existing landed files are kept
    (idempotent: a re-run of the same (source, date) is a no-op)."""
    dest_dir = landing_path(landing_root, source, stamp)
    os.makedirs(dest_dir, exist_ok=True)
    fname = os.path.basename(url.rstrip("/")) or "download"
    dest = os.path.join(dest_dir, fname)
    if os.path.exists(dest):
        return dest

    last_err: Exception | None = None
    tmp = dest + ".part"
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
            os.replace(tmp, dest)  # atomic land
            return dest
        except Exception as err:  # noqa: BLE001 — retry any transient fetch error
            last_err = err
            if attempt < retries - 1:
                time.sleep(backoff_seconds * (attempt + 1))
    raise RuntimeError(f"download failed after {retries} attempts: {url}") from last_err
