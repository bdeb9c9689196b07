"""Remote production-state retrieval.

The reference fetches its prod manifest either from a local file or
over HTTPS from the dbt Cloud artifacts API, picking the latest
successful run (SRC/dbt_cloud.py:29-116; success == status 10 at :68).
This engine's state is the fingerprint JSON (ci/state.py); this module
mirrors the retrieval surface: local path, file:// URL, or http(s)
endpoint returning either the state JSON directly or a run-list
envelope from which the latest successful run's artifact is chosen.
"""

from __future__ import annotations

import json
from pathlib import Path
from urllib.parse import urlparse
from urllib.request import Request, urlopen

SUCCESS_STATUS = 10  # dbt Cloud "Success" run status (dbt_cloud.py:68)


def _http_get_json(url: str, token: str | None = None, timeout: int = 30) -> dict:
    req = Request(url, headers={"Accept": "application/json"})
    if token:
        req.add_header("Authorization", f"Token {token}")
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310 — caller-supplied URL
        return json.loads(resp.read().decode())


def latest_successful_run(runs: list[dict]) -> dict | None:
    """Pick the newest run with a success status (ref dbt_cloud.py:60-78)."""
    ok = [r for r in runs if r.get("status") == SUCCESS_STATUS]
    if not ok:
        return None
    return max(ok, key=lambda r: r.get("finished_at") or r.get("id") or 0)


def fetch_state(
    source: str, token: str | None = None, timeout: int = 30
) -> dict:
    """Load a prod-state document from a path or URL.

    Accepts: a filesystem path, a ``file://`` URL, or an http(s) URL.
    An http response may be the state JSON itself or an envelope
    ``{"runs": [{"status": …, "artifact": {…}}, …]}`` — in which case
    the newest successful run's ``artifact`` is returned.
    """
    parsed = urlparse(source)
    if parsed.scheme in ("", "file"):
        path = Path(parsed.path if parsed.scheme == "file" else source)
        return json.loads(path.read_text())
    if parsed.scheme not in ("http", "https"):
        raise ValueError(f"unsupported state source: {source}")
    doc = _http_get_json(source, token, timeout)
    if "runs" in doc:
        run = latest_successful_run(doc["runs"])
        if run is None:
            raise RuntimeError("no successful runs in artifact listing")
        return run["artifact"]
    return doc
