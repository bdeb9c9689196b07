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
from urllib.parse import urlencode, urlparse
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


DEFAULT_BASE_URL = "https://cloud.getdbt.com/api/v2"  # dbt_cloud.py:23


class CloudArtifactClient:
    """dbt-Cloud-shaped artifacts API client (ref SRC/dbt_cloud.py:10-116):
    account-scoped run listing ordered by ``-finished_at``, latest-
    success pick (status == 10), per-run artifact fetch. ``base_url``
    is overridable so tests (and self-hosted artifact stores) can point
    it anywhere; credentials come from the caller — the CLI wires them
    from ``DBT_CLOUD_API_TOKEN`` / ``DBT_CLOUD_ACCOUNT_ID`` env vars
    exactly like SRC/cli.py:28-40.
    """

    def __init__(
        self,
        api_token: str,
        account_id: str,
        base_url: str = DEFAULT_BASE_URL,
        timeout: int = 30,
    ) -> None:
        self.api_token = api_token
        self.account_id = account_id
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def get_job_runs(self, job_id: str, limit: int = 10) -> dict:
        """Recent runs for a job, newest first (ref dbt_cloud.py:29-51)."""
        params = urlencode(
            {"job_definition_id": job_id, "limit": limit, "order_by": "-finished_at"}
        )
        url = f"{self.base_url}/accounts/{self.account_id}/runs/?{params}"
        return _http_get_json(url, self.api_token, self.timeout)

    def get_latest_successful_run(self, job_id: str) -> dict | None:
        """Newest run with status 10 (ref dbt_cloud.py:53-73)."""
        runs = self.get_job_runs(job_id, limit=50).get("data", [])
        return latest_successful_run(runs)

    def get_run_artifact(self, run_id: str, artifact_path: str = "state.json") -> dict:
        """One artifact from one run (ref dbt_cloud.py:75-92; the
        reference fetches ``manifest.json``, this engine's prod state
        is its fingerprint JSON)."""
        url = (
            f"{self.base_url}/accounts/{self.account_id}"
            f"/runs/{run_id}/artifacts/{artifact_path}"
        )
        return _http_get_json(url, self.api_token, self.timeout)

    def get_state_from_job(self, job_id: str, run_id: str | None = None) -> dict:
        """State artifact from a specific run, or from the job's latest
        successful run when ``run_id`` is omitted (ref dbt_cloud.py:94-116)."""
        if run_id is None:
            run = self.get_latest_successful_run(job_id)
            if run is None:
                raise ValueError(f"no successful run found for job {job_id}")
            run_id = str(run.get("id"))
        return self.get_run_artifact(run_id)

    def save_state_to_file(
        self, job_id: str, output_path: str, run_id: str | None = None
    ) -> str:
        """Fetch + persist (ref dbt_cloud.py:118-144)."""
        doc = self.get_state_from_job(job_id, run_id)
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(doc, indent=2))
        return str(out)
