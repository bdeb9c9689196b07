"""Remote state retrieval: local/file-url loading + successful-run pick."""

import json

from dbt_incremental_ci_spark.ci.artifacts import (
    SUCCESS_STATUS,
    fetch_state,
    latest_successful_run,
)


def test_fetch_state_local_path(tmp_path):
    p = tmp_path / "state.json"
    p.write_text(json.dumps({"fingerprints": {"m": "abc"}}))
    assert fetch_state(str(p))["fingerprints"] == {"m": "abc"}
    assert fetch_state(f"file://{p}")["fingerprints"] == {"m": "abc"}


def test_latest_successful_run_selection():
    runs = [
        {"id": 1, "status": SUCCESS_STATUS, "finished_at": "2024-01-01"},
        {"id": 2, "status": 20, "finished_at": "2024-02-01"},  # failed
        {"id": 3, "status": SUCCESS_STATUS, "finished_at": "2024-03-01"},
    ]
    assert latest_successful_run(runs)["id"] == 3
    assert latest_successful_run([{"id": 9, "status": 20}]) is None


def test_fetch_state_rejects_unknown_scheme():
    import pytest

    with pytest.raises(ValueError):
        fetch_state("ftp://nope/state.json")


def test_cloud_client_account_job_surface():
    """CloudArtifactClient drives the dbt-Cloud-shaped endpoints with
    account/job parameterization, token auth, latest-success (status
    10) selection, and per-run artifact fetch (ref SRC/dbt_cloud.py)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    from dbt_incremental_ci_spark.ci.artifacts import CloudArtifactClient

    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            parsed = urlparse(self.path)
            seen.setdefault("auth", self.headers.get("Authorization"))
            if parsed.path == "/api/v2/accounts/acct42/runs/":
                seen["qs"] = parse_qs(parsed.query)
                body = {
                    "data": [
                        {"id": 7, "status": 20, "finished_at": "2024-03-01"},
                        {"id": 5, "status": 10, "finished_at": "2024-02-01"},
                        {"id": 3, "status": 10, "finished_at": "2024-01-01"},
                    ]
                }
            elif parsed.path == "/api/v2/accounts/acct42/runs/5/artifacts/state.json":
                body = {"fingerprints": {"m": "fp5"}}
            else:
                self.send_response(404)
                self.end_headers()
                return
            payload = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}/api/v2"
        client = CloudArtifactClient("tok-xyz", "acct42", base_url=base)
        doc = client.get_state_from_job("job9")
        assert doc == {"fingerprints": {"m": "fp5"}}  # run 5 = newest success
        assert seen["auth"] == "Token tok-xyz"
        assert seen["qs"]["job_definition_id"] == ["job9"]
        assert seen["qs"]["order_by"] == ["-finished_at"]
        # pinned run id bypasses the listing
        assert client.get_state_from_job("job9", run_id="5") == doc
    finally:
        srv.shutdown()


def test_cloud_client_save_state_to_file(tmp_path):
    from unittest.mock import patch

    from dbt_incremental_ci_spark.ci.artifacts import CloudArtifactClient

    client = CloudArtifactClient("t", "a")
    with patch.object(client, "get_state_from_job", return_value={"fingerprints": {}}):
        out = client.save_state_to_file("j", str(tmp_path / "sub" / "state.json"))
    assert json.loads(open(out).read()) == {"fingerprints": {}}
