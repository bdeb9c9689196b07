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
