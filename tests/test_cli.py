"""CLI tests: config-driven run mode (file / env / b64-env, mutual
exclusion + validation — reference analog tap.py:16-33) and an
end-to-end replay through main()."""

from __future__ import annotations

import base64
import json

import pytest

from tap_github_search_spark.cli import load_job_config, main


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("SPARK_CDC_CONFIG", raising=False)
    monkeypatch.delenv("SPARK_CDC_CONFIG_B64", raising=False)


def _cfg(**kw):
    base = {"mode": "replay", "log_dirs": ["/x"], "table": "/y"}
    base.update(kw)
    return base


def test_config_sources_are_mutually_exclusive(tmp_path, monkeypatch):
    p = tmp_path / "c.json"
    p.write_text(json.dumps(_cfg()))
    monkeypatch.setenv("SPARK_CDC_CONFIG", json.dumps(_cfg()))
    with pytest.raises(SystemExit):
        load_job_config(str(p))
    monkeypatch.delenv("SPARK_CDC_CONFIG")
    with pytest.raises(SystemExit):
        load_job_config(None)  # zero sources


def test_config_validation(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"mode": "replay"}))
    with pytest.raises(SystemExit, match="missing keys"):
        load_job_config(str(p))
    p.write_text(json.dumps(_cfg(bogus=1)))
    with pytest.raises(SystemExit, match="unknown config keys"):
        load_job_config(str(p))
    p.write_text(json.dumps(_cfg(mode="stream")))
    with pytest.raises(SystemExit, match="requires 'checkpoint'"):
        load_job_config(str(p))


def test_config_from_b64_env(monkeypatch):
    cfg = _cfg(merge_mode="mor")
    monkeypatch.setenv(
        "SPARK_CDC_CONFIG_B64",
        base64.b64encode(json.dumps(cfg).encode()).decode(),
    )
    assert load_job_config(None) == cfg


def test_run_mode_end_to_end(spark, tmp_dir, tmp_path, monkeypatch, capsys):
    from tap_github_search_spark.sources.generator import write_changelog

    write_changelog(spark, f"{tmp_dir}/log", 60, n_files=2)
    cfg = {
        "mode": "replay", "log_dirs": [f"{tmp_dir}/log"],
        "table": f"{tmp_dir}/t", "buckets": 4, "epochs": 2,
        "merge_mode": "mor", "cores": 8,
    }
    p = tmp_path / "job.json"
    p.write_text(json.dumps(cfg))
    assert main(["run", "--config", str(p)]) == 0
    out = [json.loads(line) for line in
           capsys.readouterr().out.strip().splitlines()]
    assert [r["epoch"] for r in out] == [0, 1]
    assert sum(r["rows_applied"] for r in out) > 0
