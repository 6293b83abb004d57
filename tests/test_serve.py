"""Job-server entry point (serve.py) — the reference's Spark-JobServer surface
(Main.scala:99-143): validate parses the single rw.input config string, run_job
returns the output path, and the REST server runs jobs asynchronously."""

import json
import time
import urllib.request

import pytest

from stellar_rw_tpu import serve
from stellar_rw_tpu.utils.config import TaskName


def test_validate_parses_rw_input(karate_path, tmp_path):
    cfg = {"rw.input": f"--cmd randomwalk --input {karate_path} "
                       f"--output {tmp_path} --walkLength 3 --numWalks 1"}
    params = serve.validate(cfg)
    assert params.cmd == TaskName.randomwalk
    assert params.walk_length == 3 and params.num_walks == 1
    assert params.input == str(karate_path)


def test_validate_rejects_bad_config(tmp_path):
    with pytest.raises(ValueError):
        serve.validate({})  # missing rw.input (reference reads it at Main.scala:139)
    with pytest.raises(ValueError):
        # unparsable argv -> the reference's MatchError analog
        serve.validate({"rw.input": "--cmd nosuch --input x --output y"})


def test_run_job_returns_output_path(karate_path, tmp_path):
    out = tmp_path / "job_out"
    params = serve.validate(
        {"rw.input": f"--cmd randomwalk --input {karate_path} --output {out} "
                     f"--walkLength 2 --numWalks 1 --weighted false"})
    result = serve.run_job(params)
    assert result == str(out)  # JobOutput = params.output (Main.scala:126)
    assert (out / "path" / "part-00000").exists()


def _http(method, url, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_rest_job_lifecycle(karate_path, tmp_path):
    srv = serve.JobServer()
    srv.start()
    host, port = srv.address
    base = f"http://{host}:{port}"
    try:
        out = tmp_path / "rest_out"
        code, job = _http("POST", f"{base}/jobs", {
            "rw.input": f"--cmd randomwalk --input {karate_path} --output {out} "
                        f"--walkLength 2 --numWalks 1 --weighted false"})
        assert code == 202 and job["status"] in ("RUNNING", "FINISHED")
        jid = job["jobId"]
        srv.wait(jid, timeout=120)
        code, done = _http("GET", f"{base}/jobs/{jid}")
        assert code == 200 and done["status"] == "FINISHED", done
        assert done["result"] == str(out)
        assert (out / "path" / "part-00000").exists()
        # listing + bad config + unknown id
        code, lst = _http("GET", f"{base}/jobs")
        assert code == 200 and any(j["jobId"] == jid for j in lst["jobs"])
        code, err = _http("POST", f"{base}/jobs", {"wrong": "key"})
        assert code == 400
        code, _ = _http("GET", f"{base}/jobs/doesnotexist")
        assert code == 404
    finally:
        srv.stop()


def test_failed_job_reports_error(tmp_path):
    srv = serve.JobServer()
    try:
        params = serve.validate(
            {"rw.input": f"--cmd randomwalk --input /nonexistent/file "
                         f"--output {tmp_path}/x"})
        job = srv.submit(params)
        srv.wait(job.id, timeout=60)
        assert job.status == "ERROR" and job.error
    finally:
        srv.stop()
