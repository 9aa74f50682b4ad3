"""Serving layer: job API, same-shape batching, error isolation.

Uses a stub batch_fn (no model, no device) -- what's under test is the
queue/batching/registry machinery in fantasy_world_tpu/serving/server.py
and the request plumbing of cli/serve.py's batch function.
"""
import json
import time
import urllib.error
import urllib.request

import pytest


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read()), r.status


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.loads(r.read()), r.status


def _wait_done(port, job_id, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        body, _ = _get(port, f"/v1/jobs/{job_id}")
        if body["status"] in ("done", "error"):
            return body
        time.sleep(0.02)
    raise TimeoutError(f"job {job_id} not done")


@pytest.fixture()
def server():
    from fantasy_world_tpu.serving.server import GenerationServer

    calls = []

    def batch_fn(jobs):
        calls.append([j.request["prompt"] for j in jobs])
        out = []
        for j in jobs:
            if j.request["prompt"] == "boom":
                raise RuntimeError("synthetic failure")
            out.append({"echo": j.request["prompt"],
                        "batch_size": len(jobs)})
        return out

    srv = GenerationServer(batch_fn, port=0, max_batch=4, linger_s=0.15)
    srv.calls = calls
    srv.start()
    yield srv
    srv.shutdown()


def test_submit_poll_and_batching(server):
    port = server.port
    body, status = _get(port, "/v1/health")
    assert status == 200 and body["ok"]

    # burst of 3 same-shape jobs within the linger window -> one batch
    ids = [_post(port, {"prompt": f"p{i}"})[0]["job_id"] for i in range(3)]
    results = [_wait_done(port, i) for i in ids]
    assert all(r["status"] == "done" for r in results)
    assert [r["result"]["echo"] for r in results] == ["p0", "p1", "p2"]
    assert any(len(c) > 1 for c in server.calls), \
        f"no batching happened: {server.calls}"


def test_shape_mismatch_splits_batches(server):
    port = server.port
    a = _post(port, {"prompt": "a", "height": 336})[0]["job_id"]
    b = _post(port, {"prompt": "b", "height": 480})[0]["job_id"]
    ra, rb = _wait_done(port, a), _wait_done(port, b)
    assert ra["status"] == rb["status"] == "done"
    # different heights may never share a call
    for call in server.calls:
        assert not ({"a", "b"} <= set(call))


def test_job_progress_reporting():
    """A batch_fn that reports progress (the --segment_size path in
    cli/serve.py) surfaces it on GET /v1/jobs/<id> while running, and the
    field disappears once the job is done."""
    from fantasy_world_tpu.serving.server import GenerationServer

    release = []

    def batch_fn(jobs):
        for j in jobs:
            j.progress = {"done": 2, "total": 4}
        while not release:             # hold the job in 'running'
            time.sleep(0.01)
        return [{"echo": j.request["prompt"]} for j in jobs]

    srv = GenerationServer(batch_fn, port=0, max_batch=1, linger_s=0.01)
    srv.start()
    try:
        jid = _post(srv.port, {"prompt": "p"})[0]["job_id"]
        deadline = time.time() + 5.0
        body = {}
        while time.time() < deadline:
            body, _ = _get(srv.port, f"/v1/jobs/{jid}")
            if body.get("progress"):
                break
            time.sleep(0.02)
        assert body.get("progress") == {"done": 2, "total": 4}
        release.append(1)
        done = _wait_done(srv.port, jid)
        assert done["status"] == "done" and "progress" not in done
    finally:
        release.append(1)
        srv.shutdown()


def test_error_isolation_and_validation(server):
    port = server.port
    jid = _post(port, {"prompt": "boom"})[0]["job_id"]
    r = _wait_done(port, jid)
    assert r["status"] == "error" and "synthetic failure" in r["error"]

    # server keeps working after a failed batch
    ok = _post(port, {"prompt": "fine"})[0]["job_id"]
    assert _wait_done(port, ok)["status"] == "done"

    # request validation
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, {"no_prompt": 1})
    assert ei.value.code == 400
    body, _ = _get(port, "/v1/health")
    assert body["ok"]

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/v1/jobs/doesnotexist")
    assert ei.value.code == 404


def test_make_batch_fn22_per_job_loop(tmp_path):
    """cli/serve.py --variant wan22: jobs are denoised one at a time
    through the dual-expert sampler surface; each job gets its own export
    dir and progress updates target only its own Job."""
    import argparse
    import numpy as np
    from fantasy_world_tpu.cli.serve import make_batch_fn22
    from fantasy_world_tpu.serving.server import Job

    calls = []

    class StubSampler:
        def generate_video(self, **kw):
            calls.append(kw)
            if kw.get("progress_callback"):
                kw["progress_callback"](1, 3)
            return (np.zeros((5, 8, 8, 3), np.uint8),
                    {})                        # empty prediction: no PLY

        @staticmethod
        def export(video, pred, out_dir, **kw):
            import os
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "video.mp4"), "wb") as f:
                f.write(b"x")

    args = argparse.Namespace(segment_size=2, ulysses=False,
                              output_root=str(tmp_path))
    fn = make_batch_fn22(StubSampler(), args)
    jobs = [Job(id=f"j{i}", request={"prompt": f"p{i}",
                                     "image_path": "img.png"})
            for i in range(2)]
    out = fn(jobs)
    assert len(out) == len(calls) == 2
    assert calls[0]["prompt"] == "p0" and calls[1]["prompt"] == "p1"
    assert jobs[0].progress == jobs[1].progress == {"done": 1, "total": 3}
    assert all(o["frames"] == 5 for o in out)
    assert {o["output_dir"].rsplit("/", 1)[-1] for o in out} == {"j0", "j1"}


def test_camera_and_scale_split_batches():
    """camera_json presence and using_scale are batch-key fields: mixing
    them used to make the camera-aware batch_fn error the WHOLE batch
    (all-or-none camera check) or silently disable scale-norm for
    batchmates (r4 review)."""
    from fantasy_world_tpu.serving.server import Job

    base = {"prompt": "p", "image_path": "i.png", "height": 64, "width": 64}
    j_cam = Job(id="1", request={**base, "camera_json": "c.json"})
    j_plain = Job(id="2", request=dict(base))
    j_noscale = Job(id="3", request={**base, "using_scale": False})
    assert j_cam.batch_key() != j_plain.batch_key()
    assert j_noscale.batch_key() != j_plain.batch_key()
    assert Job(id="4", request=dict(base)).batch_key() == j_plain.batch_key()
