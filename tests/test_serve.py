"""serve_nerf.py: the HTTP render service (production-serving surface).

Drives the RenderService + HTTP layer in-process on the CPU backend: a tiny
checkpoint is written to disk, the server binds port 0, and requests go
through a real socket (urllib) — routes, PNG payloads, error paths.
"""

import json
import os
import sys
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nerf_tpu.config import load_config  # noqa: E402
from nerf_tpu.engine.checkpoint import save_checkpoint  # noqa: E402
from nerf_tpu.models import FlexibleNeRFModel  # noqa: E402

_CFG = """
experiment:
  id: serve-test
  logdir: logs
  randomseed: 1
  train_iters: 1
  validate_every: 1
  save_every: 1
  print_every: 1
dataset:
  type: synthetic
  basedir: ""
  num_views: 2
  image_size: 24
  no_ndc: True
  near: 2
  far: 6
models:
  coarse:
    type: FlexibleNeRFModel
    num_layers: 2
    hidden_size: 16
    num_encoding_fn_xyz: 2
    num_encoding_fn_dir: 1
    use_viewdirs: True
optimizer:
  type: Adam
  lr: 5.0E-3
nerf:
  use_viewdirs: True
  train:
    num_random_rays: 32
    chunksize: 1024
    perturb: True
    num_coarse: 4
    num_fine: 0
    white_background: False
    radiance_field_noise_std: 0.0
    lindisp: False
  validation:
    chunksize: 1024
    perturb: False
    num_coarse: 4
    num_fine: 0
    white_background: False
    radiance_field_noise_std: 0.0
    lindisp: False
"""


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from serve_nerf import RenderService, serve

    cfg_path = tmp_path_factory.mktemp("cfg") / "serve.yml"
    cfg_path.write_text(_CFG)
    cfg = load_config(str(cfg_path))
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=2, num_encoding_fn_dir=1,
    )
    ckpt_path = str(tmp_path_factory.mktemp("ckpt") / "checkpoint00001.ntc")
    save_checkpoint(ckpt_path, {
        "step": 1,
        "params_coarse": model.init(jax.random.PRNGKey(0)),
        "params_fine": None,
    })
    service = RenderService(cfg, ckpt_path, renderer="xla")
    httpd = serve(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, service
    httpd.shutdown()
    thread.join(timeout=5)


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_viewer_page(server):
    base, _ = server
    status, ctype, body = _get(base + "/")
    assert status == 200 and ctype == "text/html"
    assert b"/render?theta=" in body


def test_render_frame_returns_png(server):
    base, service = server
    status, ctype, body = _get(base + "/render?frame=0")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    import imageio.v2 as imageio

    img = imageio.imread(body)
    assert img.shape == (service.height, service.width, 3)


def test_render_spherical_and_health(server):
    base, _ = server
    status, ctype, _body = _get(base + "/render?theta=90&phi=-20&radius=3.5")
    assert status == 200 and ctype == "image/png"
    status, _, body = _get(base + "/health")
    h = json.loads(body)
    assert h["status"] == "ok"
    assert h["frames_served"] >= 2
    assert h["last_render_s"] is not None


def test_post_pose(server):
    base, service = server
    pose = np.asarray(service.poses[1], np.float32)[:4].tolist()
    req = urllib.request.Request(
        base + "/pose",
        data=json.dumps({"pose": pose}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
        assert resp.read()[:8] == b"\x89PNG\r\n\x1a\n"


def test_bad_requests_are_400_not_500(server):
    base, _ = server
    for path, data in [
        ("/render?frame=notanint", None),
        ("/pose", json.dumps({"pose": [[1.0, 2.0]]}).encode()),
        ("/pose", b"not json"),
    ]:
        req = urllib.request.Request(
            base + path, data=data,
            method="POST" if data is not None else "GET",
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400
        assert "error" in json.loads(exc_info.value.read())


def test_unknown_route_404(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert exc_info.value.code == 404


def test_watch_logdir_hot_swaps_params(tmp_path):
    """--logdir watch mode: a new checkpoint landing in the logdir changes
    what subsequent requests render, with no recompilation (the compiled
    renderer takes params as pytree args)."""
    from serve_nerf import RenderService

    cfg_path = tmp_path / "serve.yml"
    cfg_path.write_text(_CFG)
    cfg = load_config(str(cfg_path))
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=2, num_encoding_fn_dir=1,
    )
    logdir = tmp_path / "run"
    logdir.mkdir()

    def write(step, seed):
        save_checkpoint(str(logdir / f"checkpoint{step:05d}.ntc"), {
            "step": step,
            "params_coarse": model.init(jax.random.PRNGKey(seed)),
            "params_fine": None,
        })

    write(10, seed=0)
    service = RenderService(cfg, watch_logdir=str(logdir), renderer="xla")
    assert service.checkpoint_step == 10
    img1 = service.render_frame(0)

    write(20, seed=123)  # new checkpoint lands mid-serving
    img2 = service.render_frame(0)
    assert service.checkpoint_step == 20
    assert service.checkpoint_path.endswith("checkpoint00020.ntc")
    assert not np.array_equal(img1, img2)  # different field, same pose

    # And the same pose re-renders identically when nothing new landed.
    img3 = service.render_frame(0)
    assert np.array_equal(img2, img3)


def test_watch_logdir_empty_raises(tmp_path):
    from serve_nerf import RenderService

    cfg_path = tmp_path / "serve.yml"
    cfg_path.write_text(_CFG)
    with pytest.raises(ValueError, match="no .ntc checkpoints"):
        RenderService(load_config(str(cfg_path)),
                      watch_logdir=str(tmp_path))


def test_viewer_html_variants():
    """NDC scenes get a trajectory-frame slider (an orbit exits their
    frustum); free-orbit scenes get theta/phi/radius controls."""
    from serve_nerf import viewer_html

    orbit = viewer_html(ndc=False, num_frames=40)
    assert "/render?theta=" in orbit and "/render?frame" not in orbit
    ndc = viewer_html(ndc=True, num_frames=120)
    assert "/render?frame=" in ndc and 'max="119"' in ndc
    assert "theta" not in ndc


def test_post_pose_non_object_body_is_400(server):
    """A JSON body that isn't an object (bare pose list, no {"pose": ...}
    wrapper) must still be a 400, not a TypeError-500."""
    base, _ = server
    req = urllib.request.Request(
        base + "/pose",
        data=json.dumps([[1.0, 0.0, 0.0, 0.0]]).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == 400


def test_watch_checkpoint_vanished_is_503(tmp_path, monkeypatch):
    """Watch-mode race (newest checkpoint pruned between the logdir listing
    and the open) returns a structured 503, not a raw 500 traceback."""
    import threading as _threading

    from serve_nerf import RenderService, serve

    cfg_path = tmp_path / "serve.yml"
    cfg_path.write_text(_CFG)
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=2, num_encoding_fn_dir=1,
    )
    logdir = tmp_path / "run"
    logdir.mkdir()
    save_checkpoint(str(logdir / "checkpoint00010.ntc"), {
        "step": 10,
        "params_coarse": model.init(jax.random.PRNGKey(0)),
        "params_fine": None,
    })
    service = RenderService(load_config(str(cfg_path)),
                            watch_logdir=str(logdir), renderer="xla")
    # A newer checkpoint "lands"... and is pruned before the open.
    (logdir / "checkpoint00020.ntc").touch()
    os.unlink(logdir / "checkpoint00020.ntc")
    import nerf_tpu.engine.checkpoint as ckpt_mod

    monkeypatch.setattr(
        ckpt_mod, "latest_checkpoint",
        lambda d: os.path.join(d, "checkpoint00020.ntc"),
    )
    httpd = serve(service, "127.0.0.1", 0)
    thread = _threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(base + "/render?frame=0", timeout=30)
        assert exc_info.value.code == 503
        assert "checkpoint vanished" in json.loads(exc_info.value.read())["error"]
        # POST /pose hits the same race through the same shared error
        # contract (the reload runs inside render_pose either way).
        pose = np.eye(4, dtype=np.float32)[:3].tolist()
        req = urllib.request.Request(
            base + "/pose",
            data=json.dumps({"pose": pose}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 503
        assert "checkpoint vanished" in json.loads(exc_info.value.read())["error"]
    finally:
        httpd.shutdown()
        thread.join(timeout=5)


def test_stalled_client_does_not_wedge_health(server):
    """Liveness under a hung connection: a client that connects and never
    finishes its request holds only its own handler thread
    (ThreadingHTTPServer); /health and further renders keep answering.
    Under the old sequential HTTPServer this deadlocks until the stalled
    socket closes."""
    import socket

    base, _ = server
    host, port = base.removeprefix("http://").split(":")
    stalled = socket.create_connection((host, int(port)), timeout=30)
    try:
        # A started-but-never-finished request: the handler thread blocks
        # reading headers (no terminating blank line) for its whole timeout.
        # Stalling a /health request (not a render) keeps this test free of
        # side effects: closing an incomplete request makes http.server
        # treat EOF as end-of-headers and EXECUTE it, which would bump
        # frames_served under a later test.
        stalled.sendall(b"GET /health HTTP/1.1\r\nHost: x\r\n")
        status, _, body = _get(base + "/health")
        assert status == 200 and json.loads(body)["status"] == "ok"
        # A full render also still goes through.
        status, ctype, _img = _get(base + "/render?frame=1")
        assert status == 200 and ctype == "image/png"
    finally:
        stalled.close()


def test_concurrent_renders_serialize_on_device_lock(server):
    """Parallel render requests all succeed: handler threads queue on the
    device lock (one chip, one render at a time), every response is a valid
    PNG, and the latency stats stay coherent."""
    base, service = server
    before = service.frames_served
    n = 4
    results = [None] * n

    def fetch(i):
        results[i] = _get(base + f"/render?theta={40 + i * 10}&phi=-30&radius=4")

    threads = [threading.Thread(target=fetch, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for status, ctype, body in results:
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
    assert service.frames_served == before + n
    assert service.last_render_s is not None and service.last_render_s > 0
