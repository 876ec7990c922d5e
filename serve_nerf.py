#!/usr/bin/env python3
"""Serve novel-view renders from a trained NeRF checkpoint over HTTP.

The production-serving counterpart of ``eval_nerf.py`` (the reference stops
at batch PNG export): load a checkpoint once, compile the pose->image
renderer once, then serve frames on demand. The compiled program lives for
the process lifetime, so per-request cost is one (3, 4) pose upload + one
device render + one uint8 image fetch — the same relay-transfer tricks as
the eval CLI (``engine.renderer.make_pose_render_fn``).

Endpoints:
  GET  /                render?theta/phi/radius orbit viewer (HTML, no deps)
  GET  /render?frame=i  i-th pose of the dataset's render trajectory
  GET  /render?theta=45&phi=-30&radius=4
                        spherical pose (non-NDC scenes; NDC scenes must use
                        frame= or POST /pose — an orbit exits their frustum)
  POST /pose            body {"pose": [[...], [...], [...]]} (3x4 or 4x4
                        camera-to-world) -> PNG
  GET  /health          JSON status + per-frame latency stats

Device renders are serialized by a lock (one TPU process owns the chip, and
renders saturate it — render concurrency belongs at the replica level: one
server per chip over a mesh), but socket I/O is threaded
(``ThreadingHTTPServer``): a stalled or slow-reading client holds only its
own connection thread, never the device, so ``/health`` and other renders
keep answering — the liveness property a sequential server can't provide.

``--logdir`` (instead of ``--checkpoint``) watches a training run: each
request renders the run's newest checkpoint, hot-swapping params when a new
one lands. Params are pytree ARGUMENTS of the compiled renderer, so the swap
is one host->device upload with zero recompilation — a live view of training
in progress.

Usage:
  python serve_nerf.py --config configs/lego_lowres.yml \
      --checkpoint /root/reference/pretrained/lego-lowres/checkpoint199999.ckpt
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_VIEWER_STYLE = """<style>
body{font-family:sans-serif;margin:2em;background:#111;color:#eee}
img{image-rendering:auto;border:1px solid #444;max-width:90vw}
label{margin-right:1.5em}</style>"""

_VIEWER_SCRIPT = """<script>
const img=document.getElementById('img');let busy=false,queued=null;
function done(u){busy=false;if(u)img.src=u;if(queued){queued=null;go()}}
function go(){if(busy){queued=url();return}busy=true;
  const u=url();const i=new Image();
  i.onload=()=>done(u);
  i.onerror=()=>done(null);  // a failed frame must not wedge the viewer
  i.src=u}
for(const el of controls) el.addEventListener('input',go);
</script></body></html>"""


def viewer_html(ndc: bool, num_frames: int) -> str:
    """The / page: orbit sliders for free-orbit scenes; a trajectory-frame
    slider for NDC (forward-facing) scenes, whose frustum an orbit exits."""
    head = (f"<!doctype html><html><head><title>nerf_tpu viewer</title>"
            f"{_VIEWER_STYLE}</head><body>"
            f"<h3>nerf_tpu — live checkpoint viewer</h3>")
    if ndc:
        return (
            head
            + f"""<div>
<label>frame <input id="f" type="range" min="0" max="{num_frames - 1}" value="0"></label>
</div>
<p><img id="img" src="/render?frame=0" alt="render"></p>
<script>const controls=[f];
function url(){{return `/render?frame=${{f.value}}`}}</script>"""
            + _VIEWER_SCRIPT
        )
    return (
        head
        + """<div>
<label>theta <input id="t" type="range" min="0" max="360" value="45"></label>
<label>phi <input id="p" type="range" min="-90" max="0" value="-30"></label>
<label>radius <input id="r" type="range" min="2" max="8" step="0.25" value="4"></label>
</div>
<p><img id="img" src="/render?theta=45&phi=-30&radius=4" alt="render"></p>
<script>const controls=[t,p,r];
function url(){return `/render?theta=${t.value}&phi=${p.value}&radius=${r.value}`}</script>"""
        + _VIEWER_SCRIPT
    )


class RenderService:
    """Checkpoint + compiled pose renderer + render-trajectory poses.

    Separated from the HTTP layer so tests (and other frontends) can drive
    it directly: ``render_pose`` takes any (3|4, 4) camera-to-world matrix,
    ``render_spherical`` builds the standard orbit pose.
    """

    def __init__(self, cfg, checkpoint_path: Optional[str] = None,
                 precision: str = "float32", renderer: str = "pallas",
                 watch_logdir: Optional[str] = None):
        import jax.numpy as jnp

        from nerf_tpu.config import render_settings_from_config
        from nerf_tpu.data.eval_poses import resolve_render_poses
        from nerf_tpu.engine.checkpoint import (
            latest_checkpoint,
            load_models_and_params,
        )

        from nerf_tpu.engine.renderer import make_pose_render_fn

        # Watch mode: serve a TRAINING RUN's logdir, hot-swapping params as
        # new checkpoints land. Params are pytree ARGUMENTS of the compiled
        # renderer (not baked constants), so a swap is one host->device
        # upload — zero recompilation; a request mid-training always renders
        # the newest atomic checkpoint (engine.checkpoint writes via
        # os.replace, so a partial file is never visible).
        self.watch_logdir = watch_logdir
        if checkpoint_path is None:
            if watch_logdir is None:
                raise ValueError("need checkpoint_path or watch_logdir")
            checkpoint_path = latest_checkpoint(watch_logdir)
            if checkpoint_path is None:
                raise ValueError(f"no .ntc checkpoints under {watch_logdir}")
        self.checkpoint_path = checkpoint_path
        self.poses, h, w, focal = resolve_render_poses(cfg, "render")
        model_coarse, model_fine, self.params_coarse, self.params_fine, ckpt = (
            load_models_and_params(checkpoint_path, cfg)
        )
        if checkpoint_path.endswith(".ckpt") and "height" in ckpt:
            # Optional hwf override keys (reference eval_nerf.py:138-143).
            h, w = int(ckpt["height"]), int(ckpt["width"])
            focal = float(ckpt["focal_length"])
        self.height, self.width, self.focal = h, w, focal
        settings = render_settings_from_config(cfg, "validation", hwf=(h, w, focal))
        self.settings = dataclasses.replace(
            settings,
            compute_dtype=precision,
            use_pallas=(renderer == "pallas"),
        )
        self.use_ndc = self.settings.use_ndc
        # Multi-device backends shard each frame's rays over the mesh (each
        # device generates + renders its slice; the out-spec sharding
        # reassembles the image) — same auto-scale-out behavior as the other
        # CLIs. Single device uses the serial pose renderer.
        import jax

        self.num_devices = len(jax.devices())
        if self.num_devices > 1:
            from nerf_tpu.parallel import make_mesh, make_parallel_pose_render_fn

            self._render = make_parallel_pose_render_fn(
                model_coarse, model_fine, self.settings, h, w, focal,
                make_mesh(), output="u8",
            )
        else:
            self._render = make_pose_render_fn(
                model_coarse, model_fine, self.settings, h, w, focal,
                output="u8",
            )
        self._jnp = jnp
        step = ckpt.get("step", ckpt.get("iter"))
        self.checkpoint_step = None if step is None else int(step)
        self.frames_served = 0
        self.last_render_s: Optional[float] = None
        # One chip, one render at a time: request handlers run in threads
        # (ThreadingHTTPServer), so the device pipeline — reload check +
        # param swap + render + latency bookkeeping — is serialized here.
        # Socket I/O (reading requests, writing PNGs to slow clients) stays
        # outside the lock and never blocks the device or /health.
        self._device_lock = threading.Lock()
        # Compile + warm before accepting traffic (first compile is ~40 s on
        # the remote relay; a cold first request would look like an outage).
        t0 = time.time()
        self.render_pose(self.poses[0])
        self.compile_s = time.time() - t0
        self.frames_served = 0

    def _maybe_reload(self) -> None:
        """Watch mode: pick up the newest checkpoint in the logdir, if any.

        A swapped pytree must match the compiled renderer's structure (same
        model config); a mismatched checkpoint raises from the renderer on
        the next call rather than being silently ignored."""
        if self.watch_logdir is None:
            return
        import jax

        from nerf_tpu.engine.checkpoint import latest_checkpoint, load_checkpoint

        newest = latest_checkpoint(self.watch_logdir)
        if newest is None or newest == self.checkpoint_path:
            return
        ckpt = load_checkpoint(newest)
        self.params_coarse = jax.tree.map(
            self._jnp.asarray, ckpt["params_coarse"]
        )
        self.params_fine = (
            jax.tree.map(self._jnp.asarray, ckpt["params_fine"])
            if ckpt.get("params_fine") is not None else None
        )
        self.checkpoint_path = newest
        step = ckpt.get("step")
        self.checkpoint_step = None if step is None else int(step)
        print(f"[serve] reloaded {newest} (step {self.checkpoint_step})",
              flush=True)

    def render_pose(self, pose) -> np.ndarray:
        """(3|4, 4) camera-to-world -> (H, W, 3) uint8."""
        pose = np.asarray(pose, np.float32)
        if pose.shape not in ((3, 4), (4, 4)):
            raise ValueError(f"pose must be (3, 4) or (4, 4), got {pose.shape}")
        with self._device_lock:
            self._maybe_reload()
            t0 = time.time()
            img = np.asarray(
                self._render(
                    self.params_coarse, self.params_fine,
                    self._jnp.asarray(pose[:3, :4]),
                )
            )
            self.last_render_s = time.time() - t0
            self.frames_served += 1
        return img

    def render_frame(self, index: int) -> np.ndarray:
        return self.render_pose(self.poses[index % len(self.poses)])

    def render_spherical(self, theta: float, phi: float,
                         radius: float) -> np.ndarray:
        if self.use_ndc:
            raise ValueError(
                "spherical orbit poses exit an NDC (forward-facing) scene's "
                "frustum; use frame= or POST /pose"
            )
        from nerf_tpu.data import pose_spherical

        return self.render_pose(pose_spherical(theta, phi, radius))

    def health(self) -> dict:
        return {
            "status": "ok",
            "devices": self.num_devices,
            "checkpoint": self.checkpoint_path,
            "checkpoint_step": self.checkpoint_step,
            "watching": self.watch_logdir,
            "height": self.height,
            "width": self.width,
            "focal": round(self.focal, 2),
            "ndc": bool(self.use_ndc),
            "trajectory_frames": int(len(self.poses)),
            "frames_served": self.frames_served,
            "compile_s": round(self.compile_s, 1),
            "last_render_s": (
                round(self.last_render_s, 3)
                if self.last_render_s is not None else None
            ),
        }


def _png_bytes(img: np.ndarray) -> bytes:
    import imageio.v2 as imageio

    buf = io.BytesIO()
    imageio.imwrite(buf, img, format="png")
    return buf.getvalue()


def make_handler(service: RenderService):
    class Handler(BaseHTTPRequestHandler):
        # A silent client (connected, never sends a request line) must not
        # hold its handler thread forever: close the connection after this
        # many seconds of socket inactivity.
        timeout = 120

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _respond(self, fn) -> None:
            """Shared error contract for GET and POST: client-caused
            failures -> structured 400; the watch-mode checkpoint-vanished
            race -> 503 (the newest checkpoint was pruned between the logdir
            listing and the open — retry next request, a newer one will be
            there)."""
            try:
                fn()
            except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
                # TypeError covers a non-object JSON body (body["pose"] on a
                # bare list) — still the client's malformed input, still 400.
                self._send_json(400, {"error": str(e)})
            except FileNotFoundError as e:
                self._send_json(503, {"error": f"checkpoint vanished: {e}"})

        def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
            url = urlparse(self.path)

            def handle():
                if url.path == "/":
                    html = viewer_html(service.use_ndc, len(service.poses))
                    self._send(200, html.encode(), "text/html")
                elif url.path == "/health":
                    self._send_json(200, service.health())
                elif url.path == "/render":
                    q = parse_qs(url.query)
                    if "frame" in q:
                        img = service.render_frame(int(q["frame"][0]))
                    else:
                        img = service.render_spherical(
                            float(q.get("theta", ["45"])[0]),
                            float(q.get("phi", ["-30"])[0]),
                            float(q.get("radius", ["4"])[0]),
                        )
                    self._send(200, _png_bytes(img), "image/png")
                else:
                    self._send_json(404, {"error": f"no route {url.path}"})

            self._respond(handle)

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/pose":
                self._send_json(404, {"error": f"no route {url.path}"})
                return

            def handle():
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
                img = service.render_pose(np.asarray(body["pose"], np.float32))
                self._send(200, _png_bytes(img), "image/png")

            self._respond(handle)

        def log_message(self, fmt, *fmt_args):
            print(f"[serve] {self.address_string()} {fmt % fmt_args}",
                  flush=True)

    return Handler


def serve(service: RenderService, host: str, port: int) -> ThreadingHTTPServer:
    """Bind and return the HTTP server; caller runs ``serve_forever()``.
    Threaded at the socket layer (one handler thread per connection, so a
    stalled client can't wedge /health) with device renders serialized by
    ``RenderService._device_lock``. Split from main() so tests can bind
    port 0 and drive the server from a thread."""
    class Server(ThreadingHTTPServer):
        daemon_threads = True  # a hung client thread never blocks exit

        def handle_error(self, request, client_address):
            # A client that disconnects mid-response (or times out mid-
            # request) is routine at this layer — one log line, no traceback.
            exc = sys.exception()
            if isinstance(exc, (BrokenPipeError, ConnectionResetError,
                                TimeoutError)):
                print(f"[serve] {client_address[0]} dropped: {exc!r}",
                      flush=True)
                return
            super().handle_error(request, client_address)

    return Server((host, port), make_handler(service))


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", type=str,
                     help="Serve this checkpoint (.ntc or reference .ckpt).")
    src.add_argument(
        "--logdir", type=str,
        help="Watch a training run's logdir: serve its newest .ntc "
             "checkpoint and hot-swap params when a newer one lands "
             "(zero recompilation — params are pytree args). A live view "
             "of a run in progress.",
    )
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8642)
    parser.add_argument("--precision", choices=["bfloat16", "float32"],
                        default="bfloat16",
                        help="Serving default is bfloat16 (fastest; "
                             "differences confined to silhouette-edge "
                             "pixels — docs/PARITY.md).")
    parser.add_argument("--renderer", choices=["pallas", "xla"],
                        default="pallas")
    parser.add_argument(
        "--overrides", type=str, nargs="*", default=None,
        help="Dotted-key config overrides, e.g. nerf.validation.num_coarse 32",
    )
    args = parser.parse_args()

    from nerf_tpu.config import load_config

    cfg = load_config(args.config, args.overrides)
    print("loading checkpoint + compiling renderer...", flush=True)
    service = RenderService(
        cfg, args.checkpoint, precision=args.precision,
        renderer=args.renderer, watch_logdir=args.logdir,
    )
    httpd = serve(service, args.host, args.port)
    h = service.health()
    print(
        f"serving {h['height']}x{h['width']} renders on "
        f"http://{args.host}:{httpd.server_address[1]}/ "
        f"(compile {h['compile_s']}s; open in a browser for the orbit viewer)",
        flush=True,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("\nshutting down")
        httpd.server_close()


if __name__ == "__main__":
    main()
