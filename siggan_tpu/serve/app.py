"""Control-panel web app — the reference's Streamlit UI, framework-free.

Parity target: ``app_vanilla_gan_signatures.py`` (reference #17, 2530 LoC of
Streamlit). Streamlit is not available in this environment, so the panel is a
self-contained single-page app (``static/index.html``, zero external assets)
served by the same stdlib HTTP stack as the REST API, with JSON endpoints for
each page's logic. Functional parity map:

 - Generate page (:911): checkpoint dropdown over TRUSTED ROOTS only
   (checkpoints/ + runs/, :118-137), seeded batched generation with
   noise-scale, discriminator-scored oversample-and-keep-best quality filter
   (:1362-1383), gallery thumbnails, latent morphing strip (:1631-1719).
 - Preprocess page (:1721): runs the preprocess CLI as a subprocess (:1772).
 - Train page (:1801): spawns the training CLI as a logged subprocess
   (:1936-1992), stop-file stop (:1994-2004), 2 s auto-refresh monitor with
   progress, metric tiles, SVG loss chart, latest sample, log tail
   (:2030-2229), run-history browser (:2231-2324), PID-liveness reattach
   after a browser reload (:1909-1915).
 - About page (:2326): device + version info.

The checkpoint trust model is preserved: only directories under the
configured roots are loadable; arbitrary paths are rejected.
"""

from __future__ import annotations

import base64
import io
import json
import subprocess
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional

from siggan_tpu.serve import monitor

STATIC_DIR = Path(__file__).parent / "static"


class AppCore:
    def __init__(self, workdir: str | Path = "."):
        self.workdir = Path(workdir).absolute()
        self.trusted_roots = [self.workdir / "checkpoints", self.workdir / "runs"]
        self._sessions: Dict[str, Any] = {}
        self._lock = threading.Lock()
        self._preprocess_jobs: Dict[str, Dict] = {}

    # -- checkpoint discovery + trust (app…py:118-151, :942-1028) ---------
    def find_checkpoints(self) -> List[Dict[str, Any]]:
        found = []
        for root in self.trusted_roots:
            if not root.is_dir():
                continue
            for idx in sorted(root.rglob("index.json")):
                ckpt_dir = idx.parent
                try:
                    index = json.loads(idx.read_text())
                except json.JSONDecodeError:
                    continue
                if "epochs" not in index:
                    continue
                found.append({
                    "path": str(ckpt_dir.relative_to(self.workdir)),
                    "epochs": index.get("epochs", []),
                    "latest": index.get("latest"),
                    "best": index.get("best"),
                })
        return found

    def _validate_checkpoint(self, rel_path: str) -> Path:
        p = (self.workdir / rel_path).resolve()
        for root in self.trusted_roots:
            try:
                p.relative_to(root.resolve())
                return p
            except ValueError:
                continue
        raise PermissionError(
            f"checkpoint path {rel_path!r} is outside the trusted roots "
            f"(checkpoints/, runs/)")

    def _session(self, rel_path: str, which: str = "latest"):
        key = f"{rel_path}@{which}"
        with self._lock:
            if key not in self._sessions:
                from siggan_tpu.infer.generate import load_session
                path = self._validate_checkpoint(rel_path)
                self._sessions[key] = load_session(str(path), which)
            return self._sessions[key]

    # -- generate page -----------------------------------------------------
    def generate(self, body: Dict[str, Any]) -> Dict[str, Any]:
        rel = body["checkpoint"]
        which = body.get("which", "latest")
        n = max(1, min(int(body.get("n", 16)), 256))
        seed = int(body.get("seed", 42))
        noise_scale = float(body.get("noise_scale", 1.0))
        quality_filter = bool(body.get("quality_filter", False))
        keep_fraction = float(body.get("keep_fraction", 0.5))

        session = self._session(rel, which)
        if quality_filter:
            # Oversample and keep the D-highest-scored (app…py:1362-1383).
            n_gen = min(int(n / max(keep_fraction, 0.05)), 512)
            images = session.sample(n_gen, seed=seed, noise_scale=noise_scale)
            scores = self._d_scores(rel, which, images)
            order = scores.argsort()[::-1][:n]
            images, scores = images[order], scores[order]
        else:
            images = session.sample(n, seed=seed, noise_scale=noise_scale)
            scores = None

        out_dir = self.workdir / "samples" / f"gen_{time.strftime('%Y%m%d_%H%M%S')}"
        from siggan_tpu.infer.export import save_pngs
        paths = save_pngs(images, out_dir)
        return {
            "count": len(paths),
            "output_dir": str(out_dir),
            "output_rel": str(out_dir.relative_to(self.workdir)),
            "thumbnails": [_b64_png(img) for img in images[:64]],
            "scores": [float(s) for s in scores] if scores is not None else None,
        }

    def _d_scores(self, rel: str, which, images):
        from siggan_tpu.ckpt.manager import CheckpointManager
        path = self._validate_checkpoint(rel)
        cfg = CheckpointManager.load_config(path)
        mgr = CheckpointManager(path, cfg)
        state, _ = mgr.restore(which)
        session = self._session(rel, which)
        return session.score_with_discriminator(
            images, state.d_params, state.d_state, cfg.model)

    def interpolate(self, body: Dict[str, Any]) -> Dict[str, Any]:
        session = self._session(body["checkpoint"], body.get("which", "latest"))
        frames = session.interpolate(seed=int(body.get("seed", 0)),
                                     steps=max(2, min(int(body.get("steps", 10)), 32)))
        return {"frames": [_b64_png(f) for f in frames]}

    # -- preprocess page ----------------------------------------------------
    def preprocess(self, body: Dict[str, Any]) -> Dict[str, Any]:
        input_dir = body["input_dir"]
        output_dir = body.get("output_dir") or str(
            self.workdir / "data" / "preprocessed")
        args = [sys.executable, "-m", "siggan_tpu.cli.preprocess",
                "--input_dir", input_dir, "--output_dir", output_dir]
        if body.get("binarize"):
            args.append("--binarize")
        log = self.workdir / "logs" / "preprocess.log"
        log.parent.mkdir(parents=True, exist_ok=True)
        with open(log, "ab") as lf:
            proc = subprocess.Popen(args, stdout=lf, stderr=subprocess.STDOUT)
        job = {"pid": proc.pid, "log": str(log), "output_dir": output_dir,
               "started": time.time()}
        self._preprocess_jobs[str(proc.pid)] = job
        return job

    def preprocess_status(self, pid: str) -> Dict[str, Any]:
        job = self._preprocess_jobs.get(pid)
        if not job:
            return {"error": "unknown job"}
        return {**job, "alive": monitor.pid_alive(int(pid)),
                "log_tail": monitor.tail_file(job["log"], 15)}

    # -- train page -----------------------------------------------------------
    def train_start(self, body: Dict[str, Any]) -> Dict[str, Any]:
        existing = monitor.read_training_state(self.workdir)
        if existing and existing["alive"]:
            return {"error": "a training run is already active",
                    "state": existing}
        monitor.clear_stale_state(self.workdir)
        run_name = body.get("run_name") or time.strftime("run_%Y%m%d_%H%M%S")
        run_dir = self.workdir / "runs" / run_name
        extra: List[str] = []
        for flag in ("epochs", "batch_size", "latent_dim", "image_size",
                     "seed", "sample_interval", "checkpoint_interval",
                     "n_critic", "g_lr", "d_lr", "label_smoothing"):
            if flag in body:
                extra += [f"--{flag}", str(body[flag])]
        if body.get("spectral_norm"):
            extra.append("--spectral_norm")
        return monitor.launch_training(run_dir, body["data_dir"], extra,
                                       self.workdir)

    def train_status(self) -> Dict[str, Any]:
        status = monitor.run_status(self.workdir)
        if status.get("latest_sample"):
            try:
                status["latest_sample_b64"] = base64.b64encode(
                    Path(status["latest_sample"]).read_bytes()).decode()
            except OSError:
                pass
        return status

    def train_stop(self) -> Dict[str, Any]:
        return {"stopped": monitor.request_stop(self.workdir)}

    def export_zip(self, rel_dir: str) -> bytes:
        """ZIP a generation output directory (app…py:617-658 export parity).
        Only directories under workdir/samples are served."""
        root = (self.workdir / "samples").resolve()
        p = (self.workdir / rel_dir).resolve()
        try:
            p.relative_to(root)
        except ValueError:
            raise PermissionError(f"{rel_dir!r} is outside samples/")
        if not p.is_dir():
            raise FileNotFoundError(rel_dir)
        import io
        import zipfile
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for f in sorted(p.glob("*.png")):
                zf.write(f, f.name)
        return buf.getvalue()

    def runs(self) -> List[Dict[str, Any]]:
        return monitor.list_runs(self.workdir / "runs")

    def about(self) -> Dict[str, Any]:
        import siggan_tpu
        from siggan_tpu.core.platform import device_info
        return {"version": siggan_tpu.__version__, **device_info(),
                "workdir": str(self.workdir)}


def _b64_png(img) -> str:
    from siggan_tpu.infer.export import png_bytes
    return base64.b64encode(png_bytes(img)).decode()


# -- HTTP plumbing -------------------------------------------------------------

def make_handler(core: AppCore):
    routes_get = {
        "/api/checkpoints": lambda q: core.find_checkpoints(),
        "/api/train/status": lambda q: core.train_status(),
        "/api/runs": lambda q: core.runs(),
        "/api/about": lambda q: core.about(),
    }
    routes_post = {
        "/api/generate": core.generate,
        "/api/interpolate": core.interpolate,
        "/api/preprocess": core.preprocess,
        "/api/train/start": core.train_start,
        "/api/train/stop": lambda body: core.train_stop(),
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, status: int, obj) -> None:
            payload = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path in ("/", "/index.html"):
                page = (STATIC_DIR / "index.html").read_bytes()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)
                return
            if path.startswith("/api/preprocess/status/"):
                self._json(200, core.preprocess_status(path.rsplit("/", 1)[-1]))
                return
            if path.startswith("/api/export"):
                from urllib.parse import parse_qs, urlparse
                q = parse_qs(urlparse(self.path).query)
                rel = (q.get("dir") or [""])[0]
                try:
                    payload = core.export_zip(rel)
                except PermissionError as e:
                    self._json(403, {"detail": str(e)})
                    return
                except FileNotFoundError as e:
                    self._json(404, {"detail": f"not found: {e}"})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/zip")
                self.send_header("Content-Disposition",
                                 "attachment; filename=signatures.zip")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            fn = routes_get.get(path)
            if fn is None:
                self._json(404, {"detail": "not found"})
                return
            try:
                self._json(200, fn(None))
            except Exception as e:
                self._json(500, {"detail": f"{type(e).__name__}: {e}"})

        def do_POST(self):
            fn = routes_post.get(self.path.split("?")[0])
            if fn is None:
                self._json(404, {"detail": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length") or 0)
                body = json.loads(self.rfile.read(length) or b"{}")
                self._json(200, fn(body))
            except PermissionError as e:
                self._json(403, {"detail": str(e)})
            except (KeyError, ValueError) as e:
                self._json(422, {"detail": f"{type(e).__name__}: {e}"})
            except Exception as e:
                self._json(500, {"detail": f"{type(e).__name__}: {e}"})

    return Handler


def serve(host: str = "0.0.0.0", port: int = 8501,
          workdir: str | Path = ".") -> ThreadingHTTPServer:
    core = AppCore(workdir)
    server = ThreadingHTTPServer((host, port), make_handler(core))
    server.core = core
    return server
