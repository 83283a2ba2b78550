"""Web UI: browser front-end for generation and MaiMod review.

(reference: web-ui.py Flask routes /start_inference, /stream_output SSE,
/cancel_inference, /validate_paths + template/index.html + static/app.js,
and mai_mod_ui.py — the generation itself runs as a subprocess of the CLI
so the UI stays responsive and cancel is a process kill.) Flask is not in
this image, so this uses the stdlib http.server with the same route
surface; the front-end lives in webui_static/.
"""

from __future__ import annotations

import json
import mimetypes
import subprocess
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from ..config import DEFAULT_CONFIG_DIR

STATIC_DIR = Path(__file__).resolve().parent / "webui_static"


class InferenceProcess:
    """Holds the running CLI subprocess (reference web-ui.py:163,366)."""

    def __init__(self):
        self.proc: subprocess.Popen | None = None
        self.lock = threading.Lock()

    def start(self, module: str, args: list[str]) -> None:
        with self.lock:
            self.cancel()
            self.proc = subprocess.Popen(
                [sys.executable, "-m", module] + args,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                bufsize=1)

    def cancel(self) -> None:
        if self.proc is not None and self.proc.poll() is None:
            self.proc.kill()

    def stream(self):
        proc = self.proc
        if proc is None or proc.stdout is None:
            yield "no inference running\n"
            return
        for line in proc.stdout:
            yield line
        proc.wait()
        yield f"\n[exit code {proc.returncode}]\n"


STATE = InferenceProcess()
MAIMOD_JSON = Path(tempfile.gettempdir()) / "bh_maimod_result.json"


def validate_path_kind(path: str, kind: str) -> tuple[bool, str]:
    """Path validation matching the reference UI's checks
    (web-ui.py:514 validate_paths)."""
    p = Path(path)
    if not p.is_file():
        return False, "file does not exist"
    if kind == "osu" and p.suffix.lower() != ".osu":
        return False, "beatmap must be a .osu file"
    if kind == "file" and p.suffix.lower() not in (
            ".wav", ".mp3", ".ogg", ".flac", ".m4a"):
        return False, f"unsupported audio extension {p.suffix}"
    return True, ""


def list_models() -> list[str]:
    """Inference presets for the model dropdown (reference web-ui.py:146-549
    offers v28..beatheritage_v1 + tiny variants)."""
    names = sorted(p.stem for p in (DEFAULT_CONFIG_DIR / "inference").glob("*.yaml"))
    # surface the flagship presets first
    front = [n for n in ("beatheritage_v1", "v31", "v30", "v29", "v28") if n in names]
    return front + [n for n in names if n not in front]


def list_descriptors(config_name: str) -> list[str]:
    """Descriptor vocabulary of the selected model's tokenizer (empty when
    the model has no descriptor conditioning or no trained tokenizer)."""
    try:
        from ..config import InferenceConfig, load_config  # noqa: PLC0415
        from ..inference.pipeline import load_tokenizer  # noqa: PLC0415
        args = load_config(InferenceConfig, "inference", config_name)
        if not args.train.data.add_descriptors:
            return []
        return sorted(load_tokenizer(args).descriptor_idx)
    except Exception:
        return []


def list_context_options(config_name: str) -> list[str]:
    """Context types the selected model was trained with in-context
    (drives the reference UI's in-context checkbox group)."""
    try:
        from ..config import InferenceConfig, load_config  # noqa: PLC0415
        args = load_config(InferenceConfig, "inference", config_name)
        opts: list[str] = []
        for ctx in args.train.data.context_types or []:
            ins = ctx.get("in", []) if isinstance(ctx, dict) else ctx.in_context
            for c in ins:
                name = getattr(c, "value", str(c))
                if name not in opts and name != "none":
                    opts.append(name)
        return opts
    except Exception:
        return []


# form field -> hydra-style override key, passed through verbatim when set
SCALAR_FIELDS = (
    "audio_path", "output_path", "beatmap_path", "gamemode", "difficulty",
    "mapper_id", "year", "cfg_scale", "seed", "temperature", "top_p",
    "hp_drain_rate", "circle_size", "overall_difficulty", "approach_rate",
    "slider_multiplier", "slider_tick_rate", "keycount", "hold_note_ratio",
    "scroll_speed_ratio", "start_time", "end_time",
)
BOOL_FIELDS = ("super_timing", "add_to_beatmap", "export_osz", "use_server",
               "hitsounded")


def build_overrides(form: dict) -> tuple[str, list[str]]:
    """Translate the UI form into CLI overrides (reference
    web-ui.py:154-282 start_inference arg assembly)."""
    config = form.get("config") or "default"
    overrides = []
    for key in SCALAR_FIELDS:
        value = form.get(key)
        if value not in (None, "", False):
            overrides.append(f"{key}={value}")
    for key in BOOL_FIELDS:
        if key in form:
            overrides.append(f"{key}={'true' if form[key] else 'false'}")
    selected = list(form.get("descriptor_select") or [])
    typed = [d.strip() for d in (form.get("descriptors") or "").split(",")
             if d.strip()]
    descriptors = selected + [d for d in typed if d not in selected]
    if descriptors:
        overrides.append(f"descriptors=[{','.join(descriptors)}]")
    negative = [d.strip() for d in
                (form.get("negative_descriptors") or "").split(",")
                if d.strip()]
    if negative:
        overrides.append(f"negative_descriptors=[{','.join(negative)}]")
    in_ctx = list(form.get("in_context_options") or [])
    if in_ctx:
        overrides.append(f"in_context=[{','.join(['none'] + in_ctx)}]")
    if form.get("extra"):
        overrides.extend(str(form["extra"]).split())
    return config, overrides


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet
        pass

    def _send(self, code, body, ctype="text/html"):
        data = body.encode() if isinstance(body, str) else body
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _json(self, obj, code=200):
        self._send(code, json.dumps(obj), "application/json")

    def do_GET(self):
        path = urlparse(self.path).path
        q = parse_qs(urlparse(self.path).query)
        if path == "/":
            self._send(200, (STATIC_DIR / "index.html").read_text())
        elif path.startswith("/static/"):
            f = STATIC_DIR / Path(path).name  # flat dir; no traversal
            if f.is_file():
                ctype = mimetypes.guess_type(f.name)[0] or "text/plain"
                self._send(200, f.read_bytes(), ctype)
            else:
                self._send(404, "not found")
        elif path == "/models":
            self._json(list_models())
        elif path == "/stream_output":
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for line in STATE.stream():
                chunk = line.encode()
                self.wfile.write(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                self.wfile.flush()
            self.wfile.write(b"0\r\n\r\n")
        elif path == "/validate_path":
            p = q.get("path", [""])[0]
            kind = q.get("kind", ["file"])[0]
            valid, reason = validate_path_kind(p, kind)
            self._json({"exists": Path(p).is_file(), "valid": valid,
                        "reason": reason})
        elif path == "/descriptors":
            self._json(list_descriptors(q.get("config", ["default"])[0]))
        elif path == "/context_options":
            self._json(list_context_options(q.get("config", ["default"])[0]))
        elif path == "/maimod_result":
            if MAIMOD_JSON.is_file():
                self._send(200, MAIMOD_JSON.read_text(), "application/json")
            else:
                self._json([])
        else:
            self._send(404, "not found")

    def do_POST(self):
        path = urlparse(self.path).path
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode() if length else "{}"
        if path == "/start_inference":
            form = json.loads(body)
            audio = form.get("audio_path") or ""
            ok, reason = validate_path_kind(audio, "file")
            if not ok:
                self._json({"error": f"audio_path: {reason}"}, 400)
                return
            bm = form.get("beatmap_path") or ""
            if bm:
                ok, reason = validate_path_kind(bm, "osu")
                if not ok:
                    self._json({"error": f"beatmap_path: {reason}"}, 400)
                    return
            config, overrides = build_overrides(form)
            STATE.start("beatheritage_tpu.apps.cli", ["-cn", config] + overrides)
            self._json({"started": True})
        elif path == "/start_maimod":
            form = json.loads(body)
            bm = form.get("beatmap_path") or ""
            ok, reason = validate_path_kind(bm, "osu")
            if not ok:
                self._json({"error": f"beatmap_path: {reason}"}, 400)
                return
            MAIMOD_JSON.unlink(missing_ok=True)
            overrides = [f"beatmap_path={bm}", f"json_path={MAIMOD_JSON}"]
            if form.get("audio_path"):
                overrides.append(f"audio_path={form['audio_path']}")
            config = form.get("config") or "default"
            STATE.start("beatheritage_tpu.apps.maimod",
                        ["-cn", config] + overrides)
            self._json({"started": True})
        elif path in ("/cancel", "/cancel_inference"):
            STATE.cancel()
            self._json({"cancelled": True})
        else:
            self._send(404, "not found")


def main(argv=None) -> int:
    import argparse  # noqa: PLC0415
    parser = argparse.ArgumentParser(description="beatheritage web UI")
    parser.add_argument("--port", type=int, default=9727)
    parser.add_argument("--host", default="127.0.0.1")
    ns = parser.parse_args(argv)
    server = ThreadingHTTPServer((ns.host, ns.port), Handler)
    print(f"BeatHeritage TPU UI on http://{ns.host}:{ns.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
