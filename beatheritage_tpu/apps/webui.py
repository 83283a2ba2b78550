"""Web UI: browser front-end for generation and MaiMod review.

(reference: web-ui.py Flask routes /start_inference, /stream_output SSE,
/cancel_inference, /validate_paths + template/index.html + static/app.js,
and mai_mod_ui.py — the generation itself runs as a subprocess of the CLI
so the UI stays responsive and cancel is a process kill.) Flask is not in
this image, so this uses the stdlib http.server with the same route
surface; the front-end lives in webui_static/.
"""

from __future__ import annotations

from . import excepthook  # noqa: F401  (reference: excepthook.py — friendly error hints)

import json
import mimetypes
import os
import platform
import re
import subprocess
import sys
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from ..config import DEFAULT_CONFIG_DIR

STATIC_DIR = Path(__file__).resolve().parent / "webui_static"
# run logs live here so /open_log_file has a fixed, checkable root
# (reference web-ui.py:451 restricts to its script_dir/logs the same way)
LOG_DIR = Path(os.environ.get(
    "BH_WEBUI_LOG_DIR",
    Path.home() / ".local" / "state" / "beatheritage_tpu" / "logs"))
# saved form presets (/save_config). The reference writes config_data to any
# client-supplied file_path (web-ui.py:488); we deliberately confine writes
# to this directory and keep only the basename of a supplied path.
PRESETS_DIR = Path(os.environ.get(
    "BH_WEBUI_PRESET_DIR",
    Path.home() / ".config" / "beatheritage_tpu" / "presets"))


class InferenceProcess:
    """Holds the running CLI subprocess (reference web-ui.py:163,366).

    A pump thread tees the child's output into a timestamped log file under
    LOG_DIR and an in-memory line buffer that /stream_output follows, so the
    full log survives the stream (reference logs to script_dir/logs)."""

    RESULT_RE = re.compile(
        r"saved to (.*\.osu)|Added generated content to (.*\.osu)")

    def __init__(self):
        self.proc: subprocess.Popen | None = None
        self.lock = threading.Lock()
        self.log_path: Path | None = None
        self.result_path: Path | None = None
        self._lines: list[str] = []
        self._pump_thread: threading.Thread | None = None

    def start(self, module: str, args: list[str]) -> None:
        with self.lock:
            self.cancel()
            LOG_DIR.mkdir(parents=True, exist_ok=True)
            self.log_path = LOG_DIR / time.strftime("run_%Y%m%d_%H%M%S.log")
            self.result_path = None
            self._lines = []
            self.proc = subprocess.Popen(
                [sys.executable, "-m", module] + args,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                bufsize=1)
            self._pump_thread = threading.Thread(target=self._pump,
                                                 daemon=True)
            self._pump_thread.start()

    def _pump(self) -> None:
        proc, lines = self.proc, self._lines
        with open(self.log_path, "w", encoding="utf-8") as f:
            for line in proc.stdout:
                f.write(line)
                f.flush()
                m = self.RESULT_RE.search(line)
                if m:
                    # the ONLY path /result_beatmap will serve: the file the
                    # run itself reported, never a client-supplied path
                    self.result_path = Path(m.group(1) or m.group(2))
                lines.append(line)
            proc.wait()
            tail = f"\n[exit code {proc.returncode}]\n"
            f.write(tail)
            lines.append(tail)

    def cancel(self) -> None:
        if self.proc is not None and self.proc.poll() is None:
            self.proc.kill()

    def stream(self):
        if self.proc is None:
            yield "no inference running\n"
            return
        lines, pump = self._lines, self._pump_thread
        i = 0
        while True:
            while i < len(lines):
                yield lines[i]
                i += 1
            if pump is None or not pump.is_alive():
                while i < len(lines):
                    yield lines[i]
                    i += 1
                return
            time.sleep(0.05)


STATE = InferenceProcess()
MAIMOD_JSON = Path(tempfile.gettempdir()) / "bh_maimod_result.json"


def _open_in_file_manager(path: Path) -> None:
    """Ask the desktop to open a folder/file (reference web-ui.py:436-444)."""
    system = platform.system()
    if system == "Windows":
        os.startfile(os.path.normpath(str(path)))  # noqa: S606
    elif system == "Darwin":
        subprocess.Popen(["open", str(path)])
    else:
        subprocess.Popen(["xdg-open", str(path)])


def _preset_path(name: str) -> Path:
    """Presets are confined to PRESETS_DIR; any directory part of a
    client-supplied path is dropped."""
    stem = Path(name).stem or "preset"
    safe = "".join(c for c in stem if c.isalnum() or c in "-_ ")[:64] or "preset"
    return PRESETS_DIR / f"{safe}.json"


AUDIO_EXTS = (".wav", ".mp3", ".ogg", ".flac", ".m4a")


def browse_dir(raw: str, kind: str) -> dict:
    """Directory listing for the in-browser file picker.

    The reference client browses via native pywebview dialogs
    (static/app.js FileBrowser -> window.pywebview.api.browse_file);
    this serves the same capability to a plain browser. The desktop
    shell still prefers the native dialogs when pywebview is present.
    `kind` filters files: audio extensions, .osu, or everything."""
    base = (Path(raw).expanduser() if raw else Path.home()).resolve()
    if not base.is_dir():
        raise FileNotFoundError(f"not a directory: {base}")
    dirs: list[str] = []
    files: list[str] = []
    for p in sorted(base.iterdir(), key=lambda p: p.name.lower()):
        if p.name.startswith("."):
            continue
        try:
            if p.is_dir():
                dirs.append(p.name)
            elif kind == "audio" and p.suffix.lower() in AUDIO_EXTS:
                files.append(p.name)
            elif kind == "osu" and p.suffix.lower() == ".osu":
                files.append(p.name)
            elif kind not in ("audio", "osu", "dir"):
                files.append(p.name)
        except OSError:  # dangling symlink etc.
            continue
    return {"dir": str(base),
            "parent": str(base.parent) if base.parent != base else None,
            "dirs": dirs[:500], "files": files[:500]}


def validate_path_kind(path: str, kind: str) -> tuple[bool, str]:
    """Path validation matching the reference UI's checks
    (web-ui.py:514 validate_paths)."""
    p = Path(path)
    if not p.is_file():
        return False, "file does not exist"
    if kind == "osu" and p.suffix.lower() != ".osu":
        return False, "beatmap must be a .osu file"
    if kind == "file" and p.suffix.lower() not in AUDIO_EXTS:
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


def model_capabilities(config_name: str) -> dict:
    """Per-model UI capabilities, introspected from the model's own train
    config instead of the reference's hardcoded JS table
    (static/app.js modelCapabilities): which gamemodes the model was
    trained on, and whether year/hitsound/descriptor conditioning exists."""
    try:
        from ..config import InferenceConfig, load_config  # noqa: PLC0415
        args = load_config(InferenceConfig, "inference", config_name)
        d = args.train.data
        return {
            "supported_gamemodes": [int(g) for g in (d.gamemodes or [0])],
            "supports_year": bool(d.add_year_token),
            "supports_hitsounds": bool(d.add_hitsounded_token),
            "supports_descriptors": bool(d.add_descriptors),
            "supports_mapper": True,
            "in_context_options": list_context_options(config_name),
        }
    except Exception:
        return {}


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
        elif path == "/maimod":
            # standalone MaiMod review app (reference mai_mod_ui.py:146)
            self._send(200, (STATIC_DIR / "maimod.html").read_text())
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
        elif path == "/capabilities":
            self._json(model_capabilities(q.get("config", ["default"])[0]))
        elif path == "/maimod_result":
            if MAIMOD_JSON.is_file():
                self._send(200, MAIMOD_JSON.read_text(), "application/json")
            else:
                self._json([])
        elif path == "/result_beatmap":
            # the generated .osu for the in-browser preview canvas; serves
            # ONLY the path the last run itself reported (no client paths)
            rp = STATE.result_path
            if rp is not None and rp.suffix == ".osu" and rp.is_file():
                self._send(200, rp.read_text(encoding="utf-8",
                                             errors="replace"),
                           "text/plain; charset=utf-8")
            else:
                self._json({"error": "no generated beatmap available"}, 404)
        elif path == "/open_folder":
            # (reference web-ui.py:413) open a folder in the file explorer
            folder = q.get("folder", [""])[0]
            if not folder:
                self._json({"status": "error",
                            "message": "No folder path specified"}, 400)
                return
            target = Path(folder).expanduser().resolve()
            if not target.is_dir():
                self._json({"status": "error",
                            "message": "Invalid or non-existent folder path "
                                       "specified"}, 400)
                return
            try:
                _open_in_file_manager(target)
                self._json({"status": "success",
                            "message": "Folder open request sent."})
            except Exception as e:  # opener missing on headless hosts
                self._json({"status": "error",
                            "message": f"Could not open folder: {e}"}, 500)
        elif path == "/open_log_file":
            # (reference web-ui.py:451) strictly confined to LOG_DIR
            raw = q.get("path", [""])[0] or (
                str(STATE.log_path) if STATE.log_path else "")
            if not raw:
                self._json({"status": "error",
                            "message": "No log file path specified"}, 400)
                return
            log_root = LOG_DIR.resolve()
            target = Path(raw).expanduser().resolve()
            if log_root not in target.parents:
                self._json({"status": "error",
                            "message": "Access denied: File is outside the "
                                       "designated logs directory."}, 403)
                return
            if not target.is_file():
                self._json({"status": "error",
                            "message": "Log file not found."}, 404)
                return
            try:
                _open_in_file_manager(target)
                self._json({"status": "success",
                            "message": "Log file open request sent."})
            except Exception as e:
                self._json({"status": "error",
                            "message": f"Could not open log file: {e}"}, 500)
        elif path == "/logs":
            logs = sorted(LOG_DIR.glob("*.log")) if LOG_DIR.is_dir() else []
            self._json([str(p) for p in logs[-50:]])
        elif path == "/list_presets":
            presets = (sorted(p.stem for p in PRESETS_DIR.glob("*.json"))
                       if PRESETS_DIR.is_dir() else [])
            self._json(presets)
        elif path == "/browse":
            try:
                self._json(browse_dir(q.get("dir", [""])[0],
                                      q.get("filter", ["all"])[0]))
            except (OSError, FileNotFoundError) as e:
                self._json({"error": str(e)}, 400)
        elif path == "/load_config":
            name = q.get("name", [""])[0]
            p = _preset_path(name)
            if not name or not p.is_file():
                self._json({"error": "preset not found"}, 404)
                return
            self._send(200, p.read_text(), "application/json")
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
        elif path == "/save_config":
            # (reference web-ui.py:488) both shapes are accepted: the
            # reference's {file_path, config_data} text write and the
            # client's {name, form} JSON preset; writes stay in PRESETS_DIR
            form = json.loads(body)
            name = form.get("name") or form.get("file_path") or ""
            payload = form.get("form")
            if payload is None and form.get("config_data") is not None:
                try:
                    payload = json.loads(form["config_data"])
                except (TypeError, ValueError):
                    payload = {"config_data": form["config_data"]}
            if not name or payload is None:
                self._json({"success": False,
                            "error": "Missing required parameters"})
                return
            p = _preset_path(name)
            PRESETS_DIR.mkdir(parents=True, exist_ok=True)
            p.write_text(json.dumps(payload, indent=2))
            self._json({"success": True, "file_path": str(p),
                        "message": "Configuration saved successfully"})
        elif path == "/delete_preset":
            form = json.loads(body)
            name = form.get("name") or ""
            p = _preset_path(name)
            if not name or not p.is_file():
                self._json({"success": False, "error": "preset not found"},
                           404)
                return
            p.unlink()
            self._json({"success": True})
        elif path == "/validate_paths":
            # (reference web-ui.py:514) validate + autofill via the same
            # logic the CLI uses (inference/pipeline.py autofill_paths)
            from ..config import InferenceConfig  # noqa: PLC0415
            from ..inference.pipeline import autofill_paths  # noqa: PLC0415
            form = json.loads(body)
            args = InferenceConfig()
            args.audio_path = (form.get("audio_path") or "").strip()
            args.beatmap_path = (form.get("beatmap_path") or "").strip()
            args.output_path = (form.get("output_path") or "").strip()
            result = autofill_paths(args)
            errors = result.get("errors", []) if isinstance(result, dict) else []
            self._json({"success": not errors, "errors": errors,
                        "audio_path": args.audio_path,
                        "beatmap_path": args.beatmap_path,
                        "output_path": args.output_path})
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
