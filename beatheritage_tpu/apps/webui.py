"""Web UI: browser front-end for inference.

(reference: web-ui.py — Flask + pywebview with /start_inference,
/stream_output SSE, /cancel, path validation; the generation itself runs as
a subprocess of the CLI so the UI stays responsive.) Flask is not in this
image, so this uses the stdlib http.server with the same route surface.
"""

from __future__ import annotations

import html
import json
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from ..config import DEFAULT_CONFIG_DIR

PAGE = """<!DOCTYPE html>
<html><head><title>BeatHeritage TPU</title>
<style>
body {{ font-family: sans-serif; max-width: 760px; margin: 2em auto; background: #1b1b22; color: #eee; }}
label {{ display: block; margin-top: .8em; }}
input, select {{ width: 100%; padding: .4em; background: #2b2b33; color: #eee; border: 1px solid #555; }}
button {{ margin-top: 1em; padding: .6em 2em; background: #e64a8a; color: white; border: 0; cursor: pointer; }}
pre {{ background: #111; padding: 1em; height: 300px; overflow-y: scroll; white-space: pre-wrap; }}
</style></head>
<body>
<h1>BeatHeritage TPU</h1>
<form id="f">
<label>Model config <select name="config">{configs}</select></label>
<label>Audio path <input name="audio_path" placeholder="/path/to/song.mp3" data-validate="file"></label>
<label>Output path <input name="output_path" placeholder="/path/to/output"></label>
<label>Beatmap path (optional reference) <input name="beatmap_path" data-validate="osu"></label>
<label>Gamemode <select name="gamemode"><option value="">auto</option>
<option value="0">osu!</option><option value="1">taiko</option>
<option value="2">catch</option><option value="3">mania</option></select></label>
<label>Difficulty <input name="difficulty" placeholder="5.5"></label>
<label>Mapper ID <input name="mapper_id"></label>
<label>Year <input name="year"></label>
<label>Descriptors <select name="descriptor_select" id="descsel" multiple size="5">
</select></label>
<label>Extra descriptors (comma separated) <input name="descriptors"></label>
<label>Negative descriptors (comma separated) <input name="negative_descriptors"></label>
<label>CFG scale <input name="cfg_scale" value="1.0"></label>
<label>Extra overrides <input name="extra" placeholder="super_timing=true temperature=0.9"></label>
<button type="submit">Generate</button>
<button type="button" onclick="fetch('/cancel', {{method: 'POST'}})">Cancel</button>
</form>
<pre id="log"></pre>
<script>
const f = document.getElementById('f'), log = document.getElementById('log');
const descsel = document.getElementById('descsel');

// live path validation: green/red border via /validate_path
for (const el of document.querySelectorAll('input[data-validate]')) {{
  el.onblur = async () => {{
    if (!el.value) {{ el.style.borderColor = '#555'; return; }}
    const r = await fetch('/validate_path?kind=' + el.dataset.validate +
                          '&path=' + encodeURIComponent(el.value));
    const j = await r.json();
    el.style.borderColor = j.valid ? '#3c9' : '#e44';
    el.title = j.valid ? '' : j.reason;
  }};
}}

// descriptor options come from the selected model's tokenizer
async function loadDescriptors() {{
  const cfg = f.elements['config'].value;
  const r = await fetch('/descriptors?config=' + encodeURIComponent(cfg));
  const names = await r.json();
  descsel.innerHTML = names.map(n =>
    `<option value="${{n}}">${{n}}</option>`).join('');
  descsel.parentElement.style.display = names.length ? '' : 'none';
}}
f.elements['config'].onchange = loadDescriptors;
loadDescriptors();

f.onsubmit = async (e) => {{
  e.preventDefault();
  log.textContent = '';
  const data = Object.fromEntries(new FormData(f));
  data.descriptor_select = [...descsel.selectedOptions].map(o => o.value);
  const r = await fetch('/start_inference', {{method: 'POST', headers: {{'Content-Type': 'application/json'}}, body: JSON.stringify(data)}});
  if (!r.ok) {{ log.textContent = 'error: ' + (await r.json()).error; return; }}
  const resp = await fetch('/stream_output');
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  while (true) {{
    const {{done, value}} = await reader.read();
    if (done) break;
    log.textContent += dec.decode(value);
    log.scrollTop = log.scrollHeight;
  }}
}};
</script>
</body></html>"""


class InferenceProcess:
    """Holds the running CLI subprocess (reference web-ui.py:163,366)."""

    def __init__(self):
        self.proc: subprocess.Popen | None = None
        self.lock = threading.Lock()

    def start(self, args: list[str]) -> None:
        with self.lock:
            self.cancel()
            self.proc = subprocess.Popen(
                [sys.executable, "-m", "beatheritage_tpu.apps.cli"] + args,
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


def validate_path_kind(path: str, kind: str) -> tuple[bool, str]:
    """Path validation matching the reference UI's checks (web-ui.py
    validate_beatmap_path/validate_audio_path)."""
    p = Path(path)
    if not p.is_file():
        return False, "file does not exist"
    if kind == "osu" and p.suffix.lower() != ".osu":
        return False, "beatmap must be a .osu file"
    if kind == "file" and p.suffix.lower() not in (
            ".wav", ".mp3", ".ogg", ".flac", ".m4a"):
        return False, f"unsupported audio extension {p.suffix}"
    return True, ""


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


def build_overrides(form: dict) -> tuple[str, list[str]]:
    config = form.get("config") or "default"
    overrides = []
    for key in ("audio_path", "output_path", "beatmap_path", "gamemode",
                "difficulty", "mapper_id", "year", "cfg_scale"):
        value = form.get(key)
        if value:
            overrides.append(f"{key}={value}")
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
    if form.get("extra"):
        overrides.extend(form["extra"].split())
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

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/":
            configs = sorted(p.stem for p in (DEFAULT_CONFIG_DIR / "inference").glob("*.yaml"))
            options = "".join(f'<option value="{html.escape(c)}">{html.escape(c)}</option>'
                              for c in configs)
            self._send(200, PAGE.format(configs=options))
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
            q = parse_qs(urlparse(self.path).query)
            p = q.get("path", [""])[0]
            kind = q.get("kind", ["file"])[0]
            valid, reason = validate_path_kind(p, kind)
            self._send(200, json.dumps({"exists": Path(p).is_file(),
                                        "valid": valid, "reason": reason}),
                       "application/json")
        elif path == "/descriptors":
            q = parse_qs(urlparse(self.path).query)
            cfg = q.get("config", ["default"])[0]
            self._send(200, json.dumps(list_descriptors(cfg)),
                       "application/json")
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
                self._send(400, json.dumps({"error": f"audio_path: {reason}"}),
                           "application/json")
                return
            bm = form.get("beatmap_path") or ""
            if bm:
                ok, reason = validate_path_kind(bm, "osu")
                if not ok:
                    self._send(400, json.dumps(
                        {"error": f"beatmap_path: {reason}"}),
                        "application/json")
                    return
            config, overrides = build_overrides(form)
            STATE.start(["-cn", config] + overrides)
            self._send(200, json.dumps({"started": True}), "application/json")
        elif path == "/cancel":
            STATE.cancel()
            self._send(200, json.dumps({"cancelled": True}), "application/json")
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
