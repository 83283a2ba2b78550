"""Web UI route surface over a live stdlib server (apps/webui.py).

Covers the round-3 additions: /save_config round-trip of the full form,
/load_config, /list_presets, /open_folder + /open_log_file (with the
logs-dir confinement the reference enforces at web-ui.py:451), POST
/validate_paths autofill, the standalone /maimod page, and run-log teeing.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

import beatheritage_tpu.apps.webui as webui


@pytest.fixture()
def server(tmp_path, monkeypatch):
    monkeypatch.setattr(webui, "LOG_DIR", tmp_path / "logs")
    monkeypatch.setattr(webui, "PRESETS_DIR", tmp_path / "presets")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), webui.Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, tmp_path
    srv.shutdown()


def get(base, path, expect_json=True):
    with urllib.request.urlopen(base + path) as r:
        body = r.read().decode()
    return json.loads(body) if expect_json else body


def post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read().decode())


def status_of(base, path, method="GET", obj=None):
    data = json.dumps(obj).encode() if obj is not None else None
    req = urllib.request.Request(base + path, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


FULL_FORM = {
    "config": "tiny",
    # every SCALAR_FIELDS entry must survive the preset round-trip
    **{k: f"v_{k}" for k in webui.SCALAR_FIELDS},
    **{k: True for k in webui.BOOL_FIELDS},
    "descriptor_select": ["jump aim", "clean"],
    "descriptors": "tech",
    "negative_descriptors": "messy",
    "in_context_options": ["timing"],
    "extra": "parallel=true",
}


def test_save_load_list_presets_roundtrip(server):
    base, _ = server
    assert get(base, "/list_presets") == []
    r = post(base, "/save_config", {"name": "my set", "form": FULL_FORM})
    assert r["success"] and r["file_path"].endswith("my set.json")
    assert get(base, "/list_presets") == ["my set"]
    assert get(base, "/load_config?name=my%20set") == FULL_FORM
    # reference-style body shape also accepted
    r2 = post(base, "/save_config",
              {"file_path": "/anywhere/../evil.json",
               "config_data": json.dumps({"a": 1})})
    assert r2["success"]
    # writes are confined to PRESETS_DIR regardless of the path given
    assert "/anywhere" not in r2["file_path"]
    assert get(base, "/load_config?name=evil") == {"a": 1}


def test_save_config_missing_params(server):
    base, _ = server
    assert post(base, "/save_config", {"name": "x"})["success"] is False
    assert post(base, "/save_config", {"form": {}})["success"] is False


def test_load_config_unknown_404(server):
    base, _ = server
    assert status_of(base, "/load_config?name=nope") == 404


def test_open_folder_validation(server):
    base, _ = server
    assert status_of(base, "/open_folder") == 400
    assert status_of(base, "/open_folder?folder=/definitely/not/there") == 400


def test_open_log_file_confined_to_log_dir(server):
    base, tmp = server
    outside = tmp / "secret.txt"
    outside.write_text("x")
    # outside LOG_DIR -> 403 access denied, never opened
    assert status_of(base,
                     f"/open_log_file?path={outside}") == 403
    # inside LOG_DIR but missing -> 404
    (tmp / "logs").mkdir()
    assert status_of(base,
                     f"/open_log_file?path={tmp / 'logs' / 'no.log'}") == 404
    # traversal out of LOG_DIR -> 403
    sneaky = tmp / "logs" / ".." / "secret.txt"
    assert status_of(base, f"/open_log_file?path={sneaky}") == 403
    assert status_of(base, "/open_log_file") == 400  # nothing ran yet


def test_validate_paths_autofills_from_beatmap(server, tmp_path):
    base, _ = server
    import numpy as np
    from scipy.io import wavfile
    wav = tmp_path / "song.wav"
    wavfile.write(wav, 16000, np.zeros(16000, np.int16))
    osu = tmp_path / "map.osu"
    osu.write_text("osu file format v14\n\n[General]\n"
                   "AudioFilename: song.wav\nMode: 0\n\n[Metadata]\n"
                   "Title:t\n\n[TimingPoints]\n0,500,4,2,0,60,1,0\n\n"
                   "[HitObjects]\n")
    r = post(base, "/validate_paths", {"beatmap_path": str(osu)})
    assert r["success"], r
    assert r["audio_path"] == str(wav)
    assert r["output_path"] == str(tmp_path)
    r2 = post(base, "/validate_paths", {"audio_path": "/nope.wav"})
    assert not r2["success"] and r2["errors"]


def test_maimod_standalone_page_served(server):
    base, _ = server
    html = get(base, "/maimod", expect_json=False)
    assert "MaiMod" in html and "start_maimod" in html
    # main page still serves and now carries the preset controls
    index = get(base, "/", expect_json=False)
    assert "save-preset-btn" in index and "open-folder-btn" in index


def test_run_log_is_teed_to_log_dir(server):
    base, tmp = server
    webui.STATE.start("this_module_does_not_exist", [])
    # stream drains the pump; the log file must hold the same content
    collected = "".join(webui.STATE.stream())
    assert "[exit code" in collected
    log = webui.STATE.log_path
    assert log is not None and log.parent == tmp / "logs"
    assert log.read_text() == collected
    assert get(base, "/logs") == [str(log)]


def test_capabilities_reflect_train_config(server):
    """/capabilities introspects the model's train config (reference
    static/app.js hardcodes a modelCapabilities table per config)."""
    base, _ = server
    caps = get(base, "/capabilities?config=tiny")
    assert set(caps["supported_gamemodes"]) == {0, 1, 2, 3}
    assert caps["supports_year"] is True
    assert caps["supports_hitsounds"] is True
    assert caps["supports_descriptors"] is True
    assert isinstance(caps["in_context_options"], list)
    # unknown config -> empty capabilities rather than a 500
    assert get(base, "/capabilities?config=definitely_missing") == {}


def test_result_beatmap_serves_only_run_reported_path(server, tmp_path):
    """/result_beatmap serves the .osu the run itself reported (for the
    preview canvas) and 404s otherwise; client-supplied paths are never
    consulted."""
    base, _ = server
    webui.STATE.result_path = None
    assert status_of(base, "/result_beatmap") == 404
    # query params must be ignored
    assert status_of(base, "/result_beatmap?path=/etc/passwd") == 404

    osu = tmp_path / "gen.osu"
    osu.write_text("osu file format v14\n[HitObjects]\n256,192,1000,1,0\n")
    webui.STATE.result_path = osu
    try:
        body = get(base, "/result_beatmap", expect_json=False)
        assert "[HitObjects]" in body
    finally:
        webui.STATE.result_path = None


def test_pump_captures_result_path(tmp_path, monkeypatch):
    """The output pump records the 'saved to *.osu' line so the preview
    route can serve it after the run completes."""
    import time as _time

    monkeypatch.setattr(webui, "LOG_DIR", tmp_path / "logs")
    state = webui.InferenceProcess()
    code = ("print('step 1')\n"
            "print('Generated beatmap saved to /tmp/some_result.osu')")
    state.start("timeit", ["-n", "1", "-r", "1", "-s", code, "pass"])
    for _ in range(100):
        if state.proc.poll() is not None and state.result_path is not None:
            break
        _time.sleep(0.1)
    assert state.result_path is not None
    assert str(state.result_path) == "/tmp/some_result.osu"


def test_browse_lists_filtered_directory(server, tmp_path):
    base, _ = server
    root = tmp_path / "songs"
    (root / "sub").mkdir(parents=True)
    (root / "track.mp3").touch()
    (root / "map.osu").touch()
    (root / "notes.txt").touch()
    (root / ".hidden").touch()

    j = get(base, f"/browse?dir={root}&filter=audio")
    assert j["dir"] == str(root)
    assert j["parent"] == str(tmp_path)
    assert j["dirs"] == ["sub"]
    assert j["files"] == ["track.mp3"]  # .osu/.txt filtered, dotfile skipped

    j = get(base, f"/browse?dir={root}&filter=osu")
    assert j["files"] == ["map.osu"]

    j = get(base, f"/browse?dir={root}&filter=dir")
    assert j["files"] == []  # folder picking: directories only

    j = get(base, f"/browse?dir={root}&filter=all")
    assert j["files"] == ["map.osu", "notes.txt", "track.mp3"]


def test_browse_rejects_missing_directory(server, tmp_path):
    base, _ = server
    assert status_of(base, f"/browse?dir={tmp_path}/nope") == 400


def test_browse_defaults_to_home(server):
    base, _ = server
    from pathlib import Path
    assert get(base, "/browse")["dir"] == str(Path.home().resolve())
