"""Static consistency checks for the web client (no browser in CI).

The client JS references DOM elements by id; a typo breaks the page at
runtime with no test signal. These tests cross-check app.js against
index.html/maimod.html and sanity-check the JS for gross syntax damage
(unbalanced brackets/quotes).
"""

import re
from pathlib import Path

STATIC = Path(__file__).parent.parent / "beatheritage_tpu/apps/webui_static"


def _ids(html: str) -> set[str]:
    return set(re.findall(r'id="([^"]+)"', html))


def _js_without_literals(js: str) -> str:
    """Strip strings, template literals, comments, and regex-free zones so
    bracket counting sees only code structure."""
    out, i, n = [], 0, len(js)
    while i < n:
        c = js[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n and js[i] != q:
                i += 2 if js[i] == "\\" else 1
            i += 1
        elif js.startswith("//", i):
            while i < n and js[i] != "\n":
                i += 1
        elif js.startswith("/*", i):
            j = js.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def test_app_js_dom_ids_exist():
    js = (STATIC / "app.js").read_text()
    index_ids = _ids((STATIC / "index.html").read_text())
    referenced = set(re.findall(r'\$\("([^"]+)"\)', js))
    missing = referenced - index_ids
    assert not missing, f"app.js references ids missing from index.html: {missing}"


def test_app_js_form_field_gating_ids_exist():
    """Conditional-visibility groups named in JS must exist in the form."""
    js = (STATIC / "app.js").read_text()
    index_ids = _ids((STATIC / "index.html").read_text())
    groups = set(re.findall(r'"(group-[a-z_]+)"', js))
    assert groups, "expected per-gamemode visibility groups in app.js"
    missing = groups - index_ids
    assert not missing, f"visibility groups missing from index.html: {missing}"


def test_js_brackets_balanced():
    for name in ("app.js",):
        code = _js_without_literals((STATIC / name).read_text())
        for open_c, close_c in ("()", "[]", "{}"):
            assert code.count(open_c) == code.count(close_c), (
                f"{name}: unbalanced {open_c}{close_c} "
                f"({code.count(open_c)} vs {code.count(close_c)})")


def test_clear_buttons_target_real_inputs():
    html = (STATIC / "index.html").read_text()
    ids = _ids(html)
    for target in re.findall(r'data-target="([^"]+)"', html):
        assert target in ids, f"clear button targets missing input #{target}"


def test_form_fields_cover_server_override_surface():
    """Every scalar/bool field the server maps to CLI overrides should be
    settable from the form (the reverse of test_webui_routes coverage)."""
    from beatheritage_tpu.apps.webui import BOOL_FIELDS, SCALAR_FIELDS

    html = (STATIC / "index.html").read_text()
    names = set(re.findall(r'name="([^"]+)"', html))
    for field in SCALAR_FIELDS + BOOL_FIELDS:
        assert field in names, f"form is missing an input for {field}"


def test_preview_feature_wired():
    """The preview canvas (beyond the reference client) is fully wired:
    button + canvas + scrubber in the DOM, and the JS fetches the
    confined /result_beatmap route."""
    import pathlib
    static = pathlib.Path("beatheritage_tpu/apps/webui_static")
    html = (static / "index.html").read_text()
    js = (static / "app.js").read_text()
    for el in ("preview-btn", "preview-canvas", "preview-time",
               "preview-play", "preview-box"):
        assert f'id="{el}"' in html, el
    assert "/result_beatmap" in js
    # parser handles the three object families and slider duration inputs
    for marker in ("HitObjects", "TimingPoints", "SliderMultiplier",
                   "type & 2", "type & 8"):
        assert marker in js, marker


def test_browse_feature_wired():
    """File picker (reference FileBrowser, served browser-side here):
    browse buttons on every path input, modal DOM present, JS hits the
    /browse route, and each button's filter kind matches its input."""
    html = (STATIC / "index.html").read_text()
    js = (STATIC / "app.js").read_text()
    for el in ("browse-modal", "browse-panel", "browse-list", "browse-up",
               "browse-close", "browse-pick-dir", "browse-dir"):
        assert f'id="{el}"' in html, el
    assert "/browse?" in js
    kinds = dict(re.findall(
        r'class="browse-btn" data-target="([^"]+)"\s+data-kind="([^"]+)"',
        html))
    assert kinds == {"audio_path": "audio", "beatmap_path": "osu",
                     "output_path": "dir"}
    # the desktop shell's native dialogs are preferred when present
    assert "pywebview" in js


def test_desktop_api_native_dialogs():
    """DesktopApi maps the client's browse calls onto pywebview dialogs."""
    from types import SimpleNamespace

    from beatheritage_tpu.apps.desktop import DesktopApi

    calls = []

    class FakeWindow:
        def create_file_dialog(self, kind, **kw):
            calls.append((kind, kw))
            return ["/picked/file.mp3"]

    fake = SimpleNamespace(OPEN_DIALOG="open", FOLDER_DIALOG="folder",
                           SAVE_DIALOG="save", windows=[FakeWindow()])
    api = DesktopApi(fake)
    assert api.browse_file("audio") == "/picked/file.mp3"
    assert calls[-1][0] == "open"
    assert any("*.mp3" in t for t in calls[-1][1]["file_types"])
    assert api.browse_file("osu") == "/picked/file.mp3"
    assert any("*.osu" in t for t in calls[-1][1]["file_types"])
    assert api.browse_folder() == "/picked/file.mp3"
    assert calls[-1][0] == "folder"
    assert api.save_file("cfg.json") == "/picked/file.mp3"
    assert calls[-1] == ("save", {"save_filename": "cfg.json"})
