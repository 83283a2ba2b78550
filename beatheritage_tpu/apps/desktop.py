"""Desktop shell: the web UI inside a native window via pywebview.

(reference: web-ui.py wraps its Flask app in a pywebview window.) Starts the
stdlib HTTP UI on a local port and opens a native window pointed at it;
falls back to printing the browser URL when pywebview isn't installed
(it is not part of the baked TPU image).

Usage: python -m beatheritage_tpu.apps.desktop [--port 9727]
"""

from __future__ import annotations

import argparse
import sys
import threading


class DesktopApi:
    """Native file dialogs exposed to the page as window.pywebview.api
    (reference: web-ui.py Api.browse_file/browse_folder/save_file backing
    static/app.js FileBrowser). The browser build falls back to the
    server-side /browse picker when this API is absent."""

    AUDIO = ("Audio files (*.mp3;*.wav;*.ogg;*.m4a;*.flac)", "All files (*.*)")
    OSU = ("Beatmap files (*.osu)", "All files (*.*)")

    def __init__(self, webview_module):
        self._webview = webview_module

    def _window(self):
        return self._webview.windows[0]

    def browse_file(self, kind="all"):
        types = (self.AUDIO if kind == "audio"
                 else self.OSU if kind == "osu" else ("All files (*.*)",))
        picked = self._window().create_file_dialog(
            self._webview.OPEN_DIALOG, file_types=types)
        return picked[0] if picked else None

    def browse_folder(self):
        picked = self._window().create_file_dialog(self._webview.FOLDER_DIALOG)
        return picked[0] if picked else None

    def save_file(self, filename="config.json"):
        picked = self._window().create_file_dialog(
            self._webview.SAVE_DIALOG, save_filename=filename)
        return picked if isinstance(picked, str) else (
            picked[0] if picked else None)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="beatheritage desktop shell")
    parser.add_argument("--port", type=int, default=9727)
    ns = parser.parse_args(argv)

    from http.server import ThreadingHTTPServer

    from .webui import Handler

    server = ThreadingHTTPServer(("127.0.0.1", ns.port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{ns.port}"

    try:
        import webview  # noqa: PLC0415
    except ImportError:
        print(f"pywebview not installed; open {url} in a browser "
              "(pip install pywebview for the native window)")
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            pass
        return 0

    webview.create_window("BeatHeritage TPU", url, width=860, height=900,
                          js_api=DesktopApi(webview))
    webview.start()
    server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
