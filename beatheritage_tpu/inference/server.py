"""Same-host IPC batching server for inference.

(reference: osuT5/osuT5/inference/server.py:134 InferenceServer, :322
InferenceClient) A daemon process keeps the compiled XLA programs and model
weights warm across CLI invocations; clients connect over a Unix socket
(multiprocessing.connection), requests with identical sampling settings are
packed into batches up to max_batch_size, errors broadcast a retry signal to
every affected client (clients reconnect and retry up to 3 times), and an
idle monitor shuts the server down after 20 s without clients.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import threading
import time
import traceback
from multiprocessing.connection import Client, Listener
from pathlib import Path
from typing import Any, Optional

import numpy as np

RETRY_SIGNAL = "RETRY_SIGNAL"
IDLE_SHUTDOWN_SECONDS = 20.0
BATCH_WAIT_SECONDS = 0.05


def _runtime_dir() -> Path:
    """Per-user 0700 runtime dir for sockets + the IPC secret: XDG_RUNTIME_DIR
    when set, else a per-uid dir under the temp root (never a shared /tmp path)."""
    base = os.environ.get("XDG_RUNTIME_DIR")
    if base:
        d = Path(base) / "beatheritage"
    else:
        d = Path(tempfile.gettempdir()) / f"beatheritage-{os.getuid()}"
    d.mkdir(mode=0o700, parents=True, exist_ok=True)
    try:
        os.chmod(d, 0o700)
    except OSError:
        pass
    return d


def ipc_authkey() -> bytes:
    """HMAC authkey for multiprocessing.connection, persisted per-user so the
    lazily-spawned server process and later CLI invocations agree. The wire
    format is pickle, so without this any local user who can reach the socket
    could execute code in the server (reference server.py has no authkey)."""
    secret = _runtime_dir() / "ipc_secret"
    try:
        return secret.read_bytes()
    except OSError:
        key = os.urandom(32)
        fd = os.open(secret, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
        try:
            os.write(fd, key)
        finally:
            os.close(fd)
        return key


def socket_address(model_key: str) -> str:
    if os.name == "nt":
        return rf"\\.\pipe\beatheritage_{model_key}"
    return str(_runtime_dir() / f"{model_key}.sock")


class InferenceServer:
    """Request-batching daemon wrapping a Processor-compatible engine."""

    def __init__(self, args, params=None, tokenizer=None,
                 address: Optional[str] = None):
        from .processor import Processor  # noqa: PLC0415
        from .pipeline import load_model, load_tokenizer  # noqa: PLC0415

        self.args = args
        if tokenizer is None:
            tokenizer = load_tokenizer(args)
        if params is None:
            params, _ = load_model(args, tokenizer)
        self.processor = Processor(args, params, tokenizer, verbose=False)
        if getattr(args, "warmup_windows", 0):
            # precompile every window-batch bucket before accepting clients:
            # the first request of each song length then never pays a compile
            self.processor.warmup(args.warmup_windows)
        self.address = address or socket_address(
            Path(args.model_path).name or "default")
        self.max_batch_size = args.max_batch_size

        self._lock = threading.Lock()
        self._pending: list[dict] = []
        self._client_count = 0
        self._last_active = time.time()
        self._shutdown = threading.Event()

    # -- request processing -------------------------------------------------------

    def _group_key(self, request: dict) -> tuple:
        g = request["generate_kwargs"]
        return tuple(sorted((k, str(v)) for k, v in g.items()))

    def _batch_thread(self) -> None:
        """Pack compatible pending requests and run them through the engine
        (reference server.py:230-299)."""
        while not self._shutdown.is_set():
            time.sleep(BATCH_WAIT_SECONDS)
            with self._lock:
                if not self._pending:
                    continue
                key = self._group_key(self._pending[0])
                batch = [r for r in self._pending if self._group_key(r) == key]
                batch = batch[:max(1, self.max_batch_size)]
                for r in batch:
                    self._pending.remove(r)
            try:
                results = self._run_batch(batch)
                for request, result in zip(batch, results):
                    request["conn"].send(("ok", result))
            except Exception:
                traceback.print_exc()
                for request in batch:
                    try:
                        request["conn"].send((RETRY_SIGNAL, None))
                    except OSError:
                        pass

    def _run_batch(self, batch: list[dict]) -> list[Any]:
        proc = self.processor
        g = batch[0]["generate_kwargs"]
        frames = np.concatenate([r["model_kwargs"]["frames"] for r in batch])
        cond: dict = {}
        for k in ("beatmap_idx", "difficulty", "mapper_idx", "song_position"):
            vals = [r["model_kwargs"].get(k) for r in batch]
            if all(v is not None for v in vals):
                cond[k] = np.concatenate(vals)
        max_p = max(r["model_kwargs"]["cond_prompt"].shape[1] for r in batch)

        def stack(key):
            rows = []
            for r in batch:
                p = r["model_kwargs"].get(key)
                if p is None:
                    return None
                out = np.full((p.shape[0], max_p), proc.tokenizer.pad_id, np.int32)
                out[:, max_p - p.shape[1]:] = p
                rows.append(out)
            return np.concatenate(rows)

        cond_prompt = stack("cond_prompt")
        uncond_prompt = stack("uncond_prompt")
        enc = proc.encode_audio(frames, cond)
        results = proc._run_engine(
            enc, cond_prompt, uncond_prompt,
            g.get("lookback_time", 0.0), g.get("lookahead_time", 0.0),
            g.get("context_type"))
        out = []
        i = 0
        for r in batch:
            b = r["model_kwargs"]["cond_prompt"].shape[0]
            out.append(results[i:i + b])
            i += b
        return out

    # -- connection handling -----------------------------------------------------

    def _handle_client(self, conn) -> None:
        with self._lock:
            self._client_count += 1
            self._last_active = time.time()
        try:
            while not self._shutdown.is_set():
                try:
                    message = conn.recv()
                except (EOFError, OSError):
                    break
                if message == "ping":
                    conn.send("pong")
                    continue
                if message == "shutdown":
                    self._shutdown.set()
                    break
                model_kwargs, generate_kwargs = message
                with self._lock:
                    self._pending.append({
                        "conn": conn,
                        "model_kwargs": model_kwargs,
                        "generate_kwargs": generate_kwargs,
                    })
        finally:
            with self._lock:
                self._client_count -= 1
                self._last_active = time.time()
            try:
                conn.close()
            except OSError:
                pass

    def _idle_monitor(self) -> None:
        """Self-terminate after IDLE_SHUTDOWN_SECONDS without clients
        (reference server.py:305-318)."""
        while not self._shutdown.is_set():
            time.sleep(1.0)
            with self._lock:
                idle = (self._client_count == 0
                        and time.time() - self._last_active > IDLE_SHUTDOWN_SECONDS)
            if idle:
                self._shutdown.set()
        self._unlink()

    def _unlink(self) -> None:
        if os.name != "nt":
            try:
                os.unlink(self.address)
            except OSError:
                pass

    def serve(self) -> None:
        self._unlink()
        listener = Listener(self.address,
                            family="AF_UNIX" if os.name != "nt" else "AF_PIPE",
                            authkey=ipc_authkey())
        threading.Thread(target=self._batch_thread, daemon=True).start()
        threading.Thread(target=self._idle_monitor, daemon=True).start()

        def accept_loop():
            while not self._shutdown.is_set():
                try:
                    conn = listener.accept()
                except OSError:
                    break
                threading.Thread(target=self._handle_client, args=(conn,),
                                 daemon=True).start()

        accept = threading.Thread(target=accept_loop, daemon=True)
        accept.start()
        try:
            while not self._shutdown.is_set():
                time.sleep(0.2)
        finally:
            try:
                listener.close()
            except OSError:
                pass
            self._unlink()


class InferenceClient:
    """Client that lazily spawns the server and retries on failures
    (reference server.py:322-405)."""

    MAX_RETRIES = 3

    def __init__(self, args, address: Optional[str] = None,
                 spawn: bool = True, config_name: Optional[str] = None):
        self.args = args
        self.address = address or socket_address(
            Path(args.model_path).name or "default")
        self.spawn = spawn
        self.config_name = config_name
        self._conn = None

    def __enter__(self):
        self._connect()
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            except OSError:
                pass
            self._conn = None

    def _connect(self, timeout: float = 180.0) -> None:
        deadline = time.time() + timeout
        spawned = False
        while time.time() < deadline:
            try:
                self._conn = Client(self.address,
                                    family="AF_UNIX" if os.name != "nt" else "AF_PIPE",
                                    authkey=ipc_authkey())
                self._conn.send("ping")
                if self._conn.recv() == "pong":
                    return
            except (OSError, EOFError):
                self._conn = None
                if self.spawn and not spawned:
                    self._spawn_server()
                    spawned = True
                time.sleep(0.5)
        raise ConnectionError(f"could not reach inference server at {self.address}")

    def _spawn_server(self) -> None:
        cmd = [sys.executable, "-m", "beatheritage_tpu.inference.server"]
        if self.config_name:
            cmd += ["-cn", self.config_name]
        subprocess.Popen(cmd, start_new_session=True)

    def generate(self, model_kwargs: dict, generate_kwargs: dict):
        for attempt in range(self.MAX_RETRIES):
            try:
                if self._conn is None:
                    self._connect()
                self._conn.send((model_kwargs, generate_kwargs))
                status, result = self._conn.recv()
                if status == "ok":
                    return result
            except (OSError, EOFError):
                self.close()
            time.sleep(0.5 * (attempt + 1))
        raise RuntimeError("inference server failed after retries")


def main(argv=None) -> int:
    import argparse  # noqa: PLC0415
    parser = argparse.ArgumentParser(description="beatheritage inference server")
    parser.add_argument("-cn", "--config-name", default="default")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)
    from ..config import InferenceConfig, load_config  # noqa: PLC0415
    args = load_config(InferenceConfig, "inference", ns.config_name,
                       overrides=ns.overrides)
    InferenceServer(args).serve()
    return 0


if __name__ == "__main__":
    sys.exit(main())
