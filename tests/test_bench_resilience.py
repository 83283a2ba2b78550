"""bench.py must NEVER leave a crash record: whatever happens to the
backend, it prints exactly one parseable JSON line and exits 0 (the round-3
official bench record was an rc=1 traceback because the TPU tunnel relay
had died)."""

import json
import os
import socket
import subprocess
import sys
import threading
from pathlib import Path

BENCH = str(Path(__file__).parent.parent / "bench.py")


def _run(env_extra, timeout=120):
    env = dict(os.environ, **env_extra)
    proc = subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env)
    return proc


def test_relay_down_emits_diagnostic_json_rc0():
    proc = _run({"BENCH_RELAY_PORTS": "1", "BENCH_BACKEND_WAIT": "2"})
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    record = json.loads(lines[0])
    assert record["metric"] == "audio_min_mapped_per_sec_per_chip"
    assert record["value"] == 0.0
    assert "unreachable" in record["detail"]["error"]


def test_failing_child_is_retried_then_diagnosed():
    """With the relay port 'open' (a dummy listener) but the backend broken
    (child dies on a bogus platform), the parent retries then emits a
    diagnostic record, rc 0."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    accepting = threading.Thread(target=lambda: [
        c[0].close() for c in iter(lambda: _accept(srv), None)], daemon=True)
    accepting.start()
    try:
        proc = _run({
            "BENCH_RELAY_PORTS": str(port),
            "BENCH_BACKEND_WAIT": "5",
            "BENCH_MAX_ATTEMPTS": "2",
            "BENCH_CHILD_TIMEOUT": "30",
            "JAX_PLATFORMS": "definitely_not_a_platform",
        }, timeout=300)
    finally:
        srv.close()
    assert proc.returncode == 0, proc.stderr[-500:]
    record = json.loads(proc.stdout.strip().splitlines()[-1])
    assert record["value"] == 0.0
    attempts = record["detail"]["attempts"]
    assert len(attempts) == 2
    assert all(a["outcome"].startswith("rc=") or a["outcome"] == "timeout"
               for a in attempts)


def _accept(srv):
    try:
        return srv.accept()
    except OSError:
        return None


def test_oom_failure_degrades_window_batch():
    """A device-OOM child failure halves N_WINDOWS for the next attempt
    (floor 6); non-OOM failures keep the batch."""
    sys.path.insert(0, str(Path(BENCH).parent))
    try:
        import bench
    finally:
        sys.path.pop(0)
    oom = "jaxlib.xla_extension.XlaRuntimeError: RESOURCE_EXHAUSTED: ..."
    assert bench._next_n_windows(24, oom) == 12
    assert bench._next_n_windows(12, oom) == 6
    assert bench._next_n_windows(6, oom) == 6
    assert bench._next_n_windows(8, "Out of memory allocating 1g") == 6
    assert bench._next_n_windows(24, "Unable to initialize backend") == 24
    assert bench._next_n_windows(24, "") == 24


def test_bench_caches_live_outside_tmp():
    """VM restarts wipe /tmp but preserve the home filesystem; both the
    XLA persistent cache and the AOT executable cache must live in the
    home dir so the driver's round-end bench stays warm across restarts
    (round 4 lost its /tmp caches to two separate wipes)."""
    src = open(BENCH).read()
    assert '"/tmp/jax_bench_cache"' not in src
    assert '~/.cache' in src
    from beatheritage_tpu.decode.aot import default_cache_dir
    assert not str(default_cache_dir()).startswith("/tmp/")
