"""IPC inference server tests (in-thread server, real socket)."""

import threading
import time

import numpy as np
import pytest

from beatheritage_tpu.config import InferenceConfig, load_config
from beatheritage_tpu.events import ContextType
from beatheritage_tpu.inference.pipeline import load_model, load_tokenizer
from beatheritage_tpu.inference.server import (
    InferenceClient,
    InferenceServer,
    socket_address,
)


@pytest.fixture(scope="module")
def server():
    args = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "use_server=true", "max_batch_size=4",
    ])
    tok = load_tokenizer(args)
    params, _ = load_model(args, tok)
    address = "/tmp/beatheritage_test.sock"
    srv = InferenceServer(args, params=params, tokenizer=tok, address=address)
    thread = threading.Thread(target=srv.serve, daemon=True)
    thread.start()
    time.sleep(0.5)
    yield args, srv, address
    srv._shutdown.set()


def test_ping(server):
    args, srv, address = server
    client = InferenceClient(args, address=address, spawn=False)
    client._connect(timeout=10)
    client.close()


def test_generate_through_server(server):
    args, srv, address = server
    tok = srv.processor.tokenizer
    n_samples = (args.train.data.src_seq_len - 1) * args.train.data.hop_length
    frames = np.zeros((1, n_samples), np.float32)
    prompt = np.full((1, 4), tok.pad_id, np.int32)
    prompt[0, -1] = tok.sos_id
    model_kwargs = {"frames": frames, "cond_prompt": prompt, "uncond_prompt": None,
                    "song_position": np.zeros((1, 2), np.float32)}
    generate_kwargs = {"lookback_time": 0.0, "lookahead_time": 0.0,
                       "context_type": ContextType.MAP}
    with InferenceClient(args, address=address, spawn=False) as client:
        result = client.generate(model_kwargs, generate_kwargs)
    assert isinstance(result, list) and len(result) == 1
    assert result[0].dtype in (np.int32, np.int64)
    assert result[0].max(initial=0) < tok.vocab_size_out


def test_concurrent_clients_batched(server):
    """Two clients with identical settings get valid independent results."""
    args, srv, address = server
    tok = srv.processor.tokenizer
    n_samples = (args.train.data.src_seq_len - 1) * args.train.data.hop_length
    results = {}

    def worker(idx):
        frames = np.zeros((1, n_samples), np.float32)
        prompt = np.full((1, 4), tok.pad_id, np.int32)
        prompt[0, -1] = tok.sos_id
        mk = {"frames": frames, "cond_prompt": prompt, "uncond_prompt": None,
              "song_position": np.zeros((1, 2), np.float32)}
        gk = {"lookback_time": 0.0, "lookahead_time": 0.0,
              "context_type": ContextType.MAP}
        with InferenceClient(args, address=address, spawn=False) as client:
            results[idx] = client.generate(mk, gk)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert set(results) == {0, 1}
    for r in results.values():
        assert len(r) == 1


def test_socket_address_naming():
    assert socket_address("modelx").endswith("modelx.sock")
