"""Speculative decode: greedy bit-parity with the plain engine + sampling
smoke. (decode/speculative.py — prompt-lookup drafts, chunk verification.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.decode.engine import SamplerSettings, generate
from beatheritage_tpu.decode.speculative import (generate_speculative,
                                                 prompt_lookup_draft)
from beatheritage_tpu.decode.tables import TokenTables
from beatheritage_tpu.models import ModelDims, init_params
from beatheritage_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    params = init_params(jax.random.PRNGKey(0), dims)
    tables = TokenTables.from_tokenizer(tok)
    return cfg, tok, dims, params, tables


def _inputs(cfg, tok, dims, b=2, p=8, seed=0):
    rng = np.random.default_rng(seed)
    s = (cfg.data.src_seq_len - 1) // 2 + 1
    enc = jnp.asarray(rng.standard_normal((b, s, dims.d_model)) * 0.5,
                      jnp.float32)
    prompt = np.full((b, p), tok.pad_id, np.int32)
    prompt[:, -1] = tok.sos_id
    mask = prompt != tok.pad_id
    return enc, jnp.asarray(prompt), jnp.asarray(mask)


def test_prompt_lookup_draft_copies_continuations():
    tokens = jnp.asarray([[5, 6, 7, 8, 5, 6, 0, 0, 0, 0]], jnp.int32)
    # step=5: trailing bigram (5, 6) matched at positions 0-1 -> draft 7, 8
    draft = prompt_lookup_draft(tokens, jnp.asarray(5), 2, pad_id=0)
    assert draft.tolist() == [[7, 8]]
    # no match anywhere -> pad draft
    tokens2 = jnp.asarray([[1, 2, 3, 4, 9, 9, 0, 0, 0, 0]], jnp.int32)
    draft2 = prompt_lookup_draft(tokens2, jnp.asarray(3), 2, pad_id=0)
    # unigram fallback: last token 4 at step 3; token 4 appears only at
    # position 3 itself (not < step), so pad
    assert draft2.tolist() == [[0, 0]]


def test_greedy_speculative_matches_plain_engine(setup):
    cfg, tok, dims, params, tables = setup
    enc, prompt, mask = _inputs(cfg, tok, dims)
    eos_mask = jnp.zeros((tok.vocab_size_out,), bool).at[tok.eos_id].set(True)
    settings = SamplerSettings(do_sample=False, temperature=1.0,
                               repetition_penalty=1.1)
    max_len = 96
    key = jax.random.PRNGKey(7)

    plain = generate(params, dims, settings, tables, enc, prompt, mask,
                     eos_mask, key, max_len=max_len, dtype=jnp.float32)
    spec = generate_speculative(params, dims, settings, tables, enc, prompt,
                                mask, eos_mask, key, max_len=max_len,
                                draft_k=4, dtype=jnp.float32)

    n = int(min(plain["length"], spec["length"]))
    pt = np.asarray(plain["tokens"])[:, :n]
    st = np.asarray(spec["tokens"])[:, :n]
    assert int(plain["length"]) == int(spec["length"])
    np.testing.assert_array_equal(pt, st)
    assert len(np.unique(pt)) > 3, "degenerate stream proves nothing"


def test_greedy_speculative_with_cfg_matches(setup):
    cfg, tok, dims, params, tables = setup
    enc, prompt, mask = _inputs(cfg, tok, dims, b=2)
    # CFG doubles the batch: rows [0:B] conditional
    enc2 = jnp.concatenate([enc, enc * 0.5], axis=0)
    prompt2 = jnp.concatenate([prompt, prompt], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    eos_mask = jnp.zeros((tok.vocab_size_out,), bool).at[tok.eos_id].set(True)
    settings = SamplerSettings(do_sample=False, cfg_scale=1.5)
    key = jax.random.PRNGKey(3)

    plain = generate(params, dims, settings, tables, enc2, prompt2, mask2,
                     eos_mask, key, max_len=64, dtype=jnp.float32)
    spec = generate_speculative(params, dims, settings, tables, enc2, prompt2,
                                mask2, eos_mask, key, max_len=64, draft_k=3,
                                dtype=jnp.float32)
    assert int(plain["length"]) == int(spec["length"])
    np.testing.assert_array_equal(np.asarray(plain["tokens"]),
                                  np.asarray(spec["tokens"]))


def test_sampling_speculative_produces_valid_stream(setup):
    cfg, tok, dims, params, tables = setup
    enc, prompt, mask = _inputs(cfg, tok, dims, seed=5)
    eos_mask = jnp.zeros((tok.vocab_size_out,), bool).at[tok.eos_id].set(True)
    settings = SamplerSettings(do_sample=True, temperature=0.9, top_p=0.95,
                               top_k=50)
    out = generate_speculative(params, dims, settings, tables, enc, prompt,
                               mask, eos_mask, jax.random.PRNGKey(11),
                               max_len=80, draft_k=4, dtype=jnp.float32)
    tokens = np.asarray(out["tokens"])
    length = int(out["length"])
    assert 8 < length <= 80
    assert (tokens[:, 8:length] < tok.vocab_size_out).all()
    assert (tokens[:, 8:length] >= 0).all()


def test_aot_executable_cache_roundtrip(setup, tmp_path):
    """decode/aot.py: a 'fresh process' (cleared in-memory maps) loads the
    serialized decode executable from disk and produces identical tokens."""
    from beatheritage_tpu.decode import aot

    cfg, tok, dims, params, tables = setup
    enc, prompt, mask = _inputs(cfg, tok, dims)
    eos_mask = jnp.zeros((tok.vocab_size_out,), bool).at[tok.eos_id].set(True)
    settings = SamplerSettings(do_sample=False)
    key = jax.random.PRNGKey(1)

    aot._FALLBACKS["count"] = 0
    out1 = aot.aot_call(generate, str(tmp_path), params, dims, settings,
                        tables, enc, prompt, mask, eos_mask, key,
                        max_len=48, dtype=jnp.float32)
    assert list(tmp_path.glob("*.aotx")), "no serialized executable written"
    aot._LOADED.clear()
    aot._SIG_MEMO.clear()
    out2 = aot.aot_call(generate, str(tmp_path), params, dims, settings,
                        tables, enc, prompt, mask, eos_mask, key,
                        max_len=48, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out1["tokens"]),
                                  np.asarray(out2["tokens"]))
    # the loaded-exe path must never fall back for CONVENTION reasons
    # (executables accept dynamic-only inputs; statics are stripped). A
    # placement fallback is expected under the virtual test mesh, where
    # inputs are not pre-placed onto the 8 devices.
    assert "convention" not in aot._FALLBACKS.get("last_reason", "")


def test_aot_strip_statics_matches_jit_info(setup):
    """_strip_statics drops exactly the jit wrapper's declared statics."""
    from beatheritage_tpu.decode import aot

    cfg, tok, dims, params, tables = setup
    enc, prompt, mask = _inputs(cfg, tok, dims)
    eos_mask = jnp.zeros((tok.vocab_size_out,), bool).at[tok.eos_id].set(True)
    settings = SamplerSettings(do_sample=False)
    key = jax.random.PRNGKey(1)
    args = (params, dims, settings, tables, enc, prompt, mask, eos_mask, key)
    kwargs = dict(max_len=48, dtype=jnp.float32)
    dyn_args, dyn_kwargs = aot._strip_statics(generate, args, kwargs)
    # dims/settings/tables are static_argnames of engine.generate
    assert len(dyn_args) == len(args) - 3
    assert params is dyn_args[0] and enc is dyn_args[1]
    assert dyn_kwargs == {}  # max_len and dtype are static
