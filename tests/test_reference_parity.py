"""Numerical parity of the checkpoint converter against the actual reference
backbone (read-only import of public reference code for validation).

Builds a tiny randomly-initialized RoPEWhisper from the reference tree,
converts its state dict with train/convert.py, and checks encoder states and
teacher-forced logits agree — proving the architectures and conventions
(conv frontend, rotate-half RoPE, pre-LN, GELU, bias layout) line up, so
reference-trained checkpoints load for matched-FID evaluation.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REFERENCE.is_dir(),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, str(REFERENCE))
    import osuT5.osuT5.model.custom_transformers.modeling_ropewhisper as m

    # the reference pins an older transformers rope-init API; adapt:
    # LlamaRotaryEmbedding passes config=None + explicit kwargs, newer
    # transformers read everything from the config object
    orig = dict(m.ROPE_INIT_FUNCTIONS)

    def wrap(f):
        def g(config, device=None, seq_len=None, **kw):
            if config is None:
                config = types.SimpleNamespace(
                    rope_theta=kw.get("base", 10000.0),
                    head_dim=kw.get("dim"), hidden_size=kw.get("dim"),
                    num_attention_heads=1, partial_rotary_factor=1.0,
                    max_position_embeddings=kw.get("max_position_embeddings", 2048),
                    rope_scaling={"factor": kw.get("factor", 1.0),
                                  "rope_type": kw.get("rope_type", "default")})
            return f(config, device, seq_len=seq_len)
        return g

    m.ROPE_INIT_FUNCTIONS = {k: wrap(f) for k, f in orig.items()}
    from osuT5.osuT5.model.custom_transformers.configuration_ropewhisper import (
        RoPEWhisperConfig)
    import torch
    torch.manual_seed(0)
    cfg = RoPEWhisperConfig(
        vocab_size=100, num_mel_bins=64, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=64, max_target_positions=64,
        rope_type="default", rope_theta=10000.0,
        attn_implementation="eager", use_cache=False, pad_token_id=0)
    return m.RoPEWhisperForConditionalGeneration(cfg).eval()


def _dims():
    from beatheritage_tpu.models.transformer import ModelDims
    return ModelDims(
        d_model=64, num_heads=4, d_ff=128, encoder_layers=2,
        decoder_layers=2, n_mels=64, cond_size=0, cond_dim=0,
        vocab_size_in=100, vocab_size_out=100, num_classes=0, num_mappers=0,
        rope_theta=10000.0, max_source_positions=64, max_target_positions=64,
        rope_type="static", rope_encoder_scaling=1.0, rope_decoder_scaling=1.0,
        project_encoder_input=False, do_style_embed=False,
        do_difficulty_embed=False, do_mapper_embed=False,
        do_song_position_embed=False, rhythm_token_start=0,
        rhythm_token_end=0, rhythm_weight=1.0, label_smoothing=0.0)


def test_converted_checkpoint_matches_reference_logits(reference_model):
    import torch
    import jax
    import jax.numpy as jnp
    from beatheritage_tpu.models.transformer import (
        _conv1d, _ffn, _self_attention, decode_train, rms_norm)
    from beatheritage_tpu.ops.rope import rope_cos_sin
    from beatheritage_tpu.train.convert import convert_reference_state_dict

    torch.manual_seed(1)
    x = torch.randn(1, 64, 128)  # (B, mel, frames)
    ids = torch.randint(3, 100, (1, 10))
    with torch.no_grad():
        ref_enc = reference_model.model.encoder(input_features=x).last_hidden_state
        ref_out = reference_model(input_features=x, decoder_input_ids=ids)

    dims = _dims()
    params = jax.tree.map(jnp.asarray, convert_reference_state_dict(
        reference_model.state_dict(), dims))

    # run our encoder stack on the same mel features
    mel = jnp.asarray(x.numpy().transpose(0, 2, 1))
    h = jax.nn.gelu(_conv1d(mel, params["encoder"]["conv1"]), approximate=False)
    h = jax.nn.gelu(_conv1d(h, params["encoder"]["conv2"], stride=2), approximate=False)
    cos, sin = rope_cos_sin(jnp.arange(h.shape[1]), dims.head_dim, rope_type="static")

    def enc_layer(hh, layer):
        hh = hh + _self_attention(
            layer, rms_norm(hh, layer["ln1"]["g"]),
            cos, sin, dims.num_heads, is_causal=False)
        hh = hh + _ffn(layer, rms_norm(hh, layer["ln2"]["g"]))
        return hh, None

    h, _ = jax.lax.scan(enc_layer, h, params["encoder"]["layers"])
    enc_mine = rms_norm(h, params["encoder"]["lnf"]["g"])
    enc_err = np.abs(np.asarray(enc_mine) - ref_enc.numpy()).max()
    assert enc_err < 2e-4, f"encoder mismatch: {enc_err}"

    logits_mine = decode_train(params, dims, jnp.asarray(ids.numpy()),
                               enc_mine, dtype=jnp.float32)
    logit_err = np.abs(np.asarray(logits_mine) - ref_out.logits.numpy()).max()
    scale = float(ref_out.logits.abs().max())
    assert logit_err < max(2e-3, scale * 1e-3), \
        f"decoder logits mismatch: {logit_err} (scale {scale})"


def test_greedy_token_stream_matches_reference_generate(reference_model):
    """Bit-comparable token streams (BASELINE.md north star): greedy rollout
    through our cached decode path produces the same ids as the reference's
    HF generate on the converted checkpoint."""
    import torch
    import jax
    import jax.numpy as jnp
    from beatheritage_tpu.decode.engine import decoder_cached_forward, fuse_qkv
    from beatheritage_tpu.decode.kv_cache import (init_self_cache,
                                                  precompute_cross_kv)
    from beatheritage_tpu.train.convert import convert_reference_state_dict

    import copy
    model = copy.deepcopy(reference_model)
    with torch.no_grad():
        for p in model.parameters():  # amplify: random init is near-uniform
            p.mul_(2.5)               # and would greedy-decode a constant id

    torch.manual_seed(2)
    x = torch.randn(1, 64, 128)
    n_new = 24
    with torch.no_grad():
        ref_ids = model.generate(
            input_features=x, max_new_tokens=n_new, min_new_tokens=n_new,
            do_sample=False, num_beams=1, use_cache=True,
            decoder_start_token_id=1, bos_token_id=1, eos_token_id=None,
            pad_token_id=0)
        ref_enc = model.model.encoder(input_features=x).last_hidden_state

    dims = _dims()
    params = jax.tree.map(jnp.asarray, convert_reference_state_dict(
        model.state_dict(), dims))
    enc = jnp.asarray(ref_enc.numpy())  # isolate decode-path parity

    max_len = 1 + n_new
    cache = init_self_cache(dims, 1, max_len, jnp.float32)
    ck, cv = precompute_cross_kv(params, dims, enc, jnp.float32)
    qkv = fuse_qkv(params, jnp.float32)
    kv_valid = jnp.ones((1, max_len), bool)

    ids = [1]
    for step in range(n_new):
        logits, cache = decoder_cached_forward(
            params, dims, jnp.asarray([[ids[-1]]], jnp.int32), cache, ck, cv,
            jnp.asarray([[step]], jnp.int32), step, kv_valid, max_len,
            jnp.float32, qkv=qkv)
        ids.append(int(jnp.argmax(logits[0, -1])))

    ref_list = ref_ids[0].tolist()
    if ref_list and ref_list[0] != ids[0]:
        ref_list = [ids[0]] + ref_list  # HF omits the decoder start token
    n = min(len(ids), len(ref_list))
    assert n >= 20 and ids[:n] == ref_list[:n], (
        f"stream diverged: ours {ids[:n]}\n ref {ref_list[:n]}")
    assert len(set(ids)) > 3, "degenerate stream (constant id) proves nothing"


# -- vanilla Whisper backbone (v19-v29 era, openai/whisper-*) ----------------------

def _whisper_dims(max_src=32, max_tgt=64):
    from beatheritage_tpu.models.transformer import ModelDims
    return ModelDims(
        d_model=64, num_heads=4, d_ff=128, encoder_layers=2,
        decoder_layers=2, n_mels=64, cond_size=0, cond_dim=0,
        vocab_size_in=100, vocab_size_out=100, num_classes=0, num_mappers=0,
        rope_theta=10000.0, max_source_positions=max_src,
        max_target_positions=max_tgt, rope_type="static",
        rope_encoder_scaling=1.0, rope_decoder_scaling=1.0,
        project_encoder_input=False, do_style_embed=False,
        do_difficulty_embed=False, do_mapper_embed=False,
        do_song_position_embed=False, rhythm_token_start=0,
        rhythm_token_end=0, rhythm_weight=1.0, label_smoothing=0.0)


def test_converted_vanilla_whisper_matches_hf_logits():
    """The v19-v29 models wrap an unmodified openai/whisper backbone
    (reference get_backbone_model, modeling_mapperatorinator.py:32-35)."""
    import torch
    import jax
    import jax.numpy as jnp
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    from beatheritage_tpu.models.whisper import (whisper_decode_train,
                                                 whisper_encode_embeds)
    from beatheritage_tpu.train.convert import convert_checkpoint

    torch.manual_seed(3)
    cfg = WhisperConfig(
        vocab_size=100, num_mel_bins=64, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=32, max_target_positions=64,
        attn_implementation="eager", use_cache=False, pad_token_id=0,
        tie_word_embeddings=False)
    model = WhisperForConditionalGeneration(cfg).eval()

    x = torch.randn(1, 64, 64)  # (B, mel, frames); frames = 2*max_src_pos
    ids = torch.randint(3, 100, (1, 10))
    with torch.no_grad():
        ref_enc = model.model.encoder(input_features=x).last_hidden_state
        ref_out = model(input_features=x, decoder_input_ids=ids)

    dims = _whisper_dims()
    params, backbone = convert_checkpoint(model.state_dict(), dims)
    assert backbone == "whisper"
    params = jax.tree.map(jnp.asarray, params)

    mel = jnp.asarray(x.numpy().transpose(0, 2, 1))
    enc_mine = whisper_encode_embeds(params, dims, mel, dtype=jnp.float32)
    enc_err = np.abs(np.asarray(enc_mine) - ref_enc.numpy()).max()
    assert enc_err < 2e-4, f"encoder mismatch: {enc_err}"

    logits_mine = whisper_decode_train(params, dims, jnp.asarray(ids.numpy()),
                                       enc_mine, dtype=jnp.float32)
    logit_err = np.abs(np.asarray(logits_mine) - ref_out.logits.numpy()).max()
    assert logit_err < 2e-3, f"decoder logits mismatch: {logit_err}"


# -- NWhisper backbone (v27, OliBomby/nwhisper-*) ----------------------------------

@pytest.mark.parametrize("manual_norm", [True, False])
def test_converted_nwhisper_matches_reference_logits(manual_norm):
    """Faithful hypersphere forward: residual slerp, positional lerp, qk-norm
    with per-channel scales, logit scale (modeling_nwhisper.py). Covers both
    state-dict layouts: manual_norm_weights=true (production
    configs/model/nwhisper_base.yaml) and the parametrized default."""
    import torch
    sys.path.insert(0, str(REFERENCE))
    import jax
    import jax.numpy as jnp
    from osuT5.osuT5.model.custom_transformers.configuration_nwhisper import (
        NWhisperConfig)
    from osuT5.osuT5.model.custom_transformers.modeling_nwhisper import (
        NWhisperForConditionalGeneration)
    from beatheritage_tpu.models.ngpt import ngpt_decode_train, ngpt_encode_embeds
    from beatheritage_tpu.train.convert import convert_checkpoint

    torch.manual_seed(4)
    cfg = NWhisperConfig(
        vocab_size=100, num_mel_bins=64, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=32, max_target_positions=64,
        attn_implementation="eager", use_cache=False, pad_token_id=0,
        manual_norm_weights=manual_norm, activation_function="gelu",
        tie_word_embeddings=False)  # nwhisper_base.yaml overwrite
    model = NWhisperForConditionalGeneration(cfg).eval()
    # manual mode keeps raw weights until the step hook runs; trained
    # checkpoints are always normalized (reference osuT5/train.py:76-79)
    model.norm_weights_()

    x = torch.randn(1, 64, 64)
    ids = torch.randint(3, 100, (1, 10))
    with torch.no_grad():
        ref_enc = model.model.encoder(input_features=x).last_hidden_state
        ref_out = model(input_features=x, decoder_input_ids=ids)

    dims = _whisper_dims()
    params, backbone = convert_checkpoint(model.state_dict(), dims)
    assert backbone == "nwhisper"
    params = jax.tree.map(jnp.asarray, params)

    mel = jnp.asarray(x.numpy().transpose(0, 2, 1))
    enc_mine = ngpt_encode_embeds(params, dims, mel, dtype=jnp.float32)
    enc_err = np.abs(np.asarray(enc_mine) - ref_enc.numpy()).max()
    assert enc_err < 2e-4, f"encoder mismatch: {enc_err}"

    logits_mine = ngpt_decode_train(params, dims, jnp.asarray(ids.numpy()),
                                    enc_mine, dtype=jnp.float32)
    logit_err = np.abs(np.asarray(logits_mine) - ref_out.logits.numpy()).max()
    assert logit_err < 2e-3, f"decoder logits mismatch: {logit_err}"


# -- nanoT5 backbone (legacy google/t5-* configs) ----------------------------------

def test_converted_t5_matches_reference_logits():
    """Reference custom_transformers/t5.py:472 T5: Linear mel embedder,
    shared block-0 relative bias, gated-GELU FF, untied head."""
    import torch
    sys.path.insert(0, str(REFERENCE))
    from transformers import T5Config
    import jax
    import jax.numpy as jnp
    from osuT5.osuT5.model.custom_transformers.t5 import T5
    from beatheritage_tpu.models.t5 import t5_decode_train
    from beatheritage_tpu.train.convert import convert_checkpoint

    torch.manual_seed(5)
    cfg = T5Config(
        vocab_size=100, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        use_cache=False, pad_token_id=0, decoder_start_token_id=1)
    cfg.n_mels = 64
    model = T5(cfg).eval()

    frames = torch.randn(1, 24, 64)
    ids = torch.randint(3, 100, (1, 10))
    with torch.no_grad():
        ref_out = model(frames=frames, decoder_input_ids=ids)
        ref_enc = ref_out.encoder_outputs.hidden_states

    dims = _whisper_dims()
    params, backbone = convert_checkpoint(model.state_dict(), dims)
    assert backbone == "t5"
    params = jax.tree.map(jnp.asarray, params)

    # our t5_encode runs mel internally; drive the stack on the same frames
    from beatheritage_tpu.models.t5 import position_bias_table
    from beatheritage_tpu.models.transformer import rms_norm
    from beatheritage_tpu.models.t5 import _t5_attention, _t5_ff

    x = jnp.asarray(frames.numpy()) @ params["enc_proj"]["w"]
    if "b" in params["enc_proj"]:
        x = x + params["enc_proj"]["b"]
    t = x.shape[1]
    buckets = position_bias_table(t, t, bidirectional=True)
    bias = params["encoder"]["rel_bias"].astype(jnp.float32)[buckets]
    bias = bias.transpose(2, 0, 1)[None]

    def enc_layer(h, layer):
        h = h + _t5_attention(layer, rms_norm(h, layer["ln1"]["g"]), bias,
                              dims, is_causal=False)
        h = h + _t5_ff(layer, rms_norm(h, layer["ln2"]["g"]))
        return h, None

    x, _ = jax.lax.scan(enc_layer, x, params["encoder"]["layers"])
    enc_mine = rms_norm(x, params["encoder"]["lnf"]["g"])
    enc_err = np.abs(np.asarray(enc_mine) - ref_enc.numpy()).max()
    assert enc_err < 2e-4, f"encoder mismatch: {enc_err}"

    logits_mine = t5_decode_train(params, dims, jnp.asarray(ids.numpy()),
                                  enc_mine, dtype=jnp.float32)
    logit_err = np.abs(np.asarray(logits_mine) - ref_out.logits.numpy()).max()
    assert logit_err < 2e-3, f"decoder logits mismatch: {logit_err}"


# -- shape validation ---------------------------------------------------------------

def test_converter_shape_validation_names_bad_tensor(reference_model):
    """A mis-sized checkpoint fails with an error naming the tensor, not a
    raw dot_general shape error (VERDICT round-1 weak item 6)."""
    import jax  # noqa: F401
    from beatheritage_tpu.train.convert import convert_checkpoint

    dims = _dims()
    bad_dims = dims.__class__(**{**dims.__dict__, "vocab_size_out": 123})
    with pytest.raises(ValueError, match="lm_head"):
        convert_checkpoint(reference_model.state_dict(), bad_dims,
                           backbone="ropewhisper")
