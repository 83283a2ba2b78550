"""beatheritage_tpu — TPU-native (JAX/XLA/Pallas/pjit) song -> osu! beatmap framework.

A from-scratch rebuild of the capabilities of hongminh54/BeatHeritage
(multi-model generative framework: audio -> playable .osu beatmap for all four
gamemodes, plus AI modding, diffusion coordinate refinement, classification and
evaluation), designed TPU-first:

- compute path: JAX + XLA + Pallas kernels, jit-compiled decode loops,
  lax.scan diffusion samplers, pjit/shard_map over device meshes;
- host path: pure-Python osu! domain library (.osu parse/serialize, slider
  geometry, timing inference) feeding device arrays.

Subpackages
-----------
osu        pure-Python osu! domain library (no jax/torch deps)
events     event vocabulary shared by tokenizer/parser/postprocessor
tokenizer  fixed-vocabulary event tokenizer (reference-compatible layout)
config     dataclass + YAML config system with CLI override grammar
data       beatmap -> event parsing, audio IO, training datasets
ops        XLA/Pallas compute ops (mel, attention, rope, sampling)
models     Whisper-style enc-dec, DiT, classifier, rcomplexion (pure pytrees)
decode     jitted autoregressive decode engine (KV cache, CFG, logit rules)
diffusion  DDPM/DDIM schedules and lax.scan samplers
train      pjit train steps, optimizers, schedules, checkpointing
parallel   mesh/sharding helpers
inference  windowed generation pipeline, postprocessor, server
eval       FID / rhythm metrics, benchmark harness
apps       CLI / MaiMod front-ends
"""

__version__ = "0.1.0"
