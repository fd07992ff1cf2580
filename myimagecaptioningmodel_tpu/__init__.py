"""TPU-native image-captioning framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
Chgtaxihe/MyImageCaptioningModel (PaddlePaddle 1.8 static-graph reference):
an AI_Challenger Chinese image-captioning stack — offline dataset build
(JPEG -> float16 HDF5 shards + tokenized caption DBs), a MobileNetV2 encoder
feeding an adaptive-attention ("visual sentinel", Lu et al. 2017) LSTM
decoder with tied embeddings, a teacher-forcing training loop with per-epoch
dev BLEU, checkpoint/resume, inference-bundle export, a BLEU-1..4 evaluator,
and a single-image inference CLI.

Everything device-side is functional JAX: one params/state pytree, pure
``train_step`` / ``decode`` functions, ``lax.scan`` for the sequence loop,
data parallelism over a ``jax.sharding.Mesh``, and a fused Pallas kernel for
the hot decode step.
"""

__version__ = "0.1.0"
