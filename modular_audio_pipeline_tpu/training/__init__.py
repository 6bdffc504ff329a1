"""Training: fine-tune the JAX Whisper stack on (audio, transcript) pairs.

The reference has no training path at all (inference-only wrappers around
pretrained checkpoints); on TPU the same model stack is trainable, which
is how domain adaptation / distillation workflows run. The train step is
one jitted function over a (data, model) mesh: DP gradients all-reduce
over ICI, TP following parallel.sharding's Megatron-style specs.
"""

from .whisper_train import TrainState, make_train_step, cross_entropy_loss

__all__ = ["TrainState", "make_train_step", "cross_entropy_loss"]
