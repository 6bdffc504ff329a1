"""Scale-out layer: device meshes, shardings, batch drivers.

The reference is single-process/single-device (SURVEY.md §2: no DP/TP/PP
anywhere); this package is where the TPU rebuild scales the same
capabilities:

- ``mesh``  — ``jax.sharding.Mesh`` construction from TPUConfig, named
  shardings for batch ("data") and model ("model") axes.
- ``sharding`` — parameter/activation sharding rules for Whisper-class
  models (TP over heads/MLP, DP over windows).
- ``batch`` — the multi-file driver: checkpointed, resumable processing of
  a whole media directory (the "50×1-hr" workload), windows sharded across
  chips.
"""
