"""Vocal/accompaniment separation models.

Replaces the reference's Demucs subprocess
(``/root/reference/audio_pipeline/separator.py:185-232``). Two paths:

- :mod:`.repet` — REPET-SIM-style repeating-pattern extraction: fully
  first-party, weight-free, jittable; music accompaniment is modelled as
  the time-repeating component of the spectrogram and removed with a soft
  mask. This is the default separation backend.
- a trainable masking U-Net (``unet.py``, later round) for
  checkpoint-driven quality parity with hybrid-demucs.
"""
