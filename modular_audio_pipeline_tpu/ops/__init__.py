"""JAX/XLA/Pallas DSP kernels for the TPU-native audio pipeline.

Each module replaces a third-party CPU dependency of the reference pipeline
with first-party, jittable TPU code:

====================  =====================================================
Module                Replaces (reference dependency)
====================  =====================================================
``stft``              librosa/scipy STFT used inside noisereduce
``spectral_gate``     ``noisereduce.reduce_noise(stationary=True)``
``loudness``          ``pyloudnorm`` (ITU-R BS.1770-4 metering + gain)
``iir``               scipy ``lfilter`` (via parallel associative scan)
``dynamics``          ``pydub.effects.normalize`` / ``AudioSegment.dBFS``
``silence``           ``pydub.silence.detect_nonsilent`` + crossfade concat
``vad_ops``           ``webrtcvad`` frame decisions + hangover machine
``noise_detect``      the reference's per-frame RMS/ZCR python loop
``music``             the reference's energy-CV music heuristic
``mel``               whisper's log-mel frontend (librosa mel filters)
``resample``          on-device polyphase resampling
``attention``         flash/decode attention for the model stack
====================  =====================================================
"""
