"""Quality-parity harness: WER / DER between transcription outputs.

The reference publishes no quality numbers (SURVEY.md §6); BASELINE.md
asks for WER/DER parity against it. This package provides the measuring
instruments: word error rate, diarization error rate, and a comparator
that diffs two pipeline JSON outputs (ours vs a reference run, or two
configurations of ours).
"""

from .metrics import der, wer, compare_transcriptions

__all__ = ["wer", "der", "compare_transcriptions"]
