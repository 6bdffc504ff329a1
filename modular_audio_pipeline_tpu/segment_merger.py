"""Merging of adjacent same-speaker segments.

Behaviour-identical to the reference ``SegmentMerger``
(``/root/reference/audio_pipeline/segment_merger.py:15-111``): accepts
both dicts (transcription segments) and :class:`DiarizationSegment`
objects, sorts by start, merges same-speaker neighbours whose gap is at
most ``max_gap_s``, extends the end with ``max(...)``, joins text with a
single space, and preserves the input's type in the output.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from .protocols import DiarizationSegment

__all__ = ["SegmentMerger"]

Segment = Union[DiarizationSegment, Dict[str, Any]]


class SegmentMerger:
    """Consolidate adjacent turns of the same speaker."""

    def __init__(self, max_gap_s: float = 0.5):
        self.max_gap_s = max_gap_s

    @staticmethod
    def _get(seg: Segment, name: str, default: Any = None) -> Any:
        if isinstance(seg, dict):
            return seg.get(name, default)
        return getattr(seg, name, default)

    def merge(
        self,
        segments: List[Segment],
        max_gap_s: Optional[float] = None,
    ) -> List[Segment]:
        if not segments:
            return []
        gap_limit = self.max_gap_s if max_gap_s is None else max_gap_s

        ordered = sorted(segments, key=lambda s: float(self._get(s, "start", 0.0)))

        merged: List[Segment] = []
        template = ordered[0]
        speaker = self._get(template, "speaker")
        start = float(self._get(template, "start", 0.0))
        end = float(self._get(template, "end", 0.0))
        track = str(self._get(template, "track", "0"))
        text = self._get(template, "text")

        for seg in ordered[1:]:
            s_speaker = self._get(seg, "speaker")
            s_start = float(self._get(seg, "start", 0.0))
            s_end = float(self._get(seg, "end", 0.0))

            if s_speaker == speaker and (s_start - end) <= gap_limit:
                end = max(end, s_end)
                s_text = self._get(seg, "text")
                if text is not None and s_text is not None:
                    text = f"{text.strip()} {s_text.strip()}" if text.strip() else s_text
                elif text is None and s_text is not None:
                    text = s_text
            else:
                merged.append(self._build(template, speaker, start, end, track, text))
                template = seg
                speaker = s_speaker
                start = s_start
                end = s_end
                track = str(self._get(seg, "track", "0"))
                text = self._get(seg, "text")

        merged.append(self._build(template, speaker, start, end, track, text))
        return merged

    @staticmethod
    def _build(template: Segment, speaker, start, end, track, text) -> Segment:
        if isinstance(template, dict):
            return {
                "speaker": speaker,
                "start": start,
                "end": end,
                "track": track,
                "text": text if text is not None else "",
            }
        return DiarizationSegment(speaker=speaker, start=start, end=end, track=track)
