"""Near-duplicate transcription segment filtering.

Behaviour-identical to the reference ``RedundancyRemover``
(``/root/reference/audio_pipeline/redundancy.py:25-238``): texts are
normalised (punctuation stripped, whitespace collapsed, lower-cased) and
compared with ``difflib.SequenceMatcher``; a segment is dropped when its
similarity to the previously *kept* segment reaches the threshold, and
empty segments are always dropped.
"""

from __future__ import annotations

import logging
import re
from difflib import SequenceMatcher
from typing import Callable, Dict, List, Optional, Tuple

from .config import PipelineConfig
from .protocols import RedundancyRemoverProtocol

logger = logging.getLogger(__name__)

__all__ = ["RedundancyRemover", "NoOpRedundancyRemover"]


class RedundancyRemover(RedundancyRemoverProtocol):
    """Sequential near-duplicate filter over segment text."""

    def __init__(
        self,
        similarity_threshold: float = 0.85,
        normalize_text: bool = True,
        custom_similarity_fn: Optional[Callable[[str, str], float]] = None,
    ):
        if not 0 <= similarity_threshold <= 1:
            raise ValueError(
                f"similarity_threshold must be 0-1, got: {similarity_threshold}"
            )
        self.threshold = similarity_threshold
        self.normalize = normalize_text
        self.custom_similarity_fn = custom_similarity_fn

    @classmethod
    def from_config(cls, config: PipelineConfig) -> "RedundancyRemover":
        return cls(similarity_threshold=config.redundancy.similarity_threshold)

    @staticmethod
    def _normalize_text(text: str) -> str:
        text = re.sub(r"[^\w\s]", "", text)
        text = " ".join(text.split())
        return text.lower()

    def get_similarity(self, a: str, b: str) -> float:
        if self.custom_similarity_fn is not None:
            return self.custom_similarity_fn(a, b)
        if self.normalize:
            a = self._normalize_text(a)
            b = self._normalize_text(b)
        return SequenceMatcher(None, a, b).ratio()

    def is_similar(self, a: str, b: str) -> bool:
        return self.get_similarity(a, b) >= self.threshold

    def remove(self, segments: List[Dict]) -> List[Dict]:
        """Drop segments too similar to the last kept one, and empties."""
        if not segments:
            return []

        kept = [segments[0]]
        dropped = 0
        for seg in segments[1:]:
            text = seg.get("text", "").strip()
            if not text:
                logger.debug("Dropping empty segment")
                dropped += 1
                continue
            last_text = kept[-1].get("text", "").strip()
            similarity = self.get_similarity(last_text, text)
            if similarity >= self.threshold:
                logger.debug(
                    "Dropped redundant segment (similarity=%.2f): %s...",
                    similarity, text[:50],
                )
                dropped += 1
                continue
            kept.append(seg)

        if dropped:
            logger.info("Removed %d redundant segments", dropped)
        return kept

    def remove_with_merging(
        self, segments: List[Dict], merge_gap_s: float = 0.5
    ) -> List[Dict]:
        """Dedupe, then merge consecutive same-speaker segments."""
        filtered = self.remove(segments)
        if len(filtered) <= 1:
            return filtered

        merged = [filtered[0].copy()]
        for seg in filtered[1:]:
            last = merged[-1]
            same_speaker = seg.get("speaker") == last.get("speaker")
            gap = seg.get("start", 0) - last.get("end", 0)
            if same_speaker and gap <= merge_gap_s:
                last["end"] = seg.get("end", last["end"])
                last["text"] = last.get("text", "") + " " + seg.get("text", "")
            else:
                merged.append(seg.copy())
        return merged

    def find_duplicates(self, segments: List[Dict]) -> List[Tuple[int, int, float]]:
        """All near-duplicate index pairs (analysis helper, O(n^2))."""
        pairs = []
        for i, seg_i in enumerate(segments):
            text_i = seg_i.get("text", "").strip()
            for j in range(i + 1, len(segments)):
                text_j = segments[j].get("text", "").strip()
                similarity = self.get_similarity(text_i, text_j)
                if similarity >= self.threshold:
                    pairs.append((i, j, similarity))
        return pairs


class NoOpRedundancyRemover(RedundancyRemoverProtocol):
    """Pass-through used when redundancy removal is disabled."""

    def is_similar(self, a: str, b: str) -> bool:
        return False

    def remove(self, segments: List[Dict]) -> List[Dict]:
        return segments
