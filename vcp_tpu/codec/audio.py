"""Audio-only path (``-vn -c:a aac``, ref config.yaml:24 'audio-only').

AAC encode lands with the audio milestone; until then audio-only tasks
fail cleanly (consumer ack-and-drop)."""

from __future__ import annotations


def extract_audio(input_path: str, output_path: str, params,
                  deadline=None) -> int:
    raise NotImplementedError(
        "audio-only extraction not yet implemented in this build")
