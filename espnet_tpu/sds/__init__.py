"""Spoken dialogue system (espnet2/sds/ counterpart).

- session.py: streaming turn-taking orchestrator (VAD endpointing,
  barge-in, incremental chunk feed) — the reference cascade
  (espnet_model.py forward) redesigned as an event-driven session.
- interface.py: module-selection registry (handle_*_selection roles).
- e2e.py: end-to-end speech-to-speech dialogue over the in-repo codec +
  SpeechLM (mini_omni_e2e.py role, no external LLM required).
"""

from espnet_tpu.sds.session import DialogueSession, StreamingVAD  # noqa
