"""Streaming dialogue session: VAD endpointing + turn-taking + barge-in.

Behavioral contract: espnet2/sds/espnet_model.py:265 (the forward that
chains VAD -> ASR -> LLM -> TTS per user turn) and sds/vad/webrtc_vad.py
(frame-wise speech decisions with hangover). The reference processes one
recorded turn per call; this redesign is an event-driven SESSION fed
with audio chunks — the orchestration a live demo actually needs
(states LISTENING/THINKING/SPEAKING, endpoint detection, barge-in
interruption), while staying pure-Python around jitted module calls.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np


class StreamingVAD:
    """Frame-wise energy VAD with attack/hangover smoothing
    (sds/vad/webrtc_vad.py:130 decision-smoothing role, no webrtc dep).

    feed(chunk) -> per-call booleans is_speech; endpointing is the
    session's job."""

    def __init__(self, fs: int = 16000, frame_ms: int = 20,
                 threshold_db: float = -35.0, attack_frames: int = 2,
                 hangover_frames: int = 10):
        self.fs = fs
        self.frame = int(fs * frame_ms / 1000)
        self.threshold = 10.0 ** (threshold_db / 10.0)
        self.attack = attack_frames
        self.hangover = hangover_frames
        self._buf = np.zeros((0,), np.float32)
        self._run = 0          # consecutive active frames
        self._quiet = 0        # consecutive quiet frames
        self.in_speech = False

    def feed(self, chunk: np.ndarray) -> List[bool]:
        """-> one smoothed decision per complete frame consumed."""
        self._buf = np.concatenate([self._buf,
                                    np.asarray(chunk, np.float32)])
        out = []
        while len(self._buf) >= self.frame:
            f = self._buf[:self.frame]
            self._buf = self._buf[self.frame:]
            active = float(np.mean(f * f)) > self.threshold
            if active:
                self._run += 1
                self._quiet = 0
                if not self.in_speech and self._run >= self.attack:
                    self.in_speech = True
            else:
                self._quiet += 1
                self._run = 0
                if self.in_speech and self._quiet >= self.hangover:
                    self.in_speech = False
            out.append(self.in_speech)
        return out


@dataclasses.dataclass
class Event:
    kind: str                  # speech_start|endpoint|asr|response|
    #                            speak|interrupted
    text: str = ""
    wav: Optional[np.ndarray] = None
    t: float = 0.0             # session time (s)


class DialogueSession:
    """Event-driven dialogue orchestrator.

    States: LISTENING (accumulate user speech until VAD endpoint) ->
    THINKING (ASR + response fn) -> SPEAKING (emit TTS audio in chunks;
    user speech barge-in interrupts back to LISTENING).

    asr_fn(wav) -> text; respond_fn(text, history) -> text;
    tts_fn(text) -> wav. Any can be the E2E model via sds/e2e.py
    (asr_fn/tts_fn identity + respond on audio)."""

    def __init__(self, asr_fn: Callable, tts_fn: Callable,
                 respond_fn: Optional[Callable] = None,
                 vad: Optional[StreamingVAD] = None, fs: int = 16000,
                 speak_chunk_s: float = 0.2,
                 allow_barge_in: bool = True):
        self.asr_fn = asr_fn
        self.tts_fn = tts_fn
        self.respond_fn = respond_fn or (lambda text, history: text)
        self.vad = vad or StreamingVAD(fs=fs)
        self.fs = fs
        self.state = "LISTENING"
        self.history: List[dict] = []
        self._turn_buf: List[np.ndarray] = []
        self._pre_roll: List[np.ndarray] = []   # audio before speech_start
        self._speak_queue: Optional[np.ndarray] = None
        self._speak_pos = 0
        self._speak_chunk = int(speak_chunk_s * fs)
        self.allow_barge_in = allow_barge_in
        self._t = 0.0
        self._was_speech = False

    # ------------------------------------------------------------------
    def feed_chunk(self, chunk: np.ndarray) -> List[Event]:
        """Feed user audio; returns events (incl. 'speak' events carrying
        response audio to play)."""
        chunk = np.asarray(chunk, np.float32)
        events: List[Event] = []
        decisions = self.vad.feed(chunk)
        now_speech = decisions[-1] if decisions else self._was_speech
        rising = now_speech and not self._was_speech
        falling = (not now_speech) and self._was_speech
        self._t += len(chunk) / self.fs

        if self.state == "SPEAKING":
            if self.allow_barge_in and rising:
                events.append(Event("interrupted", t=self._t))
                self._speak_queue = None
                self.state = "LISTENING"
                self._turn_buf = [chunk]
            else:
                events.extend(self._emit_speech())
                self._was_speech = now_speech
                return events

        if self.state == "LISTENING":
            if now_speech or self.vad.in_speech:
                if rising:
                    events.append(Event("speech_start", t=self._t))
                    self._turn_buf = list(self._pre_roll)
                self._turn_buf.append(chunk)
            else:
                # keep a short pre-roll so attack frames aren't lost
                self._pre_roll.append(chunk)
                self._pre_roll = self._pre_roll[-3:]
            if falling:
                events.append(Event("endpoint", t=self._t))
                events.extend(self._finish_turn())
        self._was_speech = now_speech
        return events

    # ------------------------------------------------------------------
    def _finish_turn(self) -> List[Event]:
        events: List[Event] = []
        wav = (np.concatenate(self._turn_buf)
               if self._turn_buf else np.zeros((0,), np.float32))
        self._turn_buf = []
        self.state = "THINKING"
        text = self.asr_fn(wav) if len(wav) else ""
        events.append(Event("asr", text=text, t=self._t))
        resp = self.respond_fn(text, self.history)
        self.history.append({"user": text, "system": resp})
        events.append(Event("response", text=resp, t=self._t))
        # always consult tts_fn: E2E backends produce audio from the
        # captured speech even when the 'transcript' is empty
        out = self.tts_fn(resp)
        self._speak_queue = np.asarray(out, np.float32)
        self._speak_pos = 0
        self.state = "SPEAKING"
        events.extend(self._emit_speech())
        return events

    def _emit_speech(self) -> List[Event]:
        if self._speak_queue is None:
            self.state = "LISTENING"
            return []
        s = self._speak_pos
        e = min(s + self._speak_chunk, len(self._speak_queue))
        out = self._speak_queue[s:e]
        self._speak_pos = e
        done = e >= len(self._speak_queue)
        if done:
            self._speak_queue = None
            self.state = "LISTENING"
        return [Event("speak", wav=out, t=self._t)] if len(out) else []
