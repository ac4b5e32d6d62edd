"""Singing-score I/O: score.scp JSON files + MusicXML parsing.

Behavioral contract: espnet2/fileio/score_scp.py — `SingingScoreReader`
/`SingingScoreWriter` index per-utterance score files through score.scp;
a score is {"tempo": int, "item_list": [...], "note": [[st, et, lyric,
midi, phn], ...]} with times in seconds, midi note numbers, and phn as
"_"-joined phonemes. `XMLReader` there needs music21; here MusicXML
(partwise) is parsed with stdlib xml.etree — divisions/tempo/pitch/
duration/lyric/tie are enough for score-to-note conversion.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List

_STEP_TO_SEMITONE = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


class SingingScoreReader:
    """score.scp: `<utt-id> <path-to-score.json>` per line."""

    def __init__(self, scp_path):
        self.data: Dict[str, str] = {}
        for line in Path(scp_path).read_text(encoding="utf-8").splitlines():
            if line.strip():
                k, v = line.split(maxsplit=1)
                self.data[k] = v.strip()

    def keys(self) -> List[str]:
        return list(self.data)

    def __getitem__(self, key: str) -> dict:
        p = Path(self.data[key])
        if p.suffix in (".xml", ".musicxml", ".mxl"):
            return read_musicxml(p)
        return json.loads(p.read_text(encoding="utf-8"))

    def __contains__(self, key):
        return key in self.data

    def __len__(self):
        return len(self.data)


class SingingScoreWriter:
    """DatadirWriter-style: writer[key] = score dict -> file + scp line."""

    def __init__(self, outdir, scp_path):
        self.outdir = Path(outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.fscp = open(scp_path, "w", encoding="utf-8")

    def __setitem__(self, key: str, score: dict):
        p = self.outdir / f"{key}.json"
        p.write_text(json.dumps(score), encoding="utf-8")
        self.fscp.write(f"{key} {p}\n")

    def close(self):
        self.fscp.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _note_midi(pitch_el) -> int:
    step = pitch_el.findtext("step", "C")
    octave = int(pitch_el.findtext("octave", "4"))
    alter = int(float(pitch_el.findtext("alter", "0")))
    return 12 * (octave + 1) + _STEP_TO_SEMITONE[step] + alter


def read_musicxml(path) -> dict:
    """Partwise MusicXML -> score dict (tempo, note list with absolute
    second times). Rests produce midi 0 / lyric "" entries; tied notes
    are merged."""
    root = ET.fromstring(Path(path).read_text(encoding="utf-8"))
    tempo = 120.0
    divisions = 1.0
    notes: List[list] = []
    t = 0.0
    part = root.find("part")
    if part is None:
        raise ValueError(f"no <part> in {path}")
    for measure in part.findall("measure"):
        att = measure.find("attributes")
        if att is not None and att.findtext("divisions"):
            divisions = float(att.findtext("divisions"))
        for direction in measure.findall(".//sound[@tempo]"):
            tempo = float(direction.get("tempo"))
        for note in measure.findall("note"):
            dur_div = float(note.findtext("duration", "0"))
            sec = dur_div / divisions * 60.0 / tempo
            if note.find("rest") is not None:
                notes.append([t, t + sec, "", 0, ""])
            else:
                midi = _note_midi(note.find("pitch"))
                lyric = note.findtext("lyric/text", "")
                tied = any(tie.get("type") == "stop"
                           for tie in note.findall("tie"))
                if tied and notes and notes[-1][3] == midi:
                    notes[-1][1] = t + sec
                else:
                    notes.append([t, t + sec, lyric, midi,
                                  note.findtext("lyric/text", lyric)])
            t += sec
    return {"tempo": int(tempo),
            "item_list": ["st", "et", "lyric", "midi", "phn"],
            "note": [[round(n[0], 6), round(n[1], 6), n[2], n[3], n[4]]
                     for n in notes]}
