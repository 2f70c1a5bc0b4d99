"""METEOR via the coco-caption Java jar (gated).

The reference scores METEOR through coco-caption's Java subprocess
(evaluations.py:8,16; Dockerfile:15-18 installs OpenJDK).  The jar is not
vendored here; when ``$ICX_METEOR_JAR`` points at ``meteor-1.5.jar`` (plus
its ``data/paraphrase-en.gz``) and ``java`` is on PATH, this wrapper speaks
the same line protocol (``SCORE ||| ref1 ||| ... ||| hyp`` then ``EVAL |||
stats``).  Otherwise ``compute_score`` raises ``MeteorUnavailable`` so
callers can skip the metric, mirroring how the reference itself comments
SPICE out when the tooling is absent (evaluations.py:19).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import threading
from typing import Dict


class MeteorUnavailable(RuntimeError):
    pass


def _jar_path() -> str:
    jar = os.environ.get("ICX_METEOR_JAR", "")
    if not jar or not os.path.exists(jar):
        raise MeteorUnavailable(
            "METEOR jar not found: set $ICX_METEOR_JAR to meteor-1.5.jar")
    if shutil.which("java") is None:
        raise MeteorUnavailable("java not on PATH")
    return jar


class Meteor:
    def __init__(self):
        self._proc = None
        self._lock = threading.Lock()

    def _ensure_proc(self):
        if self._proc is not None:
            return
        jar = _jar_path()
        self._proc = subprocess.Popen(
            ["java", "-jar", "-Xmx2G", jar, "-", "-", "-stdio", "-l", "en",
             "-norm"],
            cwd=os.path.dirname(os.path.abspath(jar)),
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            universal_newlines=True, bufsize=1)

    def compute_score(self, gts: Dict, res: Dict):
        assert sorted(gts.keys()) == sorted(res.keys())
        self._ensure_proc()
        scores = []
        eval_line = "EVAL"
        with self._lock:
            for key in sorted(gts.keys()):
                assert len(res[key]) == 1
                # pycocoevalcap sanitizes ONLY the hypothesis (meteor.py
                # _stat); references go to the jar verbatim — sanitizing
                # them too changes alignment input on unclean refs
                hypo = res[key][0].replace("|||", "").replace("  ", " ")
                score_line = " ||| ".join(
                    ("SCORE", " ||| ".join(gts[key]), hypo))
                self._proc.stdin.write(score_line + "\n")
                stats = self._proc.stdout.readline().strip()
                eval_line += " ||| {}".format(stats)
            self._proc.stdin.write(eval_line + "\n")
            for _ in gts:
                scores.append(float(self._proc.stdout.readline().strip()))
            final = float(self._proc.stdout.readline().strip())
        return final, scores

    def method(self) -> str:
        return "METEOR"

    def __del__(self):
        if self._proc is not None:
            try:
                self._proc.kill()
            except Exception:
                pass
