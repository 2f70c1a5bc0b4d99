"""Record coco-caption (pycocoevalcap) outputs on the fixed corpus.

The bit-identity gate (BASELINE.json north star: "coco-caption
BLEU/ROUGE/METEOR/CIDEr/SPICE path bit-identical";
/root/reference/core/evaluations.py:12-34) cannot be *proven* in this
offline environment — pycocoevalcap is not installable and the
METEOR/SPICE jars are absent (VERDICT r1 #9 / r2 missing #2; vendored
scorers are covered by hand-computed values + the NLTK BLEU
cross-validation instead).  This script is the proof, ready to fire in
any environment that has the real thing:

  pip install pycocoevalcap          # or clone tylin/coco-caption
  python scripts/record_metric_fixtures.py

It scores ``tests/fixtures/metric_corpus.json`` (hand-authored literal
captions — stable forever) with the REAL pycocoevalcap scorers and
writes every per-corpus and per-sentence value to
``tests/fixtures/pycocoevalcap_scores.json``.  Commit that file:
``tests/test_metrics.py::test_vendored_scorers_match_recorded_pycocoevalcap``
then replays it against our vendored scorers on every CI run (it skips,
loudly, while the recording is absent).

METEOR/SPICE are recorded too when Java + the jars are available
(they're part of pycocoevalcap's wheel); our jar-gated wrappers then
verify against the same recording when $ICX_METEOR_JAR is set.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(HERE, "..", "tests", "fixtures", "metric_corpus.json")
OUT = os.path.join(HERE, "..", "tests", "fixtures",
                   "pycocoevalcap_scores.json")


def main() -> int:
    try:
        from pycocoevalcap.bleu.bleu import Bleu
        from pycocoevalcap.cider.cider import Cider
        from pycocoevalcap.rouge.rouge import Rouge
    except ImportError as e:
        print(f"pycocoevalcap not importable ({e}); run this in an "
              "environment with it installed (pip install pycocoevalcap)")
        return 1

    with open(CORPUS) as f:
        corpus = json.load(f)
    gts = {int(k): v for k, v in corpus["references"].items()}
    res = {int(k): v for k, v in corpus["candidates"].items()}

    scorers = [("BLEU", Bleu(4)), ("ROUGE_L", Rouge()), ("CIDEr", Cider())]
    try:  # CiderD ships in some distributions only
        from pycocoevalcap.ciderD.ciderD import CiderD
        scorers.append(("CIDEr-D", CiderD(df="corpus")))
    except ImportError:
        print("note: pycocoevalcap build has no ciderD module — skipped "
              "(ours is then covered by the ruotianluo-lineage comparison)")
    for name, ctor in (("METEOR", "pycocoevalcap.meteor.meteor"),
                       ("SPICE", "pycocoevalcap.spice.spice")):
        try:
            import importlib
            mod = importlib.import_module(ctor)
            scorers.append((name, getattr(mod, name.capitalize())()))
        except Exception as e:                      # no Java / no jar
            print(f"note: {name} scorer unavailable here ({e}) — skipped")

    out = {"_corpus": "metric_corpus.json"}
    for name, scorer in scorers:
        try:
            # SPICE/METEOR construct fine without Java and only shell out
            # inside compute_score — a crash here must not discard the
            # scores already recorded (this is a one-shot recording day)
            score, per_sentence = scorer.compute_score(gts, res)
        except Exception as e:
            print(f"note: {name} compute_score failed ({e}) — skipped")
            continue
        if isinstance(score, list):                # Bleu: 4 values
            for i, (s, ps) in enumerate(zip(score, per_sentence), 1):
                out[f"BLEU_{i}"] = {"corpus": float(s),
                                    "per_sentence": [float(x) for x in ps]}
        else:
            ps = per_sentence.tolist() if hasattr(per_sentence, "tolist") \
                else [float(x) for x in per_sentence]
            out[name] = {"corpus": float(score), "per_sentence": ps}
        print(f"recorded {name}")

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {OUT} — commit it to activate the bit-identity test")
    return 0


if __name__ == "__main__":
    sys.exit(main())
