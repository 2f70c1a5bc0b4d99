"""coco-caption-compatible metrics."""

from .bleu import Bleu  # noqa: F401
from .cider import Cider, CiderD  # noqa: F401
from .evaluate import evaluate, score_captions  # noqa: F401
from .rouge import Rouge  # noqa: F401
