"""Caption model: functional transformer + decoding."""

from .captioner import (captioner_logits, captioner_xe_loss,  # noqa: F401
                        cross_entropy_ignore_pad, focal_loss_from_ce,
                        init_captioner)
from .decoding import beam_search, greedy_decode  # noqa: F401
