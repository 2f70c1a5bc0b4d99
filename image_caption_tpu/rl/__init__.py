"""Self-critical (SCST) training: loss, rewards, steps."""

from .loss import rl_composite_loss, make_reward_callback  # noqa: F401
from .rewards import RewardComputer  # noqa: F401
