"""Meta-RL core: rollouts, fast-adapt (VPG/PPO/TRPO), TRPO outer step."""

from exploring_meta_tpu.rl.rollout import Trajectory, rollout, make_rollout
from exploring_meta_tpu.rl.adapt_rl import (
    RLConfig,
    masked_mean,
    masked_normalize,
    traj_advantages,
    vpg_a2c_loss,
    fast_adapt_vpg,
    fast_adapt_ppo,
    trpo_a2c_loss,
    trpo_update,
    fast_adapt_trpo,
    make_trpo_collect,
    trpo_collect_body,
    policy_anil_mask,
    single_adapt_step,
)
from exploring_meta_tpu.rl.trpo_meta import (
    TRPOConfig,
    stack_replays,
    meta_surrogate_loss,
    meta_optimize_trpo,
    make_trpo_meta_step,
)
from exploring_meta_tpu.rl.evaluate import (
    evaluate,
    meta_test,
    ML10_TRAIN_TASK_NAMES,
    ML10_EVAL_TASK_NAMES,
)

__all__ = [
    "Trajectory", "rollout", "make_rollout", "RLConfig", "masked_mean",
    "masked_normalize", "traj_advantages", "vpg_a2c_loss", "fast_adapt_vpg",
    "fast_adapt_ppo", "trpo_a2c_loss", "trpo_update", "fast_adapt_trpo",
    "make_trpo_collect", "trpo_collect_body", "single_adapt_step",
    "policy_anil_mask", "TRPOConfig", "stack_replays", "meta_surrogate_loss",
    "meta_optimize_trpo", "make_trpo_meta_step", "evaluate", "meta_test",
    "ML10_TRAIN_TASK_NAMES", "ML10_EVAL_TASK_NAMES",
]

from exploring_meta_tpu.rl.replay_meta import (
    collect_replays,
    make_replay_meta_loss,
    recording_rollout,
    replay_feeder,
)

__all__ += ["collect_replays", "make_replay_meta_loss", "recording_rollout",
            "replay_feeder"]

from exploring_meta_tpu.rl.train_scan import (
    make_adam_train_scan,
    make_trpo_train_scan,
)

__all__ += ["make_adam_train_scan", "make_trpo_train_scan"]

from exploring_meta_tpu.rl.host_batched import (
    broadcast_params,
    collect_task_batched,
)

__all__ += ["broadcast_params", "collect_task_batched"]
