"""Kernel/math layer: all the framework's pure math as XLA-compiled ops."""

from exploring_meta_tpu.ops.gae import (
    discount,
    temporal_difference,
    generalized_advantage,
    compute_advantages,
)
from exploring_meta_tpu.ops.losses import (
    a2c_policy_loss,
    ppo_policy_loss,
    trpo_policy_loss,
    magic_box,
    weighted_cumsum,
    cross_entropy,
    accuracy,
)
from exploring_meta_tpu.ops.stats import normalize, onehot
from exploring_meta_tpu.ops.value import (
    linear_value_features,
    fit_linear_value,
    linear_value,
)
from exploring_meta_tpu.ops.cg import conjugate_gradient, hvp, tree_hvp
from exploring_meta_tpu.ops.cca import get_cca_similarity, robust_cca_similarity
from exploring_meta_tpu.ops.cka import get_linear_CKA, get_kernel_CKA
from exploring_meta_tpu.ops.cl_metrics import calc_cl_metrics

__all__ = [
    "discount", "temporal_difference", "generalized_advantage",
    "compute_advantages", "a2c_policy_loss", "ppo_policy_loss",
    "trpo_policy_loss", "magic_box", "weighted_cumsum", "cross_entropy",
    "accuracy", "normalize", "onehot", "linear_value_features",
    "fit_linear_value", "linear_value", "conjugate_gradient", "hvp",
    "tree_hvp", "get_cca_similarity", "robust_cca_similarity",
    "get_linear_CKA", "get_kernel_CKA", "calc_cl_metrics",
]
