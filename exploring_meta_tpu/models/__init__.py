"""Functional model zoo (CNN4 few-shot backbones + RL policies)."""

from exploring_meta_tpu.models.cnn4 import (
    CNN4Spec,
    omniglot_spec,
    mini_imagenet_spec,
    anil_omniglot_spec,
    anil_mini_imagenet_spec,
    init_cnn4,
    init_conv_base,
    cnn4_apply,
    cnn4_features,
    cnn4_head_apply,
    base_apply,
    get_rep_layer,
    count_params,
)
from exploring_meta_tpu.models.policies import (
    DiagNormalPolicy,
    DiagNormalPolicyANIL,
    DiagNormalPolicyCNN,
    BaselineCNN,
    CategoricalPolicy,
)
from exploring_meta_tpu.models import distributions
from exploring_meta_tpu.models import init
from exploring_meta_tpu.models import layers

__all__ = [
    "CNN4Spec", "omniglot_spec", "mini_imagenet_spec", "anil_omniglot_spec",
    "anil_mini_imagenet_spec", "init_cnn4", "init_conv_base", "cnn4_apply",
    "cnn4_features", "cnn4_head_apply", "base_apply", "get_rep_layer",
    "count_params", "DiagNormalPolicy", "DiagNormalPolicyANIL",
    "DiagNormalPolicyCNN", "BaselineCNN", "CategoricalPolicy",
    "distributions", "init", "layers",
]
